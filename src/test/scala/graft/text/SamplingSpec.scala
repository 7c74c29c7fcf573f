package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("sampleByHash: deterministic, rate-proportional, nested and corpus-stable") {
    val df = (0L until 1000L).toDF("id")
    def ids(rate: Double, frame: org.apache.spark.sql.DataFrame = df) =
      Sampling.sampleByHash(frame, "id", rate).collect().map(_.getLong(0)).toSet
    val s30a = ids(0.3); val s30b = ids(0.3)
    assert(s30a == s30b) // pure function of the id
    assert(math.abs(s30a.size - 300) < 60, s"got ${s30a.size} of ~300")
    // growing the corpus never changes an existing id's fate
    val s30big = ids(0.3, (0L until 2000L).toDF("id"))
    assert(s30a.subsetOf(s30big))
    // rates nest: the 10% sample is contained in the 30% sample
    assert(ids(0.1).subsetOf(s30a))
  }

  test("sampleStratified: per-stratum keep rates, default for unlisted strata") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val s = Sampling.sampleStratified(df, "id", "lang",
      Map("en" -> 0.10), defaultRate = 0.50)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 100L) < 40, s"en=${byLang("en")} of ~100")
    assert(math.abs(byLang("de") - 500L) < 80, s"de=${byLang("de")} of ~500")
  }

  test("overlap: keys present in both sides, distinct, semi-join plan") {
    val a = Seq("x", "y", "y", "z").toDF("fp")
    val b = Seq("y", "z", "z", "w").toDF("fp")
    val o = Sampling.overlap(a, b, "fp")
    assert(o.collect().map(_.getString(0)).sorted.toSeq == Seq("y", "z"))
    assert(o.queryExecution.executedPlan.toString.contains("LeftSemi"))
  }
}
