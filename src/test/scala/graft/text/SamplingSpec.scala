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

  test("sampleTemperatureHalf: rare strata keep a higher fraction; rate = min(1, c/sqrt(n))") {
    // 1600 'en' rows vs 100 'tlh' rows: keep thresholds c*1000/sqrt(n)
    // with c=2 -> en: 2000/40 = 50 buckets (5%), tlh: 2000/10 = 200 (20%)
    val df = ((0L until 1600L).map(i => (i, "en")) ++
      (10000L until 10100L).map(i => (i, "tlh"))).toDF("id", "lang")
    val s = Sampling.sampleTemperatureHalf(df, "id", "lang", c = 2.0)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / 1600
    val tlhRate = byLang.getOrElse("tlh", 0L).toDouble / 100
    assert(math.abs(enRate - 0.05) < 0.03, s"en rate $enRate of ~0.05")
    assert(math.abs(tlhRate - 0.20) < 0.12, s"tlh rate $tlhRate of ~0.20")
    assert(tlhRate > enRate, "flattening must favor the rare stratum")
    // c large enough saturates at keep-everything
    val all = Sampling.sampleTemperatureHalf(df, "id", "lang", c = 1000.0)
    assert(all.count() == 1700)
  }

  test("mixWeights: exact counts, share sums to 1, sqrt weight vs dominant source") {
    val df = Seq(
      ("web", "one two three four"),  // 4 tokens
      ("web", "five six seven eight"),// 4 tokens → web: 2 docs, 8 tokens
      ("book", "alpha beta"),         // book: 1 doc, 2 tokens
      ("book", "")).toDF("source", "text") // empty doc: counts, adds 0 tokens
    val r = Sampling.mixWeights(df, "source", "text").orderBy("source").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("book", 2L, 2L), ("web", 2L, 8L)))
    val share = r.map(x => x.getString(0) -> x.getAs[Double]("share")).toMap
    assert(share("web") == 0.8 && share("book") == 0.2)
    val w = r.map(x => x.getString(0) -> x.getAs[Double]("w_sqrt")).toMap
    assert(w("web") == 1.0) // dominant source pins the scale
    assert(w("book") == math.sqrt(2.0) / math.sqrt(8.0)) // = 0.5
  }

  test("overlap: keys present in both sides, distinct, semi-join plan") {
    val a = Seq("x", "y", "y", "z").toDF("fp")
    val b = Seq("y", "z", "z", "w").toDF("fp")
    val o = Sampling.overlap(a, b, "fp")
    assert(o.collect().map(_.getString(0)).sorted.toSeq == Seq("y", "z"))
    assert(o.queryExecution.executedPlan.toString.contains("LeftSemi"))
  }

  test("shardAssign: complete slot layout, deterministic, growth-stable") {
    val df = (0L until 1000L).toDF("id")
    val a = Sampling.shardAssign(df, "id", 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val b = Sampling.shardAssign(df, "id", 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(a.toMap == b.toMap) // pure function of the ids
    val byShard = a.groupBy(_._2._1)
    // every shard in range; positions are exactly 1..n within each shard
    assert(byShard.keySet.forall(s => s >= 0 && s < 32))
    byShard.foreach { case (sh, rows) =>
      val ps = rows.map(_._2._2).sorted.toSeq
      assert(ps == (1L to rows.size.toLong), s"shard $sh positions: $ps")
    }
    // roughly balanced: no shard more than 2x the mean
    assert(byShard.values.map(_.size).max <= 2 * (1000 / 32))
    // adding rows never moves an existing id WITHIN its shard order:
    // its shard is hash-fixed, and its predecessors (same shard, smaller
    // (hx, id)) only grow — so pos is non-decreasing under growth
    val big = Sampling.shardAssign((0L until 2000L).toDF("id"), "id", 32)
      .filter(col("id") < 1000).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val aMap = a.toMap
    assert(big.forall { case (id, (sh, pos)) =>
      aMap(id)._1 == sh && pos >= aMap(id)._2 })
    // output-column collision is rejected, not silently overwritten
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(df.withColumn("pos", lit(1)), "id", 32)
    }
  }
}
