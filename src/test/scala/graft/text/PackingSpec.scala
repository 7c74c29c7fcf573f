package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "en", "one two three"),                       // 3 tokens
    (1L, "en", ("w " * 6).trim),                       // 6 tokens
    (2L, "en", ("x " * 4).trim),                       // 4 tokens
    (3L, "en", ("y " * 9).trim),                       // 9 tokens: spans bins
    (4L, "de", ("z " * 5).trim),                       // separate group
    (5L, "de", "a b")).toDF("doc_id", "lang", "text")

  test("packBins: sequential fill, bin = floor(exclusive cum / capacity), per group") {
    val r = Packing.packBins(docs, "doc_id", "lang", "text", capacity = 8L)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(3))).toSeq
    // en cum_excl: 0,3,9,13 -> bins 0,0,1,1 ; de cum_excl: 0,5 -> bins 0,0
    assert(r == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 0L), (5L, 0L)))
  }

  test("bucketed carries reproduce the global form for any bucket width") {
    val global = Packing.packBins(docs, "doc_id", "lang", "text", 8L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    for (width <- Seq(1L, 2L, 3L, 100L)) {
      val bucketed = Packing.packBinsBucketed(docs, "doc_id", "lang", "text", 8L, width)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(bucketed == global, s"width=$width")
    }
  }

  test("bucketed plan has no per-group single-task window at the corpus grain") {
    val plan = Packing.packBinsBucketed(docs, "doc_id", "lang", "text", 8L, 2L)
      .queryExecution.executedPlan.toString
    // corpus-grain window keys include the range bucket; only the
    // bucket-SUMMARY window (thousands of rows) is keyed by group alone
    assert(plan.contains("_bkt"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("documents larger than the capacity take whole bins (start-bin semantics)") {
    val big = Seq((0L, "en", ("t " * 20).trim), (1L, "en", "u v")).toDF("doc_id", "lang", "text")
    val r = Packing.packBins(big, "doc_id", "lang", "text", capacity = 8L)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(3))).toSeq
    assert(r == Seq((0L, 0L), (1L, 2L))) // next doc starts at cum 20 -> bin 2
  }
}
