package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  test("kernel == compositional charEntropy BITWISE on fixtures incl. unicode") {
    val df = Seq(
      (1L, "aab"), (2L, "aaaa"), (3L, "中中文 mixed 中"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "éèêë ü ß ñ"), (6L, "0101010101"), (7L, "x"))
      .toDF("doc_id", "text")
    val comp = graft.text.TextStats.charEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fast = graft.text.TextStats.charEntropyAuto(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fast == comp)
  }

  test("kernel == compositional on the sf0.001 documents corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val comp = graft.text.TextStats.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fast = graft.text.TextStats.charEntropyAuto(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fast == comp)
    assert(fast.nonEmpty)
  }

  test("null text yields null entropy; empty docs are absent from the auto path") {
    val df = Seq((1L, Some("ab")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        call_function("graft_char_entropy", col("text")).as("h"))
      .orderBy("doc_id").collect()
    assert(!r(0).isNullAt(1))
    assert(r(1).isNullAt(1))
    assert(r(2).getDouble(1) == 0.0) // expression itself: empty -> 0.0
    val auto = graft.text.TextStats.charEntropyAuto(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(auto == Seq(1L)) // null and empty rows filtered, like the explode
  }

  test("the auto path stays inside whole-stage codegen with zero hash exchanges") {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = graft.text.TextStats.charEntropyAuto(df, "doc_id", "text")
      .queryExecution.executedPlan
    val nodes = plan.collect { case p => p }
    assert(!nodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"auto path grew a shuffle: ${nodes.map(_.nodeName).distinct}")
  }
}
