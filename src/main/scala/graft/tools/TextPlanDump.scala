package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the BEFORE plans (checkpoint = identity ≡ the pre-round-19
  * shape) for the three text rows that gained the materialize-once
  * checkpoint, so plans/r19 carries an exact before/after pair. */
object TextPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    import graft.text.TextStats
    import org.apache.spark.sql.functions.col
    println("=== q_bigram_ppl (identity checkpoint) ===")
    TextStats.bigramSurprisal(docs, "doc_id", "text", checkpoint = identity)
      .orderBy("doc_id").explain("formatted")
    println("=== q_ngram_novelty (identity checkpoint) ===")
    TextStats.ngramNovelty(docs, "doc_id", "text", k = 3,
        checkpoint = identity)
      .orderBy("doc_id").explain("formatted")
    println("=== q_tfidf_topk (identity checkpoint) ===")
    TextStats.tfIdfTopK(docs, "doc_id", "text", k = 5,
        checkpoint = identity)
      .orderBy("doc_id", "rk").explain("formatted")
    spark.stop()
  }
}
