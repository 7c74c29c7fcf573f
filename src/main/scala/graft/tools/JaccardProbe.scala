package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 decomposition probe for the jaccardVerify rows: times each
  * leg of q_ngram_jaccard's plan with the noop sink (guide §1.4) so the
  * dominant term is measured, not guessed. REPS reps per leg, first rep
  * discarded (codegen), median of the rest reported. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val steady = times.drop(1).sorted.apply((reps - 1) / 2)
      println(f"$label%-32s first ${times.head}%.3f steady $steady%.3f")
    }

    val docs = graft.Tables.documents(spark, dir)
    import graft.dedup.Dedup
    def tk = docs.select(col("doc_id"), Dedup.normTokens(col("text")).as("_tk"))
    def shPlain = tk.select(col("doc_id"),
      Dedup.shinglesFromTokens(col("_tk"), 3).as("sh"))
    def shSorted = tk.select(col("doc_id"),
      sort_array(Dedup.shinglesFromTokens(col("_tk"), 3)).as("sh"))
    def pairs = docs.select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))

    time("docs_scan")(docs)
    time("tokens")(tk)
    time("shingles")(shPlain)
    time("shingles_sorted")(shSorted)
    def joined(sh: => DataFrame) = pairs
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
    time("joined_arrays")(joined(shSorted))
    time("joined_plus_kernel")(joined(shSorted)
      .withColumn("inter",
        call_function("graft_sorted_inter_size", col("sh1"), col("sh2"))))
    time("joined_plus_builtin")(joined(shPlain)
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2")))))
    time("full_row_registry")(
      graft.SparkEntry.queries("q_ngram_jaccard")(spark, dir))
    spark.stop()
  }
}
