object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime()-t0)/1e9}%8.2f  $name rows=$n")
    }
    time("warmup")(graft.Tables.documents(spark, d).count())
    val q = graft.Queries.queries
    time("q_minhash_lsh")(q("q_minhash_lsh")(spark, d).count())
    time("q_ngram_jaccard")(q("q_ngram_jaccard")(spark, d).count())
    time("q_dedup_exact")(q("q_dedup_exact")(spark, d).count())
    time("q_ann_brute")(q("q_ann_brute")(spark, d).count())
    time("q_ann_lsh")(q("q_ann_lsh")(spark, d).count())
    spark.stop()
  }
}
