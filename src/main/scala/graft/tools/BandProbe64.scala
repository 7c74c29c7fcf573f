package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: candidate-law attribution for the PRIMARY `q_simhash_pairs`
  * row (SimHash-64, bands {13,13,13,13,12}, re-syndication overlay) — the
  * same `Hamming.bandingStats` read `q_banding_capacity` gives the 32-bit
  * banding, applied to the 64-bit primary at two SFs. Prints, per dir:
  * corpus rows, distinct fingerprints D, per-band candidate fan-out and
  * the total, plus the emitted pair count. A pair-mining operator's wall
  * is lower-bounded by its candidate/output volume, so "time ratio vs
  * data ratio" is only meaningful next to "candidate ratio" — this tool
  * measures the denominator.
  * Usage: {{{ runMain graft.tools.BandProbe64 <dirA> <dirB> }}} */
object BandProbe64 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BandProbe64 <dirA> <dirB>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args.take(2)) {
      val docs = graft.Tables.documents(spark, d)
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val fp: DataFrame = corpus
        .select(graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
        .select(graft.dedup.Dedup.simhash64Md5(col("_m")).as("sh"))
      val n = corpus.count()
      val dDistinct = fp.select(countDistinct(col("sh"))).collect()(0).getLong(0)
      val stats = graft.sim.Hamming.bandingStats(fp, "sh",
        bandWidths = Seq(13, 13, 13, 13, 12))
      val rows = stats.collect()
      val totalCand = rows.map(_.getAs[Long]("candidates")).sum
      // pairCounts returns a (hamming, n_pairs) HISTOGRAM — the pair
      // volume is the sum of n_pairs, not the row count (≤ maxDist+1)
      val pairs = graft.sim.Hamming.pairCounts(fp, "sh",
          bandWidths = Seq(13, 13, 13, 13, 12), maxDist = 4)
        .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
      println(s"DIR $d  corpus=$n  distinct=$dDistinct  " +
        s"candidates=$totalCand  pairs=$pairs")
      rows.foreach(r => println(
        s"  band ${r.getAs[Int]("band")}: buckets=${r.getAs[Long]("n_buckets")} " +
        s"max=${r.getAs[Long]("max_bucket")} cand=${r.getAs[Long]("candidates")}"))
    }
    spark.stop()
  }
}
