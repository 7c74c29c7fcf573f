package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the decode-once amortization the media index exists
  * for (the IndexProbe shape, for multimodal). Over the given corpus's
  * synthetic real-container assets it times:
  *
  *  - `build`      — ONE indexRow pass over all assets (every payload
  *                   decoded once → dhash/ahash/vhash/features persisted)
  *  - `append_10pc` — decoding and appending a 10%-sized batch of NEW
  *                   assets (id-shifted) as generation 1: must scale with
  *                   the batch, never the index
  *  - `pairs_from_index_x3` — the three Hamming pair queries (image,
  *                   audio, video) reading PERSISTED hashes
  *  - `pairs_with_decode_x3` — the same three pair queries on the
  *                   standalone decode path (what every query paid before
  *                   round 12)
  *  - `reads_x5`   — 5 repeated per-modality hash reads from the index
  *                   (the "everywhere" in decode-once/reuse-everywhere)
  *
  * Usage: {{{ runMain graft.tools.MediaIndexProbe /root/testdata/sf0.1 }}} */
object MediaIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    import graft.multimodal.{MediaIndex, Multimodal}
    val docs = graft.Tables.documents(spark, dir).select("doc_id")
      .persist()
    val n = docs.count()

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"""{"op":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }

    val assets = Multimodal.mediaAssets(docs, "doc_id")
    // new assets: a 10% slice with shifted ids (distinct payloads — the
    // formulas key on the id)
    val batch = Multimodal.mediaAssets(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + lit(1L << 40)).as("doc_id")), "doc_id")

    val idxDir = graft.Queries.scratchDir("probe_mm_index")
    time("build")(MediaIndex.build(assets, idxDir))
    time("append_10pc")(MediaIndex.append(batch, spark, idxDir))

    val bands: Seq[(String, String, Seq[Int], Int)] = Seq(
      ("image", "dhash", Seq(5, 5, 5, 5, 4), 4),
      ("audio", "ahash", Seq(5, 5, 4), 2),
      ("video", "vhash", Seq(8, 8, 8, 8, 8, 8), 4))
    time("pairs_from_index_x3") {
      bands.foreach { case (m, c, bw, d) =>
        graft.sim.Hamming.pairCounts(
          MediaIndex.hashes(spark, idxDir, m, c), c, bw, d).count()
      }
    }
    time("pairs_with_decode_x3") {
      Seq[(org.apache.spark.sql.DataFrame, String, Seq[Int], Int)](
        (Multimodal.dHashImages(assets), "dhash", Seq(5, 5, 5, 5, 4), 4),
        (Multimodal.audioEnergyHash(assets), "ahash", Seq(5, 5, 4), 2),
        (Multimodal.videoTemporalHash(assets), "vhash",
          Seq(8, 8, 8, 8, 8, 8), 4))
        .foreach { case (h, c, bw, d) =>
          graft.sim.Hamming.pairCounts(h, c, bw, d).count()
        }
    }
    time("reads_x5") {
      (0 until 5).foreach { _ =>
        bands.foreach { case (m, c, _, _) =>
          MediaIndex.hashes(spark, idxDir, m, c).count()
        }
      }
    }
    spark.stop()
  }
}
