package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The decode-once contract: every column of the persisted media index is
  * bit-identical to its standalone producer (which each decode the corpus
  * on their own), the append path is O(batch) with generation accounting,
  * and the cross-process cache installs exactly once per source identity. */
class MediaIndexSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int): DataFrame =
    (0L until n.toLong).toDF("doc_id")

  /** Real-container assets for ids 0..n-1 plus adversarial rows: a corrupt
    * image, a corrupt audio payload with a valid RIFF magic, a null-content
    * row, and an unknown modality — the fallback branches must persist
    * exactly what the standalone producers emit for them. */
  private def fixtureAssets(n: Int): DataFrame = {
    val real = Multimodal.mediaAssets(ids(n), "doc_id")
    val extra = Seq(
      Row(1000L, "image", Array[Byte](1, 2, 3, 4), null),
      Row(1001L, "audio", "RIFFgarbage-not-a-wav".getBytes("US-ASCII"), null),
      Row(1002L, "video", null, null),
      Row(1003L, "sensor", Array[Byte](9, 9, 9), null))
    val extraDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(extra).asJava),
      Multimodal.assetSchema)
    real.unionByName(extraDf)
  }

  test("index columns are bit-identical to the standalone decoders (decode-once parity)") {
    val assets = fixtureAssets(30).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_mmidx").toString
    val n = MediaIndex.build(assets, dir, dim = 16)
    assert(n == 34L)
    val idx = MediaIndex.load(spark, dir)
    assert(idx.count() == 34L)
    assert(idx.agg(max("_gen")).as[Long].head() == 0L)

    def pairs(df: DataFrame, c: String): Set[(Long, Option[Long])] =
      df.select(col("asset_id"), col(c)).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(pairs(idx, "dhash") == pairs(Multimodal.dHashImages(assets), "dhash"))
    assert(pairs(idx, "ahash") == pairs(Multimodal.audioEnergyHash(assets), "ahash"))
    assert(pairs(idx, "vhash") == pairs(Multimodal.videoTemporalHash(assets), "vhash"))

    def feats(df: DataFrame): Map[Long, Option[Seq[Float]]] =
      df.select(col("asset_id"), col("features")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Float](1)))).toMap
    val fromIndex = feats(idx)
    val standalone = feats(Multimodal.extractFeatures(assets, dim = 16))
    assert(fromIndex == standalone,
      s"feature mismatch at ids ${fromIndex.keySet.filter(k =>
        fromIndex(k) != standalone(k))}")
  }

  test("append is a later generation; generations reports population + decode health; per-modality read prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mmidx_app").toString
    MediaIndex.build(Multimodal.mediaAssets(ids(12), "doc_id"), dir)
    val batch = fixtureAssets(18).filter($"asset_id" >= 12L)
    val added = MediaIndex.append(batch, spark, dir, gen = 1L)
    assert(added == 10L) // ids 12..17 + the 4 adversarial rows
    val gens = MediaIndex.generations(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // build: ids 0..11 -> 4 per modality, all decodable
    assert(gens.filter(_._2 == 0L).toSet ==
      Set(("image", 0L, 4L, 4L), ("audio", 0L, 4L, 4L), ("video", 0L, 4L, 4L)))
    // appended: ids 12..17 (2 per modality, decodable) + corrupt image,
    // corrupt audio, null video, unknown modality -> n_hashed < n there
    assert(gens.filter(_._2 == 1L).toSet ==
      Set(("image", 1L, 3L, 2L), ("audio", 1L, 3L, 2L),
        ("video", 1L, 3L, 2L), ("sensor", 1L, 1L, 0L)))

    // hashes() sees base + appended rows and prunes to one modality dir
    val img = MediaIndex.hashes(spark, dir, "image", "dhash")
    assert(img.count() == 6L) // 4 build + 2 decodable appended
    img.collect()
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(allNodes)
    }
    val scan = allNodes(img.queryExecution.executedPlan).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("modality")),
      s"modality read is not partition-pruned: ${scan.partitionFilters}")
    assert(scan.requiredSchema.fieldNames.toSet == Set("asset_id", "dhash"),
      s"hash read is not column-pruned: ${scan.requiredSchema.fieldNames.toSeq}")

    // appending at gen 0 is a contract violation
    intercept[IllegalArgumentException] {
      MediaIndex.append(batch, spark, dir, gen = 0L)
    }
  }

  test("cachedFor installs once per source identity and serves every later caller") {
    val src = java.nio.file.Files.createTempDirectory("graft_mmidx_src").toString
    ids(9).write.mode("overwrite").parquet(s"$src/documents.parquet")
    def assets = Multimodal.mediaAssets(
      spark.read.parquet(s"$src/documents.parquet"), "doc_id")
    val p1 = MediaIndex.cachedFor(spark, src, dim = 16)(assets)
    val marker = new java.io.File(p1, "hashes/_SUCCESS")
    assert(marker.exists())
    val stamp = marker.lastModified()
    val p2 = MediaIndex.cachedFor(spark, src, dim = 16)(
      sys.error("second caller must not rebuild"): DataFrame)
    assert(p2 == p1 && marker.lastModified() == stamp)
    assert(MediaIndex.load(spark, p1).count() == 9L)
    // a regenerated source (new mtime/size) gets a NEW key — the stale
    // index is simply never found
    Thread.sleep(1100) // parquet mtime granularity
    ids(10).write.mode("overwrite").parquet(s"$src/documents.parquet")
    val p3 = MediaIndex.cachedFor(spark, src, dim = 16)(assets)
    assert(p3 != p1)
    assert(MediaIndex.load(spark, p3).count() == 10L)
  }
}
