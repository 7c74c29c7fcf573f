package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.syntheticAssets(
    Seq((1L, "hello multimodal world " * 100),
        (2L, "another payload entirely " * 200),
        (3L, "x")).toDF("id", "payload"), "id", "payload")

  test("syntheticAssets: binary content + typed meta matching assetSchema") {
    val a = assets.orderBy("asset_id").collect()
    assert(assets.schema("content").dataType.typeName == "binary")
    assert(a(0).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 64)
    assert(Set("image", "audio", "video")(a(0).getAs[String]("modality")))
  }

  test("extractFeatures: deterministic fixed-dim vectors via mapPartitions") {
    def feats() = Multimodal.extractFeatures(assets, dim = 16)
      .orderBy("asset_id").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toList
    val f1 = feats()
    val f2 = feats()
    assert(f1.forall(_.size == 16))
    assert(f1 == f2) // deterministic stub
    assert(f1(0) != f1(1))
  }

  test("resizeImages rewrites payload and meta dims, keeps schema") {
    val r = Multimodal.resizeImages(assets, 32, 32).orderBy("asset_id").collect()
    val meta = r(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("width") == 32 && meta.getAs[Int]("height") == 32)
    assert(r(0).getAs[Array[Byte]]("content").nonEmpty)
  }

  test("sampleFrames: every stride-th 1KiB slice becomes a frame row") {
    val frames = Multimodal.sampleFrames(assets, stride = 2)
    val byAsset = frames.groupBy("asset_id").count().orderBy("asset_id").collect()
    // asset 1: 2300 bytes -> 2 frames -> stride 2 -> 1; asset 2: 5000 -> 4 -> 2
    assert(byAsset.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 1L)))
    assert(frames.schema("frame").dataType.typeName == "binary")
  }

  test("binary column is pruned when only features are selected") {
    val feats = Multimodal.extractFeatures(assets, dim = 8)
    val scan = feats.queryExecution.executedPlan.toString
    assert(!scan.contains("content") || scan.contains("DeserializeToObject"))
  }
}
