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

  test("decodeImageLuma: real PNG decodes to the expected luminance grid") {
    // 8×8 PNG, left half black, right half white → 4×4 grid whose left two
    // columns are ~0 and right two are ~1.
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feats = Multimodal.decodeImageLuma(bos.toByteArray, 16).get
    assert(feats.length == 16)
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val v = feats(cy * 4 + cx)
      if (cx < 2) assert(v < 0.01, s"cell ($cy,$cx)=$v should be black")
      else assert(v > 0.99, s"cell ($cy,$cx)=$v should be white")
    }
  }

  test("extractFeatures routes real image bytes through the ImageIO decoder") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, "image", bos.toByteArray), (2L, "audio", bos.toByteArray))
      .toDF("asset_id", "modality", "content")
    val f = Multimodal.extractFeatures(df, dim = 4).orderBy("asset_id").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("features")))
    // all-white image: every luminance cell is 1.0
    assert(f(0).forall(v => math.abs(v - 1.0f) < 1e-3))
    // audio arm still the deterministic hash stub — NOT all-ones
    assert(!f(1).forall(v => math.abs(v - 1.0f) < 1e-3))
  }

  test("decodeImageLuma returns None on non-image bytes (stub fallback path)") {
    assert(Multimodal.decodeImageLuma("not an image".getBytes, 16).isEmpty)
  }

  test("binary column is pruned when only features are selected") {
    val feats = Multimodal.extractFeatures(assets, dim = 8)
    val scan = feats.queryExecution.executedPlan.toString
    assert(!scan.contains("content") || scan.contains("DeserializeToObject"))
  }
}
