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

  /** In-memory 16-bit mono WAV with the given samples in [-1, 1]. */
  private def wavBytes(samples: Array[Double], rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, (s * 32767).round.toInt))
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudioFeatures: real WAV decodes to per-block RMS + zero-crossing features") {
    // first half: full-scale 400 Hz sine; second half: silence
    val n = 8000
    val samples = Array.tabulate(n)(i =>
      if (i < n / 2) math.sin(2 * math.Pi * 400 * i / 8000.0) else 0.0)
    val feats = Multimodal.decodeAudioFeatures(wavBytes(samples), dim = 8).get
    assert(feats.length == 8)
    // 4 blocks of (rms, zcr): blocks 0-1 cover the sine (rms ~ 0.707,
    // zcr ~ 2*400/8000 = 0.1), blocks 2-3 the silence (both ~ 0)
    assert(math.abs(feats(0) - 0.707) < 0.05, s"sine rms ${feats(0)}")
    assert(math.abs(feats(1) - 0.1) < 0.02, s"sine zcr ${feats(1)}")
    assert(feats(4) < 1e-6 && feats(6) < 1e-6, "silence rms must be ~0")
  }

  test("decodeAudioFeatures returns None on non-audio bytes; extractFeatures routes audio") {
    assert(Multimodal.decodeAudioFeatures("definitely not a wav".getBytes, 8).isEmpty)
    val sine = wavBytes(Array.tabulate(4000)(i => math.sin(2 * math.Pi * 200 * i / 8000.0)))
    val df = Seq((1L, "audio", sine), (2L, "audio", "corrupt".getBytes),
        (3L, "video", sine))
      .toDF("asset_id", "modality", "content")
    val f = Multimodal.extractFeatures(df, dim = 8).orderBy("asset_id").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("features")))
    // real decode: RMS of a full-scale sine ~0.707 in every block
    assert(math.abs(f(0)(0) - 0.707) < 0.05, s"wav rms ${f(0)(0)}")
    // corrupt audio payload falls back to the deterministic hash stub
    assert(f(1).toList == Multimodal.fakeDecode("corrupt".getBytes, 8).toList)
    // video stays on the stub even for valid wav bytes
    assert(f(2).toList == Multimodal.fakeDecode(sine, 8).toList)
  }

  test("binary column is pruned when only features are selected") {
    val feats = Multimodal.extractFeatures(assets, dim = 8)
    val scan = feats.queryExecution.executedPlan.toString
    assert(!scan.contains("content") || scan.contains("DeserializeToObject"))
  }
}
