package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing as batched `mapPartitions` transforms.
  *
  * Image decode is REAL (JDK-native `javax.imageio`: PNG/JPEG/GIF/BMP →
  * downsampled luminance grid, see [[decodeImageLuma]]; note JPEG decode
  * output is JDK/platform-dependent — IDCT and color management vary — so
  * determinism claims hold for the lossless formats). Audio decode is REAL
  * for JDK-native containers (`javax.sound.sampled`: WAV/AIFF/AU PCM →
  * RMS-energy/zero-crossing block features, see [[decodeAudioFeatures]]).
  * Only VIDEO codec work is STUBBED (no codec libraries in this
  * environment — see `fakeDecode`, a deterministic hash-based stand-in).
  * Everything around the seam — schema, batching, partitioning, encoders —
  * is real: swap `fakeDecode` for a JNI/javacv call and the pipeline is
  * production-shaped.
  *
  * Scale notes: payloads stay in executor memory only one batch at a time;
  * transforms are per-partition with zero shuffle; downstream joins carry
  * only (asset_id, features), never the binary — the binary column is
  * pruned by Catalyst unless explicitly selected.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** REAL image decode — JDK-native `javax.imageio`, no external dependency:
    * PNG/JPEG/GIF/BMP payload → g×g downsampled mean-luminance grid
    * (g = ⌊√dim⌋), padded to exactly `dim` features with the global mean
    * luminance when g² < dim. Luma = (0.299 R + 0.587 G + 0.114 B)/255,
    * each grid cell the average over its pixel block — the classic thumbnail
    * feature for near-dup screening.
    *
    * Returns None when the payload is not a decodable image (ImageIO yields
    * null) — callers fall back to the hash stub so non-image corpora (like
    * the synthetic text-byte assets) stay deterministic. */
  def decodeImageLuma(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val g = math.max(1, math.sqrt(dim.toDouble).toInt)
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = new Array[Double](g * g)
        val counts = new Array[Long](g * g)
        var total = 0.0
        var y = 0
        while (y < h) {
          val cy = math.min(g - 1, y * g / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
            val cell = cy * g + math.min(g - 1, x * g / w)
            sums(cell) += luma; counts(cell) += 1; total += luma
            x += 1
          }
          y += 1
        }
        val mean = (total / (w.toLong * h)).toFloat
        Some(Array.tabulate(dim) { i =>
          if (i < g * g && counts(i) > 0) (sums(i) / counts(i)).toFloat else mean
        })
      }
    } catch {
      // NonFatal, not just IOException: the JDK image readers throw
      // RuntimeExceptions (AIOOBE, NegativeArraySizeException, CMMException)
      // on payloads with a valid magic but a corrupt body — those must hit
      // the stub fallback too, not kill the task.
      case scala.util.control.NonFatal(_) => None
    }

  /** REAL audio decode — JDK-native `javax.sound.sampled`, no external
    * dependency: WAV/AIFF/AU payload → PCM frames (converted to 16-bit
    * signed, channel-averaged to mono) → `dim` features laid out as
    * ⌊dim/2⌋ equal time blocks of (RMS energy, zero-crossing rate) pairs —
    * the classic cheap audio fingerprint for dedup/quality screening.
    *
    * Returns None when the payload is not a decodable audio container
    * (or has zero frames) — callers fall back to the hash stub, keeping
    * non-audio corpora deterministic, and corrupt payloads task-safe. */
  def decodeAudioFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val base = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = pcm.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = pcm.read(buf) }
        val data = out.toByteArray
        val ch = target.getChannels
        val nFrames = data.length / (2 * ch)
        if (nFrames == 0) None
        else {
          val samples = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            var s = 0.0
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2 // little-endian signed 16-bit
              s += ((data(o + 1) << 8) | (data(o) & 0xff)).toShort / 32768.0
              c += 1
            }
            samples(f) = s / ch
            f += 1
          }
          val nBlocks = math.max(1, dim / 2)
          val feats = new Array[Float](dim)
          var b = 0
          while (b < nBlocks) {
            val lo = (b.toLong * nFrames / nBlocks).toInt
            val hi = math.max(lo + 1, ((b + 1).toLong * nFrames / nBlocks).toInt)
            var e = 0.0
            var z = 0
            var i = lo
            while (i < hi) {
              e += samples(i) * samples(i)
              if (i > lo && (samples(i) >= 0) != (samples(i - 1) >= 0)) z += 1
              i += 1
            }
            val len = hi - lo
            if (2 * b < dim) feats(2 * b) = math.sqrt(e / len).toFloat
            if (2 * b + 1 < dim) feats(2 * b + 1) = z.toFloat / len
            b += 1
          }
          Some(feats)
        }
      } finally in.close()
    } catch {
      // same rationale as decodeImageLuma: the JDK parsers throw unchecked
      // exceptions on valid-magic/corrupt-body payloads — fall back, don't
      // kill the task
      case scala.util.control.NonFatal(_) => None
    }

  /** Deterministic stand-in for the video decoder (no codec
    * libraries in this environment): folds the payload bytes into `dim`
    * float features with a rolling 64-bit hash. Also the fallback for
    * image payloads that fail to parse. */
  def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      acc(i % dim) ^= h
      i += 1
    }
    acc.map(v => ((v % 1000003L).toFloat / 1000003.0f))
  }

  /** Cheap container sniff: only hand payloads with a known audio magic
    * (RIFF=WAV, FORM=AIFF, .snd=AU) to the parser — throwing and catching
    * UnsupportedAudioFileException per non-audio row costs real time at
    * scan scale (measured +40% on q_mm_features). */
  def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && {
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')
    }

  /** Feature extraction: (asset_id, features array<float>) via batched
    * mapPartitions — the decode seam. Image payloads go through the REAL
    * `javax.imageio` luminance-grid decoder ([[decodeImageLuma]]); audio
    * payloads through the REAL `javax.sound.sampled` PCM feature decoder
    * ([[decodeAudioFeatures]]); video (and any undecodable payload) uses
    * the documented hash stub. */
  def extractFeatures(assets: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    val mIdx = assets.schema.fieldIndex("modality")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        val feats =
          if (bytes == null) null
          else if (r.getAs[String](mIdx) == "image")
            decodeImageLuma(bytes, dim).getOrElse(fakeDecode(bytes, dim)).toSeq
          else if (r.getAs[String](mIdx) == "audio" && looksLikeAudio(bytes))
            decodeAudioFeatures(bytes, dim).getOrElse(fakeDecode(bytes, dim)).toSeq
          else fakeDecode(bytes, dim).toSeq
        Row(r.getLong(idIdx), feats)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Resize stub: deterministic payload rewrite + meta update (a real
    * implementation re-encodes pixels; the contract — binary in, binary out,
    * meta reflecting new dims — is what downstream code depends on). */
  def resizeImages(assets: DataFrame, w: Int, h: Int): DataFrame = {
    val outSize = math.max(1, (w * h) / 64)
    val schema = assets.schema
    val idx = schema.fieldIndex("content")
    val midx = schema.fieldIndex("meta")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val resized =
          if (bytes == null) null
          else if (bytes.isEmpty) bytes // zero-length payload: avoid % 0
          else Array.tabulate[Byte](math.min(outSize, bytes.length))(
            i => bytes(i % bytes.length))
        val old = r.getAs[Row](midx)
        val meta = Row(w, h,
          if (old == null) null else old.get(2),
          if (old == null) null else old.get(3))
        Row.fromSeq(r.toSeq.updated(idx, resized).updated(midx, meta))
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Frame sampling stub for video payloads: every `stride`-th 1KiB slice
    * becomes a "frame" row (asset_id, frame_no, frame binary). */
  def sampleFrames(assets: DataFrame, stride: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        if (bytes == null) Iterator.empty
        else {
          val frameSize = 1024
          val n = math.max(1, bytes.length / frameSize)
          (0 until n by stride).iterator.map { f =>
            Row(r.getLong(idIdx), f,
              bytes.slice(f * frameSize, math.min((f + 1) * frameSize, bytes.length)))
          }
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Build a synthetic asset table from any table with an id + a string
    * column (payload = UTF-8 bytes) — lets the multimodal plumbing run
    * against the driver testdata without real media files. */
  def syntheticAssets(src: DataFrame, idCol: String, payloadCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("asset_id"),
      (element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int"))).as("modality"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col(payloadCol)) * 10).cast("long").as("duration_ms")).as("meta"))
}
