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
  * Video decode is REAL for the uncompressed YUV4MPEG2 container (pure-JDK
  * header + planar-frame parse, frame-0 luminance plane → the same grid
  * the image path emits, see [[decodeVideoLuma]]).
  *
  * Compressed audio: IMA/DVI ADPCM (WAV format tag 0x11) decodes IN-JVM
  * (`decodeImaAdpcmWav` — a deterministic ~50-line integer state machine,
  * certified lossy-bounded by `q_mm_adpcm`), reaching every decodePcm16
  * consumer with no caller changes.
  *
  * DECISION (final for this library): transform-coded A/V codecs
  * (H.264/HEVC, MP3/AAC) are OUT OF SCOPE. The JDK ships no decoder for
  * them, and the correct production integration is a JNI binding to a
  * maintained codec library (ffmpeg via javacv) — not a from-scratch JVM
  * decoder, which would be slower, less correct, and a security
  * liability. Payloads in
  * those formats deterministically fall back to `fakeDecode` (hash
  * stand-in), and [[probeContainer]] reports the real container type so a
  * pipeline can route or quarantine them. Everything codec-independent —
  * schema, batching, partitioning, binary-column pruning, the
  * decode→feature interface — is real and tested; a javacv call dropped
  * into the `fakeDecode` branch is the entire integration surface.
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
      else Some(lumaGrid(img.getWidth, img.getHeight, dim, { (x, y) =>
        val rgb = img.getRGB(x, y)
        (0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
      }))
    } catch {
      // NonFatal, not just IOException: the JDK image readers throw
      // RuntimeExceptions (AIOOBE, NegativeArraySizeException, CMMException)
      // on payloads with a valid magic but a corrupt body — those must hit
      // the stub fallback too, not kill the task.
      case scala.util.control.NonFatal(_) => None
    }

  /** Shared grid fold for the pixel-plane decoders (image RGB, video Y):
    * g×g mean-luminance cells (g = ⌊√dim⌋), row-major scan, padded to
    * exactly `dim` with the global mean when g² < dim. Kept as one loop so
    * image and video features live on the identical feature scale. */
  private def lumaGrid(w: Int, h: Int, dim: Int,
                       lumaAt: (Int, Int) => Double): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val sums = new Array[Double](g * g)
    val counts = new Array[Long](g * g)
    var total = 0.0
    var y = 0
    while (y < h) {
      val cy = math.min(g - 1, y * g / h)
      var x = 0
      while (x < w) {
        val luma = lumaAt(x, y)
        val cell = cy * g + math.min(g - 1, x * g / w)
        sums(cell) += luma; counts(cell) += 1; total += luma
        x += 1
      }
      y += 1
    }
    val mean = (total / (w.toLong * h)).toFloat
    Array.tabulate(dim) { i =>
      if (i < g * g && counts(i) > 0) (sums(i) / counts(i)).toFloat else mean
    }
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
    decodePcm16(bytes).flatMap { case (data, ch) =>
      audioFeaturesFromPcm(data, ch, dim)
    }

  /** The post-decode half of [[decodeAudioFeatures]] — the exact feature
    * math over already-decoded PCM16 bytes, factored out so the decode-
    * once index kernel ([[indexRow]]) can derive features AND fingerprint
    * from a single [[decodePcm16]] call. Bit-identical to the previous
    * inline body by construction (the code moved, nothing changed). */
  private[multimodal] def audioFeaturesFromPcm(data: Array[Byte], ch: Int,
                                               dim: Int): Option[Array[Float]] = {
    {
      // (indentation preserved from the original inline body)
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
    }
  }

  /** Shared decode plumbing: any supported audio container → (little-endian
    * signed PCM16 bytes, channel count). Tries the JDK path first (PCM
    * WAV/AIFF/AU), then the in-JVM IMA-ADPCM decoder ([[decodeImaAdpcmWav]]
    * — the JDK ships NO decoder for WAV format tag 0x11, so javax throws
    * and the compressed branch takes over). None on undecodable payloads —
    * the parsers throw unchecked exceptions on valid-magic/corrupt-body
    * bytes, which must hit the fallback, not kill the task. */
  private def decodePcm16(bytes: Array[Byte]): Option[(Array[Byte], Int)] =
    javaxPcm16(bytes).orElse(decodeImaAdpcmWav(bytes))

  private def javaxPcm16(bytes: Array[Byte]): Option[(Array[Byte], Int)] =
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
        Some((out.toByteArray, target.getChannels))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- IMA/DVI ADPCM (WAV format tag 0x11) — the one compressed audio
  // codec that belongs IN the JVM: a ~50-line deterministic integer state
  // machine (predictor + 89-entry step table), standardized since 1992,
  // with none of the security/maintenance surface that keeps H.264/MP3
  // behind the documented JNI seam. Upgrades the audio modality from
  // "PCM containers only" to a real 4:1 compressed codec: every
  // decodePcm16 consumer (features, fingerprints, q_ahash) handles
  // ADPCM payloads through this branch with no caller changes. ----

  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA decode step: (new predictor, new step index). The canonical
    * bit-test form (step>>3 base + conditional step, step>>1, step>>2
    * terms) — both the decoder and the encoder's tracking update run
    * exactly this, which is what makes encode→decode deterministic. */
  private def imaStep(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = ImaStep(idx)
    var diff = step >> 3
    if ((nib & 1) != 0) diff += step >> 2
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 4) != 0) diff += step
    val p = math.max(-32768, math.min(32767,
      if ((nib & 8) != 0) pred - diff else pred + diff))
    (p, math.max(0, math.min(88, idx + ImaIndexAdj(nib & 7))))
  }

  /** Decode a mono IMA-ADPCM WAV (format tag 0x11) to little-endian PCM16
    * bytes. Block layout per IMA spec: 4-byte header (predictor int16 =
    * sample 0 VERBATIM, step index, reserved) then 2 nibbles/byte, low
    * nibble first. Returns None for anything that is not a well-formed
    * mono tag-0x11 WAV — corrupt bodies degrade to the hash fallback,
    * never kill the task. */
  private[multimodal] def decodeImaAdpcmWav(bytes: Array[Byte])
      : Option[(Array[Byte], Int)] =
    try {
      def ascii(o: Int, n: Int) = new String(bytes, o, n, "US-ASCII")
      def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      if (bytes.length < 12 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") None
      else {
        var o = 12
        var tag = 0; var ch = 0; var blockAlign = 0; var spb = 0
        var dataOff = -1; var dataLen = 0
        while (o + 8 <= bytes.length && (tag == 0 || dataOff < 0)) {
          val id = ascii(o, 4); val sz = le32(o + 4)
          if (sz < 0) o = bytes.length // hostile-size guard (see probeMeta)
          else {
            if (id == "fmt " && sz >= 16 && o + 8 + sz <= bytes.length) {
              tag = le16(o + 8); ch = le16(o + 10)
              blockAlign = le16(o + 20)
              if (sz >= 20) spb = le16(o + 26) // cbSize=2 + samplesPerBlock
            } else if (id == "data" && dataOff < 0) {
              dataOff = o + 8
              dataLen = math.max(0, math.min(sz, bytes.length - dataOff))
            }
            o += 8 + sz + (sz & 1)
          }
        }
        if (tag != 0x11 || ch != 1 || blockAlign < 5 || dataOff < 0) None
        else {
          val sPerBlock = if (spb > 0) spb else (blockAlign - 4) * 2 + 1
          val out = new java.io.ByteArrayOutputStream()
          def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
          var bo = dataOff
          val end = dataOff + dataLen
          while (bo + blockAlign <= end) {
            var pred = le16(bo).toShort.toInt
            var idx = math.max(0, math.min(88, bytes(bo + 2) & 0xff))
            put16(pred)
            var produced = 1
            var p = bo + 4
            while (p < bo + blockAlign && produced < sPerBlock) {
              val b = bytes(p) & 0xff
              var k = 0
              while (k < 2 && produced < sPerBlock) {
                val (np, ni) = imaStep(if (k == 0) b & 0xf else (b >> 4) & 0xf,
                  pred, idx)
                pred = np; idx = ni
                put16(pred)
                produced += 1
                k += 1
              }
              p += 1
            }
            bo += blockAlign
          }
          val arr = out.toByteArray
          if (arr.length < 2) None else Some((arr, 1))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Encode one mono IMA-ADPCM block (samples(0) stored verbatim in the
    * header — the decoder's exactness anchor; the rest as 4-bit deltas
    * with the encoder tracking the decoder state, so the error at each
    * sample is the quantization residual only, never drift). */
  private[multimodal] def encodeImaAdpcmBlock(samples: Array[Int]): Array[Byte] = {
    require(samples.nonEmpty)
    var pred = samples(0)
    var idx = 0
    val nibbles = new Array[Int](math.max(0, samples.length - 1))
    var i = 1
    while (i < samples.length) {
      val step = ImaStep(idx)
      var diff = samples(i) - pred
      var nib = 0
      if (diff < 0) { nib = 8; diff = -diff }
      if (diff >= step) { nib |= 4; diff -= step }
      if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) nib |= 1
      val (np, ni) = imaStep(nib, pred, idx)
      pred = np; idx = ni
      nibbles(i - 1) = nib
      i += 1
    }
    val block = java.nio.ByteBuffer
      .allocate(4 + (nibbles.length + 1) / 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    block.putShort(samples(0).toShort).put(0.toByte).put(0.toByte)
    var j = 0
    while (j < nibbles.length) {
      val lo = nibbles(j)
      val hi = if (j + 1 < nibbles.length) nibbles(j + 1) else 0
      block.put(((hi << 4) | lo).toByte)
      j += 2
    }
    block.array()
  }

  /** Raw per-frame INTEGER channel sums from a decodable audio payload
    * ([[decodePcm16]] without the float conversion): exact int64
    * arithmetic end-to-end, so downstream comparisons are bit-reproducible
    * cross-engine (float block energies differ by accumulation order).
    * Mono frames are the PCM16 values themselves. */
  private def pcmFrameInts(bytes: Array[Byte]): Option[Array[Long]] =
    decodePcm16(bytes).flatMap { case (data, ch) =>
      frameIntsFromPcm(data, ch)
    }

  /** The post-decode half of [[pcmFrameInts]] (see
    * [[audioFeaturesFromPcm]] for why it is factored out). */
  private[multimodal] def frameIntsFromPcm(data: Array[Byte], ch: Int)
      : Option[Array[Long]] = {
    val nFrames = data.length / (2 * ch)
    if (nFrames == 0) None
    else Some(Array.tabulate(nFrames) { f =>
      var s = 0L
      var c = 0
      while (c < ch) {
        val o = (f * ch + c) * 2 // little-endian signed 16-bit
        s += ((data(o + 1) << 8) | (data(o) & 0xff)).toShort.toLong
        c += 1
      }
      s
    })
  }

  /** Audio fingerprint — the [[dHashImages]] analog for sound: the decoded
    * stream splits into 8 equal time blocks; bit b (0–6) compares adjacent
    * block ENERGIES (Σ sample², exact int64 — order-independent, so the
    * cross-engine replay is bit-exact, unlike float RMS), bit 7+b compares
    * adjacent block zero-crossing counts. 14 bits total: near-identical
    * recordings land within a small Hamming distance. Null for non-audio /
    * undecodable payloads (same rationale as the image hash). */
  /** The 14-bit fingerprint fold over the exact per-frame channel sums —
    * [[audioEnergyHash]]'s per-row kernel, factored out for the
    * decode-once index ([[indexRow]]). */
  private[multimodal] def audioHashBits(x: Array[Long]): Long = {
    val nBlocks = 8
    val e = new Array[Long](nBlocks)
    val z = new Array[Int](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val lo = (b.toLong * x.length / nBlocks).toInt
      val hi = math.max(lo + 1,
        ((b + 1).toLong * x.length / nBlocks).toInt)
      var i = lo
      while (i < hi) {
        e(b) += x(i) * x(i)
        if (i > lo && (x(i) >= 0) != (x(i - 1) >= 0)) z(b) += 1
        i += 1
      }
      b += 1
    }
    var bits = 0L
    b = 0
    while (b < nBlocks - 1) {
      if (e(b) < e(b + 1)) bits |= 1L << b
      if (z(b) < z(b + 1)) bits |= 1L << (7 + b)
      b += 1
    }
    bits
  }

  def audioEnergyHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    val mIdx = assets.schema.fieldIndex("modality")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        val hash: java.lang.Long =
          if (bytes == null || r.getAs[String](mIdx) != "audio") null
          else pcmFrameInts(bytes) match {
            case Some(x) => java.lang.Long.valueOf(audioHashBits(x))
            case None    => null
          }
        Row(r.getLong(idIdx), hash)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---- REAL video decode: YUV4MPEG2 (uncompressed planar YUV) ----

  /** Parsed Y4M stream header: frame dims, bytes per full YUV frame, and
    * the offset of the first FRAME marker. */
  private[multimodal] final case class Y4mHeader(
    w: Int, h: Int, frameBytes: Int, firstFrameOff: Int)

  /** Magic sniff for the YUV4MPEG2 container — same role as
    * [[looksLikeAudio]]: only payloads with the magic reach the parser. */
  def looksLikeY4m(b: Array[Byte]): Boolean = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    b.length > magic.length && magic.indices.forall(i => b(i) == magic(i))
  }

  /** YUV4MPEG2 stream-header parse (pure JDK): `YUV4MPEG2 W<w> H<h> …\n`,
    * space-separated single-letter params; chroma layout from the C param
    * (default 4:2:0 per spec). Returns None on anything malformed —
    * missing dims, no newline, unknown colorspace. */
  private[multimodal] def parseY4mHeader(bytes: Array[Byte]): Option[Y4mHeader] =
    try {
      if (!looksLikeY4m(bytes)) return None
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) return None
      val params = new String(bytes, 0, nl, "US-ASCII").split(' ').drop(1)
      def num(tag: Char): Option[Int] = params
        .find(p => p.nonEmpty && p.head == tag && p.tail.forall(_.isDigit))
        .map(_.tail.toInt).filter(_ > 0)
      val cs = params.find(p => p.nonEmpty && p.head == 'C')
        .map(_.tail).getOrElse("420")
      for {
        w <- num('W'); h <- num('H')
        // hostile-header guard: w·h beyond 2^26 px would overflow the Int
        // frame size (and no sane payload carries it) — treat as corrupt
        if w.toLong * h <= (1 << 26)
        chroma <- chromaBytes(cs, w, h)
      } yield Y4mHeader(w, h, w * h + chroma, nl + 1)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Bytes of U+V planes per frame for a Y4M colorspace tag. */
  private def chromaBytes(cs: String, w: Int, h: Int): Option[Int] =
    if (cs.startsWith("420")) Some(2 * ((w / 2) * (h / 2)))
    else if (cs.startsWith("422")) Some(2 * ((w / 2) * h))
    else if (cs.startsWith("444")) Some(2 * (w * h))
    else if (cs.startsWith("mono")) Some(0)
    else None

  /** Iterate a Y4M payload's frames as (frame_no, offset-of-Y-plane).
    * Each frame is a `FRAME[ params]\n` marker followed by the planar
    * data; iteration stops cleanly at the first truncated/malformed
    * frame so corrupt tails degrade to fewer frames, never a throw. */
  private[multimodal] def y4mFrameOffsets(bytes: Array[Byte], hdr: Y4mHeader)
      : Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
    private val marker = "FRAME".getBytes("US-ASCII")
    private var off = hdr.firstFrameOff
    private var no = 0
    private var nextOff = advance()
    private def advance(): Int = {
      if (off + marker.length > bytes.length ||
        !marker.indices.forall(i => bytes(off + i) == marker(i))) return -1
      var p = off + marker.length
      while (p < bytes.length && bytes(p) != '\n'.toByte) p += 1
      if (p >= bytes.length || p + 1 + hdr.frameBytes > bytes.length) -1
      else p + 1
    }
    def hasNext: Boolean = nextOff >= 0
    def next(): (Int, Int) = {
      val r = (no, nextOff)
      no += 1; off = nextOff + hdr.frameBytes; nextOff = advance()
      r
    }
  }

  /** REAL video decode — pure-JDK YUV4MPEG2 parse: stream header + frame-0
    * luminance (Y) plane → the same g×g mean-luma grid the image path
    * emits (Y normalized /255, so image and video features share a scale).
    * Compressed codecs have no JDK decoder; callers fall back to the hash
    * stub for those, keeping corrupt payloads task-safe. */
  def decodeVideoLuma(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      parseY4mHeader(bytes).flatMap(videoLumaFromHeader(bytes, _, dim))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The post-parse half of [[decodeVideoLuma]] (see
    * [[audioFeaturesFromPcm]] for why it is factored out): frame-0 Y
    * plane of an already-parsed header -> the shared luma grid. */
  private[multimodal] def videoLumaFromHeader(bytes: Array[Byte],
      hdr: Y4mHeader, dim: Int): Option[Array[Float]] =
    y4mFrameOffsets(bytes, hdr).buffered.headOption.map { case (_, yOff) =>
      lumaGrid(hdr.w, hdr.h, dim,
        (x, y) => (bytes(yOff + y * hdr.w + x) & 0xff) / 255.0)
    }

  /** Video fingerprint — the [[dHashImages]] analog for the first TWO
    * frames of a Y4M stream: each frame's luma folds into a 4×4 grid of
    * INTEGER cell sums (cell mapping as [[lumaGrid]]; comparisons
    * cross-multiplied by cell pixel counts so unequal cells stay exact —
    * no float anywhere), yielding 24 adjacent-comparison bits per frame,
    * frame f's bits shifted by 24·f (48 bits total). Temporal structure is
    * captured because both frames hash independently — a reordered or
    * frozen clip lands at a different Hamming distance. Null for
    * non-video / undecodable payloads. */
  /** The 48-bit two-frame fingerprint fold — [[videoTemporalHash]]'s
    * per-row kernel over an already-parsed header, factored out for the
    * decode-once index ([[indexRow]]). None when the stream carries no
    * complete frame. */
  private[multimodal] def videoHashBits(bytes: Array[Byte],
                                        hdr: Y4mHeader): Option[Long] = {
    val frames = y4mFrameOffsets(bytes, hdr).take(2).toSeq
    if (frames.isEmpty) None
    else {
      var bits = 0L
      frames.foreach { case (fno, yOff) =>
        val base = 24 * fno.toInt
        val sums = new Array[Long](16)
        val cnts = new Array[Long](16)
        var y = 0
        while (y < hdr.h) {
          val cy = math.min(3, y * 4 / hdr.h)
          var x = 0
          while (x < hdr.w) {
            val cell = cy * 4 + math.min(3, x * 4 / hdr.w)
            sums(cell) += bytes(yOff + y * hdr.w + x) & 0xff
            cnts(cell) += 1
            x += 1
          }
          y += 1
        }
        // mean(i) < mean(j) as cross-multiplied integers
        def lt(i: Int, j: Int): Boolean =
          sums(i) * cnts(j) < sums(j) * cnts(i)
        var rr = 0
        while (rr < 4) {
          var c = 0
          while (c < 3) {
            if (lt(rr * 4 + c, rr * 4 + c + 1))
              bits |= 1L << (base + rr * 3 + c)
            c += 1
          }
          rr += 1
        }
        var pos = 0
        while (pos < 12) {
          if (lt(pos, pos + 4)) bits |= 1L << (base + 12 + pos)
          pos += 1
        }
      }
      Some(bits)
    }
  }

  def videoTemporalHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("vhash", LongType, nullable = true)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    val mIdx = assets.schema.fieldIndex("modality")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        val hash: java.lang.Long =
          if (bytes == null || r.getAs[String](mIdx) != "video") null
          else parseY4mHeader(bytes) match {
            case Some(hdr) => videoHashBits(bytes, hdr)
              .map(java.lang.Long.valueOf).orNull
            case None => null
          }
        Row(r.getLong(idIdx), hash)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Deterministic stand-in for the compressed-codec video path (no codec
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
    * ([[decodeAudioFeatures]]); video payloads in the uncompressed
    * YUV4MPEG2 container through the REAL pure-JDK frame parser
    * ([[decodeVideoLuma]]); compressed video (and any undecodable payload)
    * uses the documented hash stub. */
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
          else if (r.getAs[String](mIdx) == "video" && looksLikeY4m(bytes))
            decodeVideoLuma(bytes, dim).getOrElse(fakeDecode(bytes, dim)).toSeq
          else fakeDecode(bytes, dim).toSeq
        Row(r.getLong(idIdx), feats)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** ONE-DECODE row kernel — the amortization primitive behind
    * [[MediaIndex]]: decodes the payload AT MOST ONCE for its modality and
    * derives every downstream artifact from that single decode —
    * (dhash, ahash, vhash, features). Each output is bit-identical to its
    * standalone producer ([[dHashImages]] / [[audioEnergyHash]] /
    * [[videoTemporalHash]] / [[extractFeatures]]) because all four call
    * the same factored kernels; MediaIndexSpec pins the equality
    * column-for-column. `dim` = the feature dimensionality; at dim 16 the
    * image path shares one luma-grid decode between dhash and features
    * (other dims pay a second grid decode for the image features only —
    * audio and video always share).
    *
    * This is the kernel the standalone per-query decodes were costing:
    * at the 100x record the media family re-decoded the same assets once
    * per query (~260 s of the sf10 wall); with the index they decode once
    * per corpus generation. */
  private[multimodal] def indexRow(modality: String, bytes: Array[Byte],
      dim: Int): (java.lang.Long, java.lang.Long, java.lang.Long, Seq[Float]) = {
    if (bytes == null) return (null, null, null, null)
    modality match {
      case "image" =>
        val grid16 = decodeImageLuma(bytes, 16)
        val dhash = grid16 match {
          case Some(g) => java.lang.Long.valueOf(dHashBitsOfGrid(g))
          case None    => null
        }
        val featGrid = if (dim == 16) grid16 else decodeImageLuma(bytes, dim)
        (dhash, null, null,
          featGrid.getOrElse(fakeDecode(bytes, dim)).toSeq)
      case "audio" =>
        val pcm = decodePcm16(bytes) // the expensive call — exactly once
        val ahash = pcm.flatMap { case (d, c) => frameIntsFromPcm(d, c) }
          .map(x => java.lang.Long.valueOf(audioHashBits(x))).orNull
        val feats =
          if (looksLikeAudio(bytes))
            pcm.flatMap { case (d, c) => audioFeaturesFromPcm(d, c, dim) }
              .getOrElse(fakeDecode(bytes, dim))
          else fakeDecode(bytes, dim)
        (null, ahash, null, feats.toSeq)
      case "video" =>
        val hdr = try parseY4mHeader(bytes) catch {
          case scala.util.control.NonFatal(_) => None
        }
        val vhash = try {
          hdr.flatMap(videoHashBits(bytes, _))
            .map(java.lang.Long.valueOf).orNull
        } catch { case scala.util.control.NonFatal(_) => null }
        val feats =
          if (looksLikeY4m(bytes))
            (try hdr.flatMap(videoLumaFromHeader(bytes, _, dim)) catch {
              case scala.util.control.NonFatal(_) => None
            }).getOrElse(fakeDecode(bytes, dim))
          else fakeDecode(bytes, dim)
        (null, null, vhash, feats.toSeq)
      case _ => (null, null, null, fakeDecode(bytes, dim).toSeq)
    }
  }

  /** Perceptual difference hash (dHash) over the decoded 4×4 luminance
    * grid — the image-dedup primitive: bits 0–11 compare horizontally
    * adjacent cells (`g[r][c] < g[r][c+1]`), bits 12–23 vertically
    * (`g[r][c] < g[r+1][c]`), so near-identical images land within a small
    * Hamming distance and EXACT duplicates collide outright. Works on any
    * ImageIO-decodable payload (the grid is the box-filtered 4×4 luma, so
    * resolution doesn't matter); non-image and undecodable payloads get a
    * null hash rather than a stub — a perceptual hash of garbage would
    * poison the dedup buckets downstream.
    *
    * Per-row mapPartitions, zero shuffle; pair generation over the hashes
    * is a banded equi-join (see q_phash_pairs), never all-pairs. */
  /** The 24-bit dHash fold over a 16-cell luma grid — the per-row kernel
    * shared by [[dHashImages]], [[jpegParity]] and the decode-once index
    * ([[indexRow]]): bits 0-11 horizontal comparisons, 12-23 vertical. */
  private[multimodal] def dHashBitsOfGrid(g: Array[Float]): Long = {
    var bits = 0L
    var k = 0
    var row = 0
    while (row < 4) {
      var c = 0
      while (c < 3) {
        if (g(row * 4 + c) < g(row * 4 + c + 1)) bits |= 1L << k
        k += 1; c += 1
      }
      row += 1
    }
    row = 0
    while (row < 3) {
      var c = 0
      while (c < 4) {
        if (g(row * 4 + c) < g((row + 1) * 4 + c)) bits |= 1L << k
        k += 1; c += 1
      }
      row += 1
    }
    bits
  }

  def dHashImages(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    val mIdx = assets.schema.fieldIndex("modality")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        val hash: java.lang.Long =
          if (bytes == null || r.getAs[String](mIdx) != "image") null
          else decodeImageLuma(bytes, 16) match {
            case Some(g) => java.lang.Long.valueOf(dHashBitsOfGrid(g))
            case None    => null
          }
        Row(r.getLong(idIdx), hash)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image resize for ImageIO-decodable payloads: deterministic
    * box-filter downsample/upsample (per-channel integer sums, truncating
    * division — no platform-dependent interpolation) re-encoded as PNG
    * (lossless, so the resized pixels round-trip exactly). Payloads that
    * don't decode keep the previous deterministic byte-rewrite fallback so
    * non-image corpora stay stable. Meta reflects the new dims either way.
    * Per-row mapPartitions, zero shuffle. */
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
          else boxResizePng(bytes, w, h).getOrElse(
            Array.tabulate[Byte](math.min(outSize, bytes.length))(
              i => bytes(i % bytes.length)))
        val old = r.getAs[Row](midx)
        val meta = Row(w, h,
          if (old == null) null else old.get(2),
          if (old == null) null else old.get(3))
        Row.fromSeq(r.toSeq.updated(idx, resized).updated(midx, meta))
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Decode → box-filter resample to w×h → PNG bytes; None when the
    * payload is not a decodable image. Each target pixel is the truncating
    * integer mean of its source block per RGB channel (blocks from the
    * same integer grid mapping [[lumaGrid]] uses), so the result is
    * bit-identical on any JVM. */
  private[multimodal] def boxResizePng(bytes: Array[Byte], w: Int, h: Int)
      : Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (sw, sh) = (img.getWidth, img.getHeight)
        val rs = new Array[Long](w * h); val gs = new Array[Long](w * h)
        val bs = new Array[Long](w * h); val ns = new Array[Long](w * h)
        var y = 0
        while (y < sh) {
          val cy = math.min(h - 1, y * h / sh)
          var x = 0
          while (x < sw) {
            val cell = cy * w + math.min(w - 1, x * w / sw)
            val rgb = img.getRGB(x, y)
            rs(cell) += (rgb >> 16) & 0xff; gs(cell) += (rgb >> 8) & 0xff
            bs(cell) += rgb & 0xff; ns(cell) += 1
            x += 1
          }
          y += 1
        }
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var cell = 0
        while (cell < w * h) {
          // upsampling can leave empty cells: borrow the nearest source
          // pixel by inverse-mapping the cell center
          if (ns(cell) == 0) {
            val (cx, cyy) = (cell % w, cell / w)
            val rgb = img.getRGB(
              math.min(sw - 1, cx * sw / w), math.min(sh - 1, cyy * sh / h))
            rs(cell) = (rgb >> 16) & 0xff; gs(cell) = (rgb >> 8) & 0xff
            bs(cell) = rgb & 0xff; ns(cell) = 1
          }
          val v = (((rs(cell) / ns(cell)) << 16) |
            ((gs(cell) / ns(cell)) << 8) | (bs(cell) / ns(cell))).toInt
          out.setRGB(cell % w, cell / w, v)
          cell += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling for video payloads: every `stride`-th frame becomes a
    * row (asset_id, frame_no, frame binary). YUV4MPEG2 payloads yield REAL
    * container frames — `frame_no` is the stream's frame index and `frame`
    * the raw planar YUV bytes, decodable by [[decodeVideoLuma]]'s plane
    * math. Payloads without a parseable container fall back to fixed 1KiB
    * slices so the plumbing still exercises end-to-end. Per-row flatMap,
    * zero shuffle; only sampled frames materialize downstream. */
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
        else parseY4mHeader(bytes) match {
          case Some(hdr) =>
            y4mFrameOffsets(bytes, hdr)
              .filter { case (no, _) => no % stride == 0 }
              .map { case (no, off) =>
                Row(r.getLong(idIdx), no,
                  java.util.Arrays.copyOfRange(bytes, off, off + hdr.frameBytes))
              }
          case None =>
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

  // ---- real container-metadata probing (headers only, no codecs) ----

  /** Typed metadata parsed from payload BYTES (format sniff + header walk)
    * rather than trusted from caller columns — the "typed metadata" half
    * of the multimodal contract made real. Pure-JDK header parsing:
    *
    *  - PNG: IHDR width/height (big-endian at offsets 16/20)
    *  - GIF: logical-screen width/height (little-endian at 6/8)
    *  - WAV: RIFF chunk walk — `fmt ` sample rate + byte rate, `data`
    *    size → duration
    *  - Y4M: stream header dims + frame count × frame rate → duration
    *  - MP4/ISO-BMFF: box walk — `moov/mvhd` timescale+duration (v0/v1),
    *    `moov/trak/tkhd` 16.16-fixed width/height. Metadata needs no
    *    codec, so this works on real compressed videos even though frame
    *    DECODE for them stays behind the documented stub.
    *
    * Returns nulls for fields a format doesn't carry and format "unknown"
    * (all-null fields) for unparseable payloads — never throws. */
  def probeMeta(bytes: Array[Byte])
      : (String, Option[Int], Option[Int], Option[Int], Option[Long]) =
    try {
      def be32(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def ascii(o: Int, n: Int) = new String(bytes, o, n, "US-ASCII")
      if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 && ascii(1, 3) == "PNG")
        ("png", Some(be32(16)), Some(be32(20)), None, None)
      else if (bytes.length >= 10 && ascii(0, 4) == "GIF8")
        ("gif", Some(le16(6)), Some(le16(8)), None, None)
      else if (bytes.length >= 44 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
        var (o, rate, byteRate, dataLen) = (12, 0, 0, -1L)
        var halt = false
        while (!halt && o + 8 <= bytes.length && (rate == 0 || dataLen < 0)) {
          val (id, sz) = (ascii(o, 4), le32(o + 4))
          // le32(o+16) reads through o+19 — guard the full read, else a
          // payload truncated inside the fmt chunk AIOOBEs to "unknown"
          if (id == "fmt " && o + 20 <= bytes.length) {
            rate = le32(o + 12); byteRate = le32(o + 16)
          } else if (id == "data") dataLen = sz.toLong
          // hostile-size guard: a chunk size over 2^31 reads back as a
          // negative Int and would walk o backwards — forever
          if (sz < 0) halt = true else o += 8 + sz + (sz & 1) // 2-byte aligned
        }
        ("wav", None, None, Some(rate).filter(_ > 0),
          if (dataLen >= 0 && byteRate > 0) Some(dataLen * 1000 / byteRate) else None)
      } else if (looksLikeY4m(bytes))
        parseY4mHeader(bytes) match {
          case Some(hdr) =>
            val nl = bytes.indexOf('\n'.toByte)
            val fps = new String(bytes, 0, nl, "US-ASCII").split(' ')
              .find(p => p.startsWith("F") && p.contains(':')).map(_.tail.split(':'))
              .collect { case Array(n, d) if d.toLong > 0 => (n.toLong, d.toLong) }
            val frames = y4mFrameOffsets(bytes, hdr).size
            ("y4m", Some(hdr.w), Some(hdr.h), None,
              fps.map { case (n, d) => frames * 1000L * d / n })
          case None => ("unknown", None, None, None, None)
        }
      else if (bytes.length >= 12 && ascii(4, 4) == "ftyp") {
        // ISO-BMFF box walk; returns at the first moov carrying mvhd/tkhd
        var (w, h): (Option[Int], Option[Int]) = (None, None)
        var dur: Option[Long] = None
        def walk(from: Int, to: Int, depth: Int): Unit = {
          var o = from
          while (o + 8 <= to && depth < 6) {
            val sz = be32(o); val id = ascii(o + 4, 4)
            if (sz < 8 || o + sz > to) return
            if (id == "moov" || id == "trak") walk(o + 8, o + sz, depth + 1)
            else if (id == "mvhd" && sz >= 20) {
              val v = bytes(o + 8) & 0xff
              // v1 duration's low word sits at box-relative offset 36..39 —
              // require the box to actually contain it, else a malformed
              // v1 mvhd would silently read the sibling box's bytes
              if (v == 1 && sz >= 40) {
                val ts = be32(o + 8 + 4 + 16)
                val d = (be32(o + 8 + 4 + 20).toLong << 32) |
                  (be32(o + 8 + 4 + 24).toLong & 0xffffffffL)
                if (ts > 0) dur = Some(d * 1000 / ts)
              } else if (sz >= 28) {
                val ts = be32(o + 8 + 4 + 8)
                val d = be32(o + 8 + 4 + 12).toLong & 0xffffffffL
                if (ts > 0) dur = Some(d * 1000 / ts)
              }
            } else if (id == "tkhd" && sz >= 92) {
              // after version/flags: v0 fields 20 B (v1: 32), reserved/
              // layer/group/volume 16 B, matrix 36 B, then 16.16 w/h
              val v = bytes(o + 8) & 0xff
              val base = if (v == 1) o + 8 + 4 + 32 + 16 + 36 else o + 8 + 4 + 20 + 16 + 36
              if (base + 8 <= o + sz) {
                val tw = be32(base) >>> 16; val th = be32(base + 4) >>> 16
                if (tw > 0 && th > 0) { w = Some(tw); h = Some(th) }
              }
            }
            o += sz
          }
        }
        walk(0, bytes.length, 0)
        ("mp4", w, h, None, dur)
      } else ("unknown", None, None, None, None)
    } catch {
      case scala.util.control.NonFatal(_) => ("unknown", None, None, None, None)
    }

  /** Probed-metadata table: (asset_id, format, width, height, sample_rate,
    * duration_ms) parsed from the binary payloads. Per-row mapPartitions,
    * zero shuffle; the binary never leaves the executor. */
  def probeAssets(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        val (f, w, h, sr, d) =
          if (bytes == null) ("unknown", None, None, None, None)
          else probeMeta(bytes)
        Row(r.getLong(idIdx), f,
          w.map(Integer.valueOf).orNull, h.map(Integer.valueOf).orNull,
          sr.map(Integer.valueOf).orNull,
          d.map(java.lang.Long.valueOf).orNull)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---- real-container synthetic media (the oracle-checkable fixtures) ----
  //
  // Each generator writes a REAL container whose pixel/sample values come
  // from a pure integer formula of (id, position) — so the end-to-end path
  // payload bytes → real JDK decode → feature math is replayable in ANSI
  // SQL from the same formula, and the whole decode pipeline gets a hard
  // cross-engine oracle (q_mm_features_real). Formula values are chosen so
  // every float op is exact or IEEE-identical cross-engine: luma terms are
  // per-pixel (one pixel per grid cell at 4×4/dim 16 — no summation-order
  // dependence), audio RMS sums dyadic rationals x²/2³⁰ whose partial sums
  // stay exact, ZCR is integer-counted.

  /** Gray value of pixel `pos` (row-major) for image asset `id`. */
  def imagePixel(id: Long, pos: Int): Int = ((id * 131 + pos * 17) % 256).toInt
  /** 16-bit PCM sample `i` for audio asset `id` — in [−10000, 10000]. */
  def audioSample(id: Long, i: Int): Int = (((id * 7919 + i * 104729L) % 20001) - 10000).toInt
  /** Luminance of pixel `pos` in frame `f` for video asset `id`. */
  def videoLumaPx(id: Long, pos: Int, f: Int): Int = ((id * 37 + pos * 13 + f) % 256).toInt

  /** Real PNG: w×h gray image, pixel values from [[imagePixel]]. PNG is
    * lossless, so decode returns the exact formula values. */
  def pngGray(id: Long, w: Int = 4, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var pos = 0
    while (pos < w * h) {
      val v = imagePixel(id, pos)
      img.setRGB(pos % w, pos / w, (v << 16) | (v << 8) | v)
      pos += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real JPEG: the same gray image as [[pngGray]], encoded through the
    * JDK's baseline-JPEG writer at an explicit quality factor. LOSSY —
    * decode returns formula values ± quantization error, so JPEG assets
    * are certified against their lossless PNG twin ([[jpegParity]])
    * rather than replayed exactly. */
  def jpegGray(id: Long, w: Int = 4, h: Int = 4, quality: Float = 0.95f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var pos = 0
    while (pos < w * h) {
      val v = imagePixel(id, pos)
      img.setRGB(pos % w, pos / w, (v << 16) | (v << 8) | v)
      pos += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Cross-codec certification of the REAL JPEG decode path — the lossy
    * counterpart of the q_mm_features_real hard oracle. For every
    * image-routed id, the SAME formula image is encoded twice (lossless
    * PNG via [[pngGray]], lossy JPEG via [[jpegGray]]) and both payloads
    * run through the REAL `javax.imageio` decoder (the JPEG side
    * exercises the full Huffman + dequant + IDCT + YCbCr→RGB path). Emits
    * per asset:
    *
    *  - `dhash`    — the PNG-side 24-bit dHash, EXACT (the DuckDB oracle
    *                 replays the pixel formula, as in q_phash)
    *  - `jpeg_decoded` — 1 iff ImageIO decoded the JPEG payload
    *  - `dev_ok`   — 1 iff max |luma_png − luma_jpeg| ≤ `maxDev` over the
    *                 4×4 grid (measured max 0.0275 at quality 0.95 across
    *                 50k formula images; default bound 0.06 = 2× headroom)
    *  - `hamming_ok` — 1 iff Hamming(dhash_png, dhash_jpeg) ≤ `maxHam`
    *                 (measured max 0 — formula neighbors differ by ≥17
    *                 gray levels, far above quantization error; bound 4)
    *
    * The oracle states the flags as literal 1 — a JDK whose JPEG pipeline
    * drifts past the bound fails the round's hash compare like any wrong
    * answer. Per-row mapPartitions, zero shuffle, payloads never leave
    * the executor. */
  def jpegParity(src: DataFrame, idCol: String,
      maxDev: Double = 0.06, maxHam: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true),
      StructField("jpeg_decoded", LongType, nullable = false),
      StructField("dev_ok", LongType, nullable = false),
      StructField("hamming_ok", LongType, nullable = false)))
    src.select(col(idCol).cast("long").as("asset_id"))
      .filter(pmod(col("asset_id"), lit(3)) === 0)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val png = decodeImageLuma(pngGray(id), 16)
          val jpg = decodeImageLuma(jpegGray(id), 16)
          (png, jpg) match {
            case (Some(gp), Some(gj)) =>
              var dev = 0.0
              var i = 0
              while (i < 16) {
                dev = math.max(dev, math.abs(gp(i).toDouble - gj(i).toDouble))
                i += 1
              }
              val ham = java.lang.Long.bitCount(dHashBitsOfGrid(gp) ^ dHashBitsOfGrid(gj))
              Row(id, java.lang.Long.valueOf(dHashBitsOfGrid(gp)), 1L,
                if (dev <= maxDev) 1L else 0L,
                if (ham <= maxHam) 1L else 0L)
            case (Some(gp), None) => Row(id, java.lang.Long.valueOf(dHashBitsOfGrid(gp)), 0L, 0L, 0L)
            case _ => Row(id, null, 0L, 0L, 0L)
          }
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  /** Real WAV: canonical 44-byte RIFF header + `n` little-endian 16-bit
    * mono PCM samples from [[audioSample]]. */
  def wavPcm(id: Long, n: Int = 256, rate: Int = 8000): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { out.putShort(audioSample(id, i).toShort); i += 1 }
    out.array()
  }

  /** Deterministic ADPCM-friendly signal: a bounded random walk (steps
    * ±64 from an id-seeded start) — the smooth, speech-like waveform the
    * codec is designed for, unlike [[audioSample]]'s white-noise jumps
    * which no 4-bit delta codec can track. s(0) is a closed-form integer
    * expression of the id (the oracle's replay surface); later samples
    * are cumulative (Scala-side only). */
  def adpcmSamples(id: Long, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    out(0) = (((id * 7919) % 4001) - 2000).toInt
    var i = 1
    while (i < n) {
      val d = (((id * 31 + i * 17L) % 129) - 64).toInt
      out(i) = math.max(-32767, math.min(32767, out(i - 1) + d))
      i += 1
    }
    out
  }

  /** Real compressed WAV: format tag 0x11 (IMA ADPCM), mono, one block of
    * `n` samples from [[adpcmSamples]] — fmt chunk with cbSize=2 +
    * samplesPerBlock, a `fact` chunk (required for compressed WAV), and
    * the 4-byte-header block from [[encodeImaAdpcmBlock]]. The JDK cannot
    * decode this tag; only the in-JVM [[decodeImaAdpcmWav]] branch can. */
  def wavAdpcm(id: Long, n: Int = 249, rate: Int = 8000): Array[Byte] = {
    // both samplesPerBlock and blockAlign are uint16 header fields; a
    // larger n would silently wrap through toShort into a corrupt header
    require(n >= 1 && n <= 0x7fff, s"n must be in 1..32767 (got $n)")
    val block = encodeImaAdpcmBlock(adpcmSamples(id, n))
    val ba = block.length
    val out = java.nio.ByteBuffer.allocate(12 + 28 + 12 + 8 + ba)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 12 + 8 + ba)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(rate)
      .putInt(math.max(1, rate * ba / n)).putShort(ba.toShort).putShort(4)
      .putShort(2).putShort(n.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
      .put("data".getBytes("US-ASCII")).putInt(ba)
      .put(block)
    out.array()
  }

  /** Lossy-codec certification for compressed audio — the [[jpegParity]]
    * pattern, tag 0x11 instead of JPEG: the SAME deterministic signal
    * encoded through [[encodeImaAdpcmBlock]] and decoded through the
    * REAL production path ([[decodePcm16]] — which must take the ADPCM
    * branch, since the JDK throws on the tag), then certified against
    * the exact source samples. `first_sample` is a hard cross-engine
    * value (the header stores sample 0 verbatim and the oracle replays
    * its closed form); `first_exact`/`dev_ok`/`n_ok` are bound flags the
    * oracle states as literal 1 (measured max |decoded − source| on the
    * walk fixture: 70 across 8,000 diverse ids; bound 140 carries 2×
    * headroom — the codec's quantization residual, NOT drift: the
    * encoder tracks the decoder state exactly). */
  def adpcmParity(src: DataFrame, idCol: String, n: Int = 249,
                  maxDev: Int = 140): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("first_sample", LongType, nullable = true),
      StructField("decoded", LongType, nullable = false),
      StructField("n_ok", LongType, nullable = false),
      StructField("first_exact", LongType, nullable = false),
      StructField("dev_ok", LongType, nullable = false)))
    src.select(col(idCol).cast("long").as("asset_id"))
      .filter(pmod(col("asset_id"), lit(3)) === 1)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val exact = adpcmSamples(id, n)
          decodePcm16(wavAdpcm(id, n)) match {
            case Some((data, 1)) =>
              val m = data.length / 2
              var dev = 0
              var i = 0
              while (i < math.min(m, n)) {
                val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
                dev = math.max(dev, math.abs(s - exact(i)))
                i += 1
              }
              val first = ((data(1) << 8) | (data(0) & 0xff)).toShort.toLong
              Row(id, java.lang.Long.valueOf(first), 1L,
                if (m == n) 1L else 0L,
                if (first == exact(0).toLong) 1L else 0L,
                if (dev <= maxDev) 1L else 0L)
            case _ => Row(id, null, 0L, 0L, 0L, 0L)
          }
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  /** Real YUV4MPEG2: w×h 4:2:0 stream of `frames` frames; Y plane from
    * [[videoLumaPx]] (frame index shifts the formula so frame-0 selection
    * is observable), chroma planes neutral 128. */
  def y4mGray(id: Long, w: Int = 4, h: Int = 4, frames: Int = 2): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    val chroma = Array.fill[Byte](2 * ((w / 2) * (h / 2)))(128.toByte)
    var f = 0
    while (f < frames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var pos = 0
      while (pos < w * h) { bos.write(videoLumaPx(id, pos, f)); pos += 1 }
      bos.write(chroma)
      f += 1
    }
    bos.toByteArray
  }

  /** Asset table with REAL container payloads (PNG / WAV / Y4M by
    * `id % 3`, same routing as [[syntheticAssets]]) — the fixture feed for
    * the hard-oracle feature query. Per-row generation in mapPartitions,
    * zero shuffle; payload bytes never leave the executor. */
  def mediaAssets(src: DataFrame, idCol: String): DataFrame = {
    val ids = src.select(col(idCol).cast("long").as("asset_id"))
    val idIdx = 0
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val (modality, content) = (id % 3) match {
          case 0 => ("image", pngGray(id))
          case 1 => ("audio", wavPcm(id))
          case _ => ("video", y4mGray(id))
        }
        val meta = modality match {
          case "image" => Row(4, 4, null, null)
          case "audio" => Row(null, null, 8000, 32L) // 256 samples @ 8 kHz
          case _       => Row(4, 4, null, 80L)       // 2 frames @ 25 fps
        }
        Row(id, modality, content, meta)
      }
    }(RowEncoder.encoderFor(assetSchema))
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
