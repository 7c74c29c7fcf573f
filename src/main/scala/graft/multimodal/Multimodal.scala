package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing as batched `mapPartitions` transforms.
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * environment — see `fakeDecode`, which is a deterministic hash-based
  * feature extractor standing in for a real decoder). Everything around it —
  * schema, batching, partitioning, encoders — is real: swap `fakeDecode`
  * for a JNI/javacv call and the pipeline is production-shaped.
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

  /** Deterministic stand-in for a real decoder: folds the payload bytes into
    * `dim` float features with a rolling 64-bit hash. Replace with a real
    * codec at the `???`-equivalent seam. */
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

  /** Feature extraction: (asset_id, features array<float>) via batched
    * mapPartitions — the decode seam. */
  def extractFeatures(assets: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        Row(r.getLong(idIdx),
          if (bytes == null) null else fakeDecode(bytes, dim).toSeq)
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
