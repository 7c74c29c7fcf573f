package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression document-quality classifier — the
  * linear (fasttext-style) scorer every large-corpus curation pipeline
  * keeps next to its rule-based filters. The reference pipeline has no
  * trainable quality model; this is the pipeline-general extension,
  * built with the same iterative-ML shape as the LSTM trainer (M2), the
  * k-means quantizer, and the BPE trainer: per round ONE distributed
  * aggregate against broadcast parameters, d+1 doubles of driver
  * traffic, nothing corpus-sized ever collected.
  *
  * Split of concerns mirroring S8/S9 (scaler/model persistence):
  * training is spec-covered surface (float tree-reduction order makes
  * bit-exact cross-engine replay meaningless), while APPLY — a frozen
  * checkpoint's weights as literals over exact integer count features —
  * is the oracle-checked surface ([[scoreCol]], `q_quality_logit`).
  */
object Logit {

  case class Model(features: Seq[String], weights: Array[Double],
                   bias: Double, lossHistory: Seq[Double])

  /** Full-batch gradient descent: each iteration is one `treeAggregate`
    * over the persisted (x, y) RDD computing (Xᵀ(σ(Xw+b)−y), Σ(p−y),
    * Σ log-loss) with the current weights broadcast. Gradients are
    * averaged on the driver (exactly `d+1` doubles per round) and
    * stepped with plain GD + optional L2. The input is materialized ONCE
    * (MEMORY_AND_DISK) and unpersisted on exit — the iterative-trainer
    * persist/handoff rule. Log-loss is clamped at 1e-12 so saturated
    * predictions stay finite. */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
            iters: Int = 100, lr: Double = 0.5, l2: Double = 0.0): Model = {
    val d = featureCols.size
    require(d > 0, "logit train: no feature columns")
    val data = df.select(
        (featureCols.map(c => col(c).cast("double")) :+
          col(labelCol).cast("double")): _*)
      .rdd.map { r =>
        val x = new Array[Double](d)
        var i = 0; while (i < d) { x(i) = r.getDouble(i); i += 1 }
        (x, r.getDouble(d))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = data.count().toDouble
    require(n > 0, "logit train: empty input")
    val sc = df.sparkSession.sparkContext
    val w = new Array[Double](d)
    var b = 0.0
    val hist = scala.collection.mutable.ArrayBuffer[Double]()
    var it = 0
    while (it < iters) {
      val bc = sc.broadcast((w.clone(), b))
      val (gw, gb, lossSum) =
        data.treeAggregate((new Array[Double](d), 0.0, 0.0))(
          seqOp = { case ((aw, ab, al), (x, y)) =>
            val (wv, bv) = bc.value
            var z = bv
            var i = 0
            while (i < d) { z += wv(i) * x(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-z))
            val g = p - y
            i = 0
            while (i < d) { aw(i) += g * x(i); i += 1 }
            val eps = 1e-12
            (aw, ab + g,
              al - (y * math.log(math.max(p, eps)) +
                (1.0 - y) * math.log(math.max(1.0 - p, eps))))
          },
          combOp = { case ((w1, b1, l1), (w2, b2, l2)) =>
            var i = 0; while (i < d) { w1(i) += w2(i); i += 1 }
            (w1, b1 + b2, l1 + l2)
          }, depth = 2)
      bc.destroy()
      var i = 0
      while (i < d) { w(i) -= lr * (gw(i) / n + l2 * w(i)); i += 1 }
      b -= lr * (gb / n)
      hist += lossSum / n
      it += 1
    }
    data.unpersist(false)
    Model(featureCols, w, b, hist.toSeq)
  }

  /** Linear score bias + Σ wᵢ·xᵢ folded LEFT TO RIGHT: with integer
    * features and dyadic-rational weights every product is exact and
    * every add is the identical correctly-rounded IEEE op as the
    * equivalent left-associated SQL expression — bitwise-equal
    * cross-engine with no rounding step. Apply σ (or a >0 threshold,
    * which is σ(z) > 0.5) downstream; keeping the score linear keeps it
    * exact. */
  def scoreCol(features: Seq[Column], weights: Seq[Double],
               bias: Double): Column = {
    require(features.size == weights.size,
      s"scoreCol: ${features.size} features vs ${weights.size} weights")
    weights.zip(features).foldLeft(lit(bias)) { case (acc, (wi, f)) =>
      acc + lit(wi) * f.cast("double")
    }
  }

  /** Operating-point sweep: confusion counts and precision/recall of the
    * thresholded score against a 0/1 truth column, one row per
    * threshold — the read that decides WHERE to cut a quality scorer
    * before a filtering run (e.g. "can the cheap linear model replace
    * the rule gate, and at which cutoff"). Precision/recall are null
    * when their denominator is zero (no predicted / no true positives)
    * rather than a sentinel, identically cross-engine.
    *
    * Scale shape: ONE scan of the scored frame cross-joined with the
    * broadcast k-row threshold frame, then a map-side-combinable
    * groupBy(threshold) of four conditional sums — candidates are
    * rows×k with k a literal handful, no corpus-keyed shuffle at all.
    * Score comparisons are exact when the score is ([[scoreCol]])'s
    * dyadic-exact linear form, so the curve replays bitwise in the
    * oracle. */
  def prCurve(scored: DataFrame, scoreCol: String, truthCol: String,
              thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = scored.sparkSession
    val tf = spark.createDataFrame(thresholds.map(Tuple1(_))).toDF("thr")
    val pred = (col(scoreCol) > col("thr")).cast("int")
    val truth = col(truthCol).cast("int")
    scored.crossJoin(broadcast(tf))
      .select(col("thr"), pred.as("_p"), truth.as("_t"))
      .groupBy("thr").agg(
        sum(when(col("_p") === 1 && col("_t") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("_p") === 1 && col("_t") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("_p") === 0 && col("_t") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("_p") === 0 && col("_t") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
          .as("recall"))
      .orderBy("thr")
  }

  // --- S8-style checkpoint persistence (JSON, self-format parser) ---

  def save(m: Model, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(m))

  def load(path: String): Model =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def toJson(m: Model): String = {
    // The self-format parser below splits arrays on commas and strips bare
    // quotes — a feature name containing either would round-trip corrupt.
    // Checkpoint names are column identifiers, so reject the unsafe chars
    // at WRITE time rather than emitting a file that silently mis-parses.
    m.features.foreach { f =>
      require(!f.exists(c => c == '"' || c == ',' || c == '[' || c == ']' ||
          c == '\\'),
        s"feature name not checkpoint-safe (quote/comma/bracket/backslash): $f")
    }
    val fs = m.features.map(f => "\"" + f + "\"").mkString(",")
    s"""{"features":[$fs],"weights":[${m.weights.mkString(",")}],""" +
      s""""bias":${m.bias},"loss":[${m.lossHistory.mkString(",")}]}"""
  }

  def fromJson(txt: String): Model = {
    def arr(key: String): String = {
      val i = txt.indexOf("\"" + key + "\":[")
      require(i >= 0, s"missing $key")
      val b = txt.indexOf('[', i) + 1
      txt.substring(b, txt.indexOf(']', b))
    }
    def nums(s: String): Array[Double] = {
      val t = s.trim
      if (t.isEmpty) Array.empty else t.split(",").map(_.trim.toDouble)
    }
    val feats = arr("features").split(",").map(_.trim.stripPrefix("\"")
      .stripSuffix("\"")).toSeq.filter(_.nonEmpty)
    val bi = txt.indexOf("\"bias\":")
    require(bi >= 0, "missing bias")
    val be = txt.indexWhere(c => c == ',' || c == '}', bi + 7)
    Model(feats, nums(arr("weights")),
      txt.substring(bi + 7, be).trim.toDouble, nums(arr("loss")).toSeq)
  }
}
