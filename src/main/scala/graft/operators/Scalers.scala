package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature scaling with the reference's sklearn semantics
  * (`/root/reference/preprocess_data.py:77-102`):
  *
  *  - MinMax: `(x − min) / (max − min)`, and a zero-range column maps to
  *    **0.0** (sklearn forces the denominator to 1 when max == min) — NOT
  *    0.5 as Spark MLlib's MinMaxScaler does, which is why this is
  *    hand-rolled rather than MLlib.
  *  - Standard: `(x − mean) / std` with **population** std (sklearn ddof=0);
  *    Spark's default `stddev` is the sample std, so `stddev_pop` is used.
  *    Zero-variance columns map to 0.0 (sklearn forces std 1... then
  *    centering yields 0.0).
  *
  * Fit is ONE map-side-combinable aggregate over the table (2k doubles to
  * the driver for k columns — no data shuffle); transform is a pure
  * projection with the params inlined as literals, so it stays inside
  * whole-stage codegen and costs nothing extra at 100 TB.
  *
  * Params persist as a small JSON file (S8, replacing the reference's
  * joblib pickle at `preprocess_data.py:96-98`).
  */
object Scalers {

  sealed trait Scaler {
    def cols: Seq[String]
    /** Apply frozen params (M5, `realtime_detector.py:236-237`). */
    def transform(df: DataFrame): DataFrame
    def inverse(df: DataFrame): DataFrame
    def toJson: String
  }

  final case class MinMaxScaler(cols: Seq[String], mins: Seq[Double],
                                maxs: Seq[Double]) extends Scaler {
    def transform(df: DataFrame): DataFrame =
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        val range = maxs(i) - mins(i)
        val denom = if (range == 0.0) 1.0 else range // sklearn zero-range rule
        d.withColumn(c, (col(c) - lit(mins(i))) / lit(denom))
      }
    def inverse(df: DataFrame): DataFrame =
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        val range = maxs(i) - mins(i)
        val denom = if (range == 0.0) 1.0 else range
        d.withColumn(c, col(c) * lit(denom) + lit(mins(i)))
      }
    def toJson: String = Scalers.paramsJson("minmax", cols,
      Map("min" -> mins, "max" -> maxs))
  }

  final case class StandardScaler(cols: Seq[String], means: Seq[Double],
                                  stds: Seq[Double]) extends Scaler {
    private def denom(i: Int) = if (stds(i) == 0.0) 1.0 else stds(i)
    def transform(df: DataFrame): DataFrame =
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        d.withColumn(c, (col(c) - lit(means(i))) / lit(denom(i)))
      }
    def inverse(df: DataFrame): DataFrame =
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        d.withColumn(c, col(c) * lit(denom(i)) + lit(means(i)))
      }
    def toJson: String = Scalers.paramsJson("standard", cols,
      Map("mean" -> means, "std" -> stds))
  }

  /** Null aggregate = all-null column or empty input; `getAs[Double]` would
    * silently unbox it to 0.0 and fit a dead scaler — fail loudly instead
    * (sklearn likewise raises on NaN input). */
  private def requireFit(row: org.apache.spark.sql.Row, field: String,
                         c: String): Double = {
    val i = row.fieldIndex(field)
    require(!row.isNullAt(i),
      s"scaler fit: column '$c' has no non-null values (empty input or all-null series)")
    row.getDouble(i)
  }

  /** A3: fit per-column min/max in one aggregate pass. */
  def fitMinMax(df: DataFrame, cols: Seq[String]): MinMaxScaler = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"min_$c"),
          max(col(c)).cast("double").as(s"max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    MinMaxScaler(cols,
      cols.map(c => requireFit(row, s"min_$c", c)),
      cols.map(c => requireFit(row, s"max_$c", c)))
  }

  /** A4: fit per-column mean/population-std in one aggregate pass. */
  def fitStandard(df: DataFrame, cols: Seq[String]): StandardScaler = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"mean_$c"), stddev_pop(col(c)).as(s"std_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    StandardScaler(cols,
      cols.map(c => requireFit(row, s"mean_$c", c)),
      cols.map(c => requireFit(row, s"std_$c", c)))
  }

  /** Strategy dispatch mirroring `preprocess_data.py:85-91`. */
  def fit(df: DataFrame, kind: String, cols: Seq[String]): Scaler =
    kind match {
      case "minmax"   => fitMinMax(df, cols)
      case "standard" => fitStandard(df, cols)
      case other => throw new IllegalArgumentException(
        s"unknown scaler type '$other' (expected minmax|standard)")
    }

  // --- S8 persistence (JSON instead of joblib pickle) ---

  private[operators] def paramsJson(kind: String, cols: Seq[String],
                                    params: Map[String, Seq[Double]]): String = {
    def jarr(xs: Seq[String]) = xs.mkString("[", ",", "]")
    def jnum(d: Double) =
      if (d.isNaN) "\"NaN\""
      else if (d.isInfinite) { if (d > 0) "\"Inf\"" else "\"-Inf\"" }
      else d.toString
    val colsJson = jarr(cols.map(c => "\"" + c + "\""))
    val ps = params.toSeq.sortBy(_._1).map { case (k, vs) =>
      "\"" + k + "\":" + jarr(vs.map(jnum))
    }.mkString(",")
    s"""{"kind":"$kind","cols":$colsJson,$ps}"""
  }

  def save(s: Scaler, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), s.toJson)

  def load(path: String): Scaler = {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    parseJson(txt)
  }

  private[operators] def parseJson(txt: String): Scaler = {
    // Minimal parser for our own flat schema (no external JSON dep needed).
    def arr(key: String): Seq[String] = {
      val i = txt.indexOf("\"" + key + "\":[")
      require(i >= 0, s"scaler json missing $key")
      val start = txt.indexOf('[', i) + 1
      val end = txt.indexOf(']', start)
      val body = txt.substring(start, end).trim
      if (body.isEmpty) Nil else body.split(",").toSeq.map(_.trim)
    }
    def nums(key: String): Seq[Double] = arr(key).map {
      case "\"NaN\"" => Double.NaN
      case "\"Inf\"" => Double.PositiveInfinity
      case "\"-Inf\"" => Double.NegativeInfinity
      case s => s.toDouble
    }
    val cols = arr("cols").map(_.stripPrefix("\"").stripSuffix("\""))
    if (txt.contains("\"kind\":\"minmax\""))
      MinMaxScaler(cols, nums("min"), nums("max"))
    else StandardScaler(cols, nums("mean"), nums("std"))
  }
}
