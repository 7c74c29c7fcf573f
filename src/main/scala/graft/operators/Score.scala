package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconstruction-error scoring — the reference's evaluation surface:
  *  - A6 per-window MSE `mean((X − X̂)²)` over a (L,F) window
  *    (`/root/reference/train_autoencoder.py:278`,
  *     `/root/reference/filter_anomalous_data.py:138`).
  *  - A7 equal-width error histogram, 50 bins
  *    (`/root/reference/train_autoencoder.py:281`).
  *  - A8 per-feature MSE (`/root/reference/realtime_detector.py:309-311`).
  *  - A9 normal/anomalous counts + ratios
  *    (`/root/reference/filter_anomalous_data.py:148-156`).
  *  - P8 threshold classify (`/root/reference/realtime_detector.py:322`).
  *
  * All are built-in aggregates / higher-order functions — codegen'd, map-side
  * combinable, no UDFs — so every path here scales linearly with input and
  * shuffles only grouped keys.
  */
object Score {

  /** A6 on array form: MSE between two ArrayType(ArrayType(Double)) windows
    * via HOFs — no explode, no shuffle; stays row-local. */
  def windowMse(x: Column, xhat: Column): Column = {
    val se = zip_with(x, xhat, (rowX, rowXhat) =>
      aggregate(zip_with(rowX, rowXhat, (a, b) => pow(a - b, lit(2))),
        lit(0.0), (acc, v) => acc + v))
    aggregate(se, lit(0.0), (acc, v) => acc + v) /
      (size(x) * size(element_at(x, 1)))
  }

  /** A6 on long (exploded) form: one row per (windowId, pos, feature). */
  def windowMseLong(df: DataFrame, windowIdCol: String, xCol: String,
                    xhatCol: String): DataFrame =
    df.groupBy(col(windowIdCol))
      .agg(avg(pow(col(xCol) - col(xhatCol), 2)).as("mse"))

  /** A8: per-feature MSE over the time axis. */
  def perFeatureMse(df: DataFrame, featureCol: String, xCol: String,
                    xhatCol: String): DataFrame =
    df.groupBy(col(featureCol))
      .agg(avg(pow(col(xCol) - col(xhatCol), 2)).as("feature_mse"))

  /** A7: 50-bin equal-width histogram bucket id (1-based) for `c` over
    * [lo, hi]. Matches matplotlib's right-inclusive last bin by clamping
    * the `c == hi` overflow bucket back to `bins`. Written as the explicit
    * `floor((c − lo) · bins / (hi − lo))` formula (not `width_bucket`) so
    * the identical IEEE operation order can be mirrored in oracle SQL —
    * cross-engine bit-stable at bucket boundaries. */
  def histogramBucket(c: Column, lo: Column, hi: Column, bins: Int = 50): Column =
    least(floor(((c - lo) * lit(bins)) / (hi - lo)).cast("long") + 1, lit(bins.toLong))

  /** A7 as a table: (bucket, count) for `valueCol` over its own min/max.
    * Two passes (min/max agg, then bucket counts) — both map-side combinable. */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 50): DataFrame = {
    val r = df.agg(min(col(valueCol)).cast("double").as("lo"),
                   max(col(valueCol)).cast("double").as("hi")).head()
    histogramWith(df, valueCol, r.getDouble(0), r.getDouble(1), bins)
  }

  /** [[histogram]] with caller-supplied bounds — lets a caller that already
    * computed min/max (e.g. to feed [[histogramQuantile]]) skip the second
    * bounds scan. */
  def histogramWith(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                    bins: Int = 50): DataFrame =
    df.withColumn("bucket", histogramBucket(col(valueCol), lit(lo), lit(hi), bins))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** PromQL-style `histogram_quantile` over an equal-width [[histogram]]
    * table: for each requested quantile, walk the cumulative bucket counts
    * to the first bucket covering q·total and interpolate linearly inside
    * it — the sketch-side quantile read every metrics stack performs on
    * pre-bucketed data (exact quantiles need the raw values; histograms
    * are what survives aggregation at fleet scale).
    *
    * Plan shape: the histogram is ≤`bins` rows, so the quantile table
    * broadcasts into a nested-loop cross (fine at this size) and the
    * cumulative window partitions by q — no single-partition WindowExec.
    * All arithmetic is a fixed formula over integer counts, so the DuckDB
    * replay is deterministic. */
  def histogramQuantile(hist: DataFrame, lo: Double, hi: Double, bins: Int,
                        qs: Seq[Double]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val width = (hi - lo) / bins
    // the ≤bins-row histogram feeds both the total and the returned plan —
    // localCheckpoint (eager, reference-tracked) so the upstream aggregation
    // runs once, not twice, without pinning a CacheManager entry no caller
    // could ever drop
    val h = hist.localCheckpoint(true)
    val qdf = qs.toDF("q")
    // an EMPTY histogram sums to NULL, not 0 — return the empty (q, value)
    // frame instead of NPEing on the null unboxing
    val totalRow = h.agg(sum("cnt")).head()
    if (totalRow.isNullAt(0))
      return qdf.limit(0).select(col("q"), lit(null).cast("double").as("value"))
    val total = totalRow.getLong(0)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy("bucket")
    h.crossJoin(broadcast(qdf))
      .withColumn("cum", sum("cnt").over(
        wCum.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .withColumn("target", col("q") * lit(total.toDouble))
      .filter(col("cum") >= col("target"))
      .withColumn("rk", row_number().over(wCum))
      .filter(col("rk") === 1)
      .select(col("q"),
        round(lit(lo) + (col("bucket") - 1) * lit(width) +
          ((col("target") - (col("cum") - col("cnt"))) / col("cnt")) *
            lit(width), 6).as("value"))
  }

  /** PromQL-style `histogram_fraction` over an equal-width [[histogram]]
    * table: for each requested [xLo, xHi] range, the fraction of
    * observations falling inside it, linearly interpolated within partial
    * buckets — the complement read to [[histogramQuantile]] (the SLO
    * question "what share of requests were under 250 ms", answered from
    * pre-bucketed data).
    *
    * The interpolated CDF at x is `cum(bucket(x) − 1) + cnt(bucket(x)) ·
    * frac(x)` — exact BIGINT cumulative counts plus ONE partial-bucket
    * double term — so the formula replays deterministically in the oracle
    * (a Σ cnt·clamp() formulation would sum doubles in engine-dependent
    * order). Histogram tables omit empty buckets, so the spine is
    * densified to all `bins` ids before the cumulative window; ≤bins rows
    * throughout, every join broadcast-sized, window partitioned per range
    * (no single-partition WindowExec). */
  def histogramFraction(hist: DataFrame, lo: Double, hi: Double, bins: Int,
                        ranges: Seq[(Double, Double)]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val h = hist.localCheckpoint(true)
    val rdf = ranges.toDF("x_lo", "x_hi")
    val totalRow = h.agg(sum("cnt")).head()
    if (totalRow.isNullAt(0))
      return rdf.limit(0)
        .select(col("x_lo"), col("x_hi"), lit(null).cast("double").as("fraction"))
    val total = totalRow.getLong(0)
    // continuous bucket position of x — the same operation order as
    // histogramBucket, so bucket boundaries agree with the histogram build
    def pos(x: Column): Column = ((x - lit(lo)) * lit(bins)) / lit(hi - lo)
    // 1-based bucket containing x, clamped to [1, bins] (x == hi overflows)
    def ib(x: Column): Column =
      least(greatest(floor(pos(x)).cast("long"), lit(0L)), lit(bins - 1L)) + 1
    // fraction of x's bucket lying below x, clamped against fp overshoot
    def frac(x: Column): Column =
      least(greatest(pos(x) - (ib(x) - 1).cast("double"), lit(0.0)), lit(1.0))
    val spine = spark.range(1, bins + 1).select(col("id").as("bucket"))
    val dense = spine.join(h, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("x_lo", "x_hi").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = dense.crossJoin(broadcast(rdf))
      .withColumn("cum", sum("cnt").over(wCum))
      .localCheckpoint(true) // two endpoint lookups below — build cum once
    def cdfAt(x: Column): Column =
      (col("cum") - col("cnt")).cast("double") +
        col("cnt").cast("double") * frac(x)
    val loSide = cum.filter(col("bucket") === ib(col("x_lo")))
      .select(col("x_lo"), col("x_hi"), cdfAt(col("x_lo")).as("f_lo"))
    val hiSide = cum.filter(col("bucket") === ib(col("x_hi")))
      .select(col("x_lo"), col("x_hi"), cdfAt(col("x_hi")).as("f_hi"))
    loSide.join(hiSide, Seq("x_lo", "x_hi"))
      .select(col("x_lo"), col("x_hi"),
        ((col("f_hi") - col("f_lo")) / lit(total.toDouble)).as("fraction"))
  }

  /** PromQL `histogram_count` / `histogram_sum` / `histogram_avg` analog
    * over an equal-width [[histogram]]: exact observation count, and the
    * midpoint-mass estimates of sum and mean (each bucket's count placed
    * at its center — the standard reconstruction when only bucketed counts
    * survive; `histogramQuantile` is the same trade for quantiles).
    *
    * Determinism: the double sum Σ cnt·midpoint(b) is factored as
    * lo·N + w·(S − N/2) with N = Σ cnt and S = Σ cnt·b both EXACT BIGINTs
    * (bucket ids are integers), so no double is ever accumulated in
    * engine-dependent order — the oracle replays one fixed IEEE expression
    * over identical operands. One ≤bins-row aggregate; scales trivially. */
  def histogramStats(hist: DataFrame, lo: Double, hi: Double,
                     bins: Int): DataFrame = {
    val w = (hi - lo) / bins
    hist.agg(sum("cnt").cast("long").as("n"),
        sum(col("bucket") * col("cnt")).cast("long").as("s"))
      .select(col("n"),
        (lit(lo) * col("n").cast("double") + lit(w) *
          (col("s").cast("double") - col("n").cast("double") * lit(0.5)))
          .as("sum_est"))
      .withColumn("avg_est", col("sum_est") / col("n").cast("double"))
  }

  /** P8: anomaly flag. */
  def classify(mse: Column, threshold: Double): Column = mse > lit(threshold)

  /** A9: (is_anomaly, cnt, ratio) — one tiny two-row result. The ≤2-row
    * aggregate is localCheckpointed once (reference-tracked, reclaimed when
    * the frame is garbage) and the ratio derives from a broadcast cross join
    * against its own 1-row total: a no-partition window here — even over 2
    * rows — would re-log the planner's single-partition warning on every
    * pass, and a non-checkpointed self-reference would run the upstream
    * scoring lineage twice. */
  def anomalyStats(df: DataFrame, mseCol: String, threshold: Double): DataFrame = {
    val counts = df.groupBy(classify(col(mseCol), threshold).as("is_anomaly"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("cnt")).as("_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("ratio", col("cnt") / col("_total"))
      .drop("_total")
  }

  /** A10: running anomaly count in time order (streaming counterpart is the
    * exporter-side counter; this is the batch/backfill equivalent).
    * Single-partition window — fine at reference scale, use
    * [[runningAnomalyCountPartitioned]] for the 100 TB plan. */
  def runningAnomalyCount(df: DataFrame, orderCols: Seq[String], mseCol: String,
                          threshold: Double): DataFrame =
    df.withColumn("anomaly_total",
      sum(classify(col(mseCol), threshold).cast("long")).over(
        org.apache.spark.sql.expressions.Window.orderBy(orderCols.map(col): _*)
          .rowsBetween(Long.MinValue, 0)))

  /** A10 at scale: a global prefix sum with NO single-partition window —
    * `Windows.prefixSumPartitioned` over the anomaly flag (range-partition,
    * per-partition prefix sums, broadcast cumulative offsets). Result
    * equals [[runningAnomalyCount]] row-for-row on non-null inputs; null
    * `mseCol` rows count as 0 (SQL `CASE … ELSE 0` semantics — the window
    * twin renders a leading all-null prefix as null instead). */
  def runningAnomalyCountPartitioned(df: DataFrame, orderCols: Seq[String],
                                     mseCol: String, threshold: Double): DataFrame =
    Windows.prefixSumPartitioned(df, orderCols,
      classify(col(mseCol), threshold).cast("long"), "anomaly_total")
}
