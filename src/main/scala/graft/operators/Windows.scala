package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-order operators: sliding windows, dedup-keep-first, tail, step
  * alignment, train/val split.
  *
  * Reference semantics:
  *  - W2 stride-1 length-L windows: `data[i:i+L]` for i in 0..n-L
  *    (`/root/reference/train_autoencoder.py:61-74`,
  *     `/root/reference/filter_anomalous_data.py:57-67`) — strictly
  *    row-count-based, NOT time-based, so Spark's time sliding windows are
  *    the wrong tool; an analytic `collect_list over rowsBetween` is right.
  *  - W3 dedup keep-first per duplicate timestamp
  *    (`/root/reference/data_collector.py:222-224`).
  *  - W5 tail(L): newest L rows re-sorted ascending
  *    (`/root/reference/realtime_detector.py:210`).
  *  - W6 floor-to-step alignment (`/root/reference/realtime_detector.py:148-153`).
  *  - W7 80/20 shuffled split seed 42 (`/root/reference/train_autoencoder.py:188-190`).
  *
  * Scale notes: the default no-partition variants are single-task (global
  * row order is inherently sequential — same caveat as pandas). Every
  * operator takes `partitionCols` so that at 100 TB the window runs
  * per-series/per-day; for sliding windows crossing partition boundaries use
  * [[slidingWindowsPartitioned]], which replicates the (L−1)-row boundary
  * overlap so results equal the global computation, with parallelism.
  */
object Windows {

  /** W2: append `window_id` (0-based) and `window` = the last `length` values
    * of `valueCols` (as a struct list), keeping only complete windows.
    * Emits n−L+1 rows; empty output when n<L — matching `data[i:i+L]`. */
  def slidingWindows(df: DataFrame, orderCols: Seq[String],
                     valueCols: Seq[String], length: Int,
                     partitionCols: Seq[String] = Nil): DataFrame = {
    val base =
      if (partitionCols.isEmpty) Window.orderBy(orderCols.map(col): _*)
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(orderCols.map(col): _*)
    val w = base.rowsBetween(-(length - 1), Window.currentRow)
    df.withColumn("window",
        collect_list(struct(valueCols.map(col): _*)).over(w))
      .withColumn("window_id",
        row_number().over(base) - lit(length))
      .filter(size(col("window")) === length)
  }

  /** The shared scale-safe global-prefix machinery: range-partition by
    * `orderCols`, sort within partitions, total `perRow` per partition
    * (tiny driver-side collect — O(partitions)), then add the cumulative
    * offset to a PER-PARTITION running sum. No single-partition window
    * anywhere — every stage parallelizes. Null `perRow` values count as 0
    * (SQL `CASE … ELSE 0` semantics). [[globalRowNumber]] and
    * `Score.runningAnomalyCountPartitioned` are both instances. */
  private[graft] def prefixSumPartitioned(df: DataFrame, orderCols: Seq[String],
                                          perRow: Column, out: String): DataFrame = {
    // localCheckpoint (not persist): the sorted frame must be materialized
    // ONCE — repartitionByRange samples with an execution-dependent seed,
    // so recomputation could assign different _pid boundaries and corrupt
    // the offsets. A persist would pin a CacheManager entry no caller can
    // release; localCheckpoint blocks are reference-tracked and reclaimed
    // by the ContextCleaner when the result is garbage.
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("_val", coalesce(perRow.cast("long"), lit(0L)))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val sums = sorted.groupBy("_pid").agg(sum("_val").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (sums.isEmpty) -1 else sums.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, pid) =>
      acc + sums.getOrElse(pid, 0L)).toArray
    val offsetCol =
      if (maxPid < 0) lit(0L) // empty input: no rows evaluate this anyway
      else element_at(
        array(offsets.take(maxPid + 1).map(lit(_)): _*), col("_pid") + 1)
    val w = Window.partitionBy("_pid").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .withColumn(out, offsetCol + sum(col("_val")).over(w))
      .drop("_pid", "_val")
  }

  /** Scale-safe 0-based global row number by `orderCols` — the prefix sum
    * of 1 per row, minus 1. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
                      out: String = "_rn"): DataFrame =
    prefixSumPartitioned(df, orderCols, lit(1L), out)
      .withColumn(out, col(out) - 1)

  /** W2 at scale: partition rows into contiguous buckets of `bucketSize` by
    * global row number, replicate each bucket's first (L−1) rows into the
    * previous bucket, then window within buckets. Result set equals
    * [[slidingWindows]] with no partitioning, but each task holds only
    * bucketSize + L − 1 rows. With [[globalRowNumber]] doing the numbering,
    * NO stage is single-task — the 100 TB-safe plan end to end. */
  def slidingWindowsPartitioned(df: DataFrame, orderCols: Seq[String],
                                valueCols: Seq[String], length: Int,
                                bucketSize: Int = 1 << 16): DataFrame = {
    require(bucketSize >= length, "bucketSize must be >= window length")
    val numbered = globalRowNumber(
      df.select((orderCols ++ valueCols).distinct.map(col): _*), orderCols)
      .select((valueCols :+ "_rn").map(col): _*)
    // Home bucket, plus a copy of each bucket's LAST (L−1) rows into the NEXT
    // bucket: a window ending near the start of bucket b reaches back into
    // bucket b−1, so b needs b−1's tail rows for full support. The copy is
    // made by exploding each row into 1–2 bucket assignments in a single
    // pass — a union of two branches would recompute the global row-number
    // pipeline (and its single-partition exchange) once per branch.
    val both = numbered
      .withColumn("_bkt", explode(array(
        floor(col("_rn") / bucketSize),
        when(col("_rn") % bucketSize >= bucketSize - (length - 1),
          floor(col("_rn") / bucketSize) + 1))))
      .filter(col("_bkt").isNotNull)
    val w = Window.partitionBy(col("_bkt")).orderBy(col("_rn"))
      .rowsBetween(-(length - 1), Window.currentRow)
    both
      .withColumn("window", collect_list(struct(valueCols.map(col): _*)).over(w))
      // A window is owned by its home bucket and must span exactly L rows.
      .filter(size(col("window")) === length &&
        floor(col("_rn") / bucketSize) === col("_bkt"))
      .withColumn("window_id", col("_rn") - lit(length - 1))
      .drop("_rn", "_bkt")
  }

  /** W3: keep the first row per duplicate key, "first" = smallest
    * `tiebreakCols` (explicit deterministic arrival order — plain
    * dropDuplicates is nondeterministic under retries/reordering). */
  def dedupKeepFirst(df: DataFrame, keyCols: Seq[String],
                     tiebreakCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tiebreakCols.map(col): _*)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
  }

  /** W5: newest `n` rows by `orderCols`, returned in ascending order.
    * Top-k via sort+limit — Spark plans this as TakeOrderedAndProject
    * (per-partition heap + driver merge), no full sort at scale. */
  def tail(df: DataFrame, orderCols: Seq[String], n: Int): DataFrame =
    df.orderBy(orderCols.map(c => col(c).desc): _*).limit(n)
      .orderBy(orderCols.map(col): _*)

  /** W6: floor an epoch column to a step boundary (`ts // step * step`).
    * Pure integer arithmetic (`c − c mod step`) — float division of µs
    * epochs would be inexact near boundaries. */
  def stepAlign(c: Column, step: Long): Column =
    c - pmod(c, lit(step))

  /** W7: randomized train/val split. Exact sklearn row assignment is
    * RNG-specific (not reproducible cross-stack); contract here is sizes ≈
    * ratio, disjoint, union = input — same as the reference's intent. */
  def trainValSplit(df: DataFrame, trainRatio: Double, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    val Array(tr, va) = df.randomSplit(Array(trainRatio, 1.0 - trainRatio), seed)
    (tr, va)
  }
}
