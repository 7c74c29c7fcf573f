package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the bin-assignment step of training-data pipelines:
  * documents are laid into fixed token-capacity bins in deterministic
  * (group, id) order, `bin_id` = the bin where each document STARTS
  * (⌊exclusive-cumulative-tokens / capacity⌋, sequential-fill semantics).
  * Downstream writers turn each bin into one packed training sequence.
  *
  * Two plans, identical output (cumulative sums are associative and all
  * arithmetic is integer-exact, so both share one oracle verbatim):
  *
  *  - [[packBins]]: one window per group — fine while every group fits a
  *    task, which is the reference-faithful shape but caps parallelism at
  *    the number of groups (5 langs = 5 tasks at 100 TB: the ceiling the
  *    bucketed twin removes).
  *  - [[packBinsBucketed]]: the boundary-carry pattern (as in the bucketed
  *    ffill): ids are range-bucketed, each bucket computes its LOCAL
  *    exclusive cumsum in parallel, a bucket-summary table (one row per
  *    (group, bucket) — thousands of rows, not corpus-sized) prefix-sums
  *    the carry-in offsets, and a broadcast join adds them back. No
  *    single-task stage anywhere.
  */
object Packing {

  private def nTokens(textCol: Column): Column =
    size(graft.dedup.Dedup.normTokens(textCol))

  /** Global form: one window per group. */
  def packBins(docs: DataFrame, idCol: String, groupCol: String,
               textCol: String, capacity: Long): DataFrame = {
    // non-ANSI integer div-by-zero yields NULL bin_ids silently; negative
    // capacity yields negative bins — both are caller bugs, fail fast
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(groupCol),
        nTokens(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("_cum_excl", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        expr(s"_cum_excl div $capacity").as("bin_id"))
  }

  /** Bucketed form: local window per (group, id-range bucket) + carry-in
    * offsets from a prefix sum over the tiny bucket-summary table.
    * `idsPerBucket` sets the range width (ids `[b·w, (b+1)·w)` share a
    * bucket); results are identical for any width. */
  def packBinsBucketed(docs: DataFrame, idCol: String, groupCol: String,
                       textCol: String, capacity: Long,
                       idsPerBucket: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(idsPerBucket > 0, "idsPerBucket must be positive")
    val t = docs.select(col(idCol), col(groupCol),
      nTokens(col(textCol)).cast("long").as("n_tokens"),
      expr(s"$idCol div $idsPerBucket").as("_bkt"))
    val wLocal = Window.partitionBy(groupCol, "_bkt").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = t.withColumn("_local_excl",
      coalesce(sum("n_tokens").over(wLocal), lit(0L)))
    // carry-in per bucket: exclusive prefix sum over bucket totals — the
    // summary table has one row per (group, bucket), so this window is
    // over thousands of rows regardless of corpus size
    val wCarry = Window.partitionBy(groupCol).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = t.groupBy(col(groupCol), col("_bkt"))
      .agg(sum("n_tokens").as("_bkt_total"))
      .withColumn("_carry", coalesce(sum("_bkt_total").over(wCarry), lit(0L)))
      .select(col(groupCol), col("_bkt"), col("_carry"))
    local.join(broadcast(carries), Seq(groupCol, "_bkt"))
      .withColumn("_cum_excl", col("_carry") + col("_local_excl"))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        expr(s"_cum_excl div $capacity").as("bin_id"))
  }
}
