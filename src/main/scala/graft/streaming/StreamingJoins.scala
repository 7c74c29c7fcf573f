package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the two-moving-datasets case the batch
  * [[graft.operators.RangeJoin]] can't serve: both sides arrive
  * incrementally, and each left row must pair with right rows of the same
  * key inside a time interval around it.
  *
  * Structured Streaming's watermarked inner join does exactly this with
  * BOUNDED state: the time-range predicate plus both watermarks let the
  * engine prove when a buffered row can no longer match anything and evict
  * it — state is O(events inside the watermark + interval horizon), not
  * stream length. Without the range predicate the engine would have to
  * buffer both streams forever.
  *
  * Parity: the emitted row set equals the batch join with the identical
  * predicate over the same events (asserted in StreamingJoinsSpec), except
  * rows arriving LATER than the watermark allows, which are dropped — the
  * documented streaming trade.
  */
object StreamingJoins {

  /** Inner interval join: rows pair when keys match and
    * `rightTs ∈ [leftTs − beforeSec, leftTs + afterSec]`. Column names
    * must be disjoint across the two frames; ts columns must be
    * timestamps. `watermark` is a duration string applied to both sides. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   watermark: String,
                   beforeSec: Long, afterSec: Long): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right column names must be disjoint")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        condition(leftKey, rightKey, leftTs, rightTs, beforeSec, afterSec))
  }

  /** Batch twin of [[intervalJoin]]: the IDENTICAL key+range predicate
    * (shared [[condition]] builder) evaluated over static frames — a keyed
    * hash/sort-merge equi-join with the range refine inside the join
    * condition, never a nested loop. This is what makes the streaming
    * operator's semantics auditable: the twin is registered as
    * `q_interval_join` under a DuckDB oracle, and StreamingJoinsSpec
    * asserts the streaming emit set equals THIS join over the same rows
    * (minus late arrivals past the watermark — the documented trade). */
  def intervalJoinBatch(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTs: String, rightTs: String,
                        beforeSec: Long, afterSec: Long): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right column names must be disjoint")
    left.join(right,
      condition(leftKey, rightKey, leftTs, rightTs, beforeSec, afterSec))
  }

  private def condition(leftKey: String, rightKey: String,
                        leftTs: String, rightTs: String,
                        beforeSec: Long, afterSec: Long): Column =
    col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $beforeSec SECONDS") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $afterSec SECONDS")
}
