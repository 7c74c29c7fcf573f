package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-pipeline operator: rows
  * sharing a key chain into one session while each arrives STRICTLY within
  * `gap` of the previous one; a silence of `gap` or more starts the next
  * session (exactly native `session_window`'s [start, last + gap) horizon
  * — parity asserted in SessionsSpec).
  *
  * Classic gaps-and-islands, all keyed: ONE hash-partitioned window per
  * key computes `lag(ts)`, the boundary flag, and its running sum (the
  * 0-based session ordinal) — a single shuffle on the key, no
  * single-partition stage, integer-exact arithmetic (the DuckDB oracle
  * replays it verbatim).
  *
  * Equivalent to Spark's native `session_window` grouping (events chain
  * while each falls inside the previous event's [t, t+gap] horizon —
  * the parity is asserted in SessionsSpec); this form additionally yields
  * the deterministic per-key session ordinal that downstream joins key on,
  * and row-level assignment for per-event enrichment.
  */
object Sessions {

  /** Row-level assignment: input columns + `session_idx` (0-based per key,
    * in time order). `tsCol` must cast to long; ties (equal ts within a
    * key, diff 0 < gap) never split a session, and the assignment is
    * deterministic under any tie order (the first-in-order tie row carries
    * the boundary flag, the rest chain at diff 0). */
  def assign(df: DataFrame, keyCols: Seq[String], tsCol: String,
             gap: Long): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty (keyless sessionization would plan a single-partition window)")
    require(gap > 0, "gap must be positive")
    // withColumn silently REPLACES existing columns — fail fast instead of
    // clobbering a caller's previous assignment
    require(!df.columns.contains("session_idx") &&
      !df.columns.contains("_new_session"),
      "input already carries session_idx/_new_session")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).cast("long"))
    val boundary = when(
      col(tsCol).cast("long") - lag(col(tsCol).cast("long"), 1).over(w) >= gap,
      1L).otherwise(0L)
    df.withColumn("_new_session", boundary)
      .withColumn("session_idx",
        sum("_new_session").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Session summary: one row per (key, session) with event count and the
    * session's [min, max] timestamp span. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gap: Long): DataFrame =
    assign(df, keyCols, tsCol, gap)
      .groupBy((keyCols :+ "session_idx").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol).cast("long")).as("ts_start"),
        max(col(tsCol).cast("long")).as("ts_end"))
}
