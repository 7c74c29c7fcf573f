package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (event-time) join — the time-series alignment primitive the
  * pivot/align family can't express: each left row picks up the payload of
  * the single right row with the LARGEST right timestamp ≤ the left row's
  * timestamp within the same key group (DuckDB/kdb `ASOF JOIN`, pandas
  * `merge_asof`). The reference's detector aligns metric fetches to step
  * boundaries by exact key (PromIngest step alignment); as-of is the
  * general form — align two series sampled on DIFFERENT clocks.
  *
  * Spark has no native as-of join, and the naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-per-group) explodes to
  * a per-key cartesian before the aggregate prunes it. This is the
  * scalable union-scan shape instead:
  *
  *  1. tag both sides and union them on a common schema (right rows carry
  *     the payload, left rows carry null payload);
  *  2. ONE hash-partitioned window per key, ordered by (ts, side) with
  *     right-before-left at equal timestamps (inclusive `≤` semantics),
  *     `last(payload, ignoreNulls)` forward-fills the latest right payload
  *     onto every subsequent row;
  *  3. keep the left rows.
  *
  * Cost: one shuffle of |L|+|R| rows on the key — the same exchange a
  * plain equi-join would pay, no range explosion, no driver state. Skewed
  * keys follow the same salting/AQE story as any keyed window.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate duplicates
  * (both this plan and native ASOF joins pick an unspecified winner
  * otherwise). Left rows with no earlier right row keep a null payload
  * (left-join semantics); a MATCHED right row whose payload value is
  * itself NULL comes through as NULL (the match is row-level, not
  * value-level — ASOF JOIN semantics exactly).
  */
object Asof {

  /** `left` keeps all its columns; `payloadCols` from `right` are appended.
    * `leftTs`/`rightTs` must cast to long (epoch micros, step indices, …);
    * payload names must not collide with left column names.
    *
    * `direction` (pandas merge_asof parity): "backward" (default) matches
    * the LATEST right row with ts ≤ left ts; "forward" the EARLIEST right
    * row with ts ≥ left ts — implemented by negating the working
    * timestamps, which reuses the identical single-shuffle plan (and keeps
    * ties inclusive in both directions). `tolerance` (same units as the
    * cast-long timestamps) nulls the payload when the matched right row is
    * farther than the bound — the left row is kept with a null payload,
    * exactly pandas' tolerance semantics. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty (a keyless as-of would plan a single-partition window)")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    require(!payloadCols.exists(left.columns.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    // the payload struct reserves a _rts field for the matched row's
    // working timestamp — a payload column of that name would build a
    // duplicate-field struct and hit ambiguous field resolution
    require(!payloadCols.contains("_rts"),
      "payload column _rts collides with the struct's internal timestamp field")
    // the union-scan rides on three working columns — an input already
    // carrying one would plan duplicate/ambiguous names (same guard shape
    // as Sessions.assign's session_idx/_new_session require)
    val internal = Seq("_ts", "_side", "_pl")
    require(!(left.columns ++ right.columns).exists(internal.contains),
      s"inputs must not contain internal working columns ${internal.mkString(",")}")
    val sign = if (direction == "forward") -1L else 1L
    val carried = left.columns.toSeq.filterNot(keyCols.contains)
    // the payload rides as ONE struct so the fill picks up the latest right
    // ROW atomically: a right row whose payload value is genuinely NULL
    // still matches (its struct is non-null), and multiple payload columns
    // can never stitch values from different right rows. The struct also
    // carries the matched row's working timestamp (_rts) so the tolerance
    // bound can measure the gap after the fill.
    val plType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_rts",
        org.apache.spark.sql.types.LongType) +:
      payloadCols.map(p => right.schema(p).copy(name = p)))
    val l = left.select(
      keyCols.map(col) ++
        Seq((col(leftTs).cast("long") * sign).as("_ts"), lit(1).as("_side")) ++
        carried.map(col) :+
        lit(null).cast(plType).as("_pl"): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq((col(rightTs).cast("long") * sign).as("_ts"), lit(0).as("_side")) ++
        carried.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((col(rightTs).cast("long") * sign).as("_rts") +:
          payloadCols.map(col): _*).as("_pl"): _*)
    // right sorts before left at equal ts -> inclusive (ts_r <= ts_l) match
    // in the SIGNED space, i.e. ts_r >= ts_l when direction=forward
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select(keyCols.map(col) ++ Seq(col("_ts"), col("_side")) ++
        carried.map(col) :+
        last(col("_pl"), ignoreNulls = true).over(w).as("_pl"): _*)
      .filter(col("_side") === 1)
    // signed-space gap l._ts − r._rts is the TRUE gap in both directions
    // (backward: l−r; forward: (−l)−(−r) = r−l), always ≥ 0 for a match
    val bounded = tolerance.fold(filled)(tol => filled.withColumn("_pl",
      when(col("_pl").isNotNull && col("_ts") - col("_pl._rts") <= tol,
        col("_pl"))))
    bounded.select(keyCols.map(col) ++ carried.map(col) ++
      payloadCols.map(p => col(s"_pl.$p").as(p)): _*)
  }
}
