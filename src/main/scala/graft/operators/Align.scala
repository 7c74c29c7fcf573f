package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Series alignment: turn a long (ts, series_key, value) stream into the
  * reference's wide multivariate table.
  *
  * Reference semantics: `pd.concat(axis=1, join='outer')` over per-query
  * frames (`/root/reference/data_collector.py:108`) and `join='inner'` for
  * the realtime window (`/root/reference/realtime_detector.py:195`).
  *
  * Spark-first design: instead of a (k−1)-deep full-outer join cascade
  * (k−1 shuffles, exploding join plans at 100 TB), we do ONE shuffle:
  * `groupBy(ts).pivot(key, knownKeys).agg(...)`. Passing the key list
  * explicitly keeps it single-pass (no distinct pre-scan) and keeps the
  * aggregation map-side-combinable. At cluster scale the shuffle is on the
  * timestamp bucket — uniformly distributed, no skew.
  */
object Align {

  /** Duplicate-timestamp resolution matching the reference's keep-FIRST rule
    * (`data_collector.py:222-224`: sort then `~index.duplicated(keep='first')`)
    * — "first" made deterministic by a caller-named arrival/tiebreak column.
    * `min_by` is a map-side-combinable builtin, so the pivot stays one shuffle. */
  def keepFirst(valueCol: String, tiebreakCol: String): Column => Column =
    _ => min_by(col(valueCol), col(tiebreakCol))

  /** Wide outer alignment (J1). One row per distinct `tsCol` value; one
    * column per key; holes are SQL nulls (reference: NaN).
    *
    * Default duplicate handling is keep-first over `tiebreakCol` (reference
    * semantics); pass `agg = Some(avg)` etc. for an explicit alternative. */
  def pivotAlignOuter(long: DataFrame, tsCol: String, keyCol: String,
                      valueCol: String, keys: Seq[String],
                      tiebreakCol: String = "",
                      agg: Option[Column => Column] = None): DataFrame = {
    val a: Column => Column = agg.getOrElse {
      require(tiebreakCol.nonEmpty,
        "pivotAlignOuter: give a tiebreakCol for keep-first, or an explicit agg")
      keepFirst(valueCol, tiebreakCol)
    }
    long.groupBy(col(tsCol))
      .pivot(keyCol, keys)
      .agg(a(col(valueCol)))
  }

  /** Wide inner alignment (J2): only timestamps where EVERY key has a value
    * (reference drops rows missing any metric).
    *
    * Semantics note vs pandas `concat(join='inner')`: pandas intersects on
    * the timestamp INDEX, so a present-but-NaN value survives; this
    * implementation drops any row with a null in a key column. After the
    * coerce-to-null decode the two differ only for series that explicitly
    * report non-numeric samples at an aligned timestamp — the realtime
    * consumer (`realtime_detector.py:199-215`) treats such rows as unusable
    * anyway (they fail the scaler), so the stricter form is used here. */
  def pivotAlignInner(long: DataFrame, tsCol: String, keyCol: String,
                      valueCol: String, keys: Seq[String],
                      tiebreakCol: String = "",
                      agg: Option[Column => Column] = None): DataFrame =
    pivotAlignOuter(long, tsCol, keyCol, valueCol, keys, tiebreakCol, agg)
      .na.drop("any", keys)

  /** Schema totalization (P6, `data_collector.py:122-126`): inject missing
    * series as all-null double columns so downstream column order is total. */
  def totalize(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    requiredCols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast("double"))
    }
}
