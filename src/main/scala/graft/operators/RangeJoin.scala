package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to the intervals containing them
  * WITHOUT the cartesian a naive `s <= p AND p < e` join plans (Spark has
  * no equi-key to hash on, so it falls back to broadcast-nested-loop: |P|·|I|
  * comparisons, a scale killer when both sides are large).
  *
  * Bucketed equi-join shape instead (the standard interval-join pattern,
  * cf. Spark's own range-join hints on Databricks and the GenomicsDB /
  * interval-tree literature):
  *
  *  1. each interval explodes into the fixed-width buckets it overlaps
  *     (`sequence(s div w, (e-1) div w)` — half-open [s, e));
  *  2. each point lands in its single home bucket (`p div w`);
  *  3. hash equi-join on the bucket id with the exact `s <= p < e` refine
  *     predicate inside the join condition.
  *
  * Every qualifying (interval, point) pair meets in EXACTLY one bucket —
  * the point's home bucket, which the containing interval always covers —
  * so no post-join dedup is needed. Cost: intervals replicate by
  * ⌈len/w⌉+1 rows (choose `bucketWidth` near the typical interval length:
  * ~2 replicas per interval), then one shuffle of |P| + Σ replicas on the
  * bucket key. A pathological mega-interval replicates len/w times — cap it
  * by splitting long intervals upstream or raising w; point-side skew
  * follows the usual salting/AQE story.
  */
object RangeJoin {

  /** Inner range join: rows pair every `points` row with every `intervals`
    * row whose [startCol, endCol) contains its `pointTs`. Column names must
    * be disjoint across the two frames; timestamps must cast to long. */
  def joinRange(points: DataFrame, intervals: DataFrame, pointTs: String,
                startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point and interval column names must be disjoint")
    // div truncates toward zero (floor for the non-negative epochs used
    // here); half-open end -> last covered bucket is (e-1) div w.
    // Empty/inverted intervals ([s, e) with e <= s) contain nothing by
    // definition — drop them BEFORE the explode: Spark's sequence() would
    // otherwise silently step -1 and blow one malformed row up into
    // |s-e|/width bucket replicas that the refine then discards at full cost.
    // MALFORMED bounds are dropped the same way, and explicitly: a null or
    // non-numeric start/end casts to null, and an interval with an unknown
    // bound cannot be proven to contain any point. Callers that need to
    // DISTINGUISH bad rows from empty intervals should validate upstream —
    // this operator's contract is "match points to well-formed intervals".
    val iv = intervals
      .filter(col(startCol).cast("long").isNotNull &&
        col(endCol).cast("long").isNotNull &&
        col(endCol).cast("long") > col(startCol).cast("long"))
      .withColumn("_bkt", explode(sequence(
        expr(s"cast($startCol as long) div $bucketWidth"),
        expr(s"(cast($endCol as long) - 1) div $bucketWidth"))))
    val pts = points
      .withColumn("_bkt", expr(s"cast($pointTs as long) div $bucketWidth"))
    iv.join(pts,
        iv("_bkt") === pts("_bkt") &&
          col(startCol).cast("long") <= col(pointTs).cast("long") &&
          col(pointTs).cast("long") < col(endCol).cast("long"))
      .drop("_bkt")
  }
}
