package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven table profiler — the "dataset card" every ingestion run
  * wants before anything downstream trusts a new drop: one row per
  * column with null count, exact distinct count, and type-appropriate
  * min/max/mean. The profile is the first thing a 100 TB pipeline runs
  * on an unfamiliar delivery and the artifact reviewers diff between
  * drops, so determinism matters as much as the numbers:
  *
  *  - means accumulate on the ⌊v·10⁶⌋ integer grid into a
  *    decimal(38,0) sum (exact and order-independent at ANY row count —
  *    a BIGINT sum would overflow on epoch-second grids around 10⁴ rows,
  *    a float `avg`'s accumulation order is engine- and
  *    partition-dependent), then ONE rounded division;
  *  - min/max are order-independent already; numerics/timestamps emit
  *    as rounded doubles (timestamps as epoch seconds), strings emit
  *    verbatim (ASCII-safe on these fixtures — collation is the one
  *    cross-engine hazard a profile consumer should know about);
  *  - distinct counts are EXACT (the certification stance: approximate
  *    profile variants belong next to q_sketch_bounds' HLL flags, not
  *    silently inside the default profile).
  *
  * Scale shape: ONE aggregate job over the table — every per-column
  * measure rides in the same agg (the multi-countDistinct Expand is the
  * one multiplier: ×n_cols rows into a map-side-combinable aggregate),
  * then a literal struct explode emits the per-column rows from the
  * single result row. No per-column scans, no driver-side loops over
  * data — only over the schema. */
object Profile {

  def profile(df: DataFrame): DataFrame =
    profileWith(df, countDistinct(_))

  /** The approx-distinct production twin of [[profile]] (round-17
    * order #6 probe): IDENTICAL output schema and identical values in
    * every field except `n_distinct`, which comes from
    * `approx_count_distinct` (HyperLogLog++, `rsd` relative error)
    * instead of exact `countDistinct`.
    *
    * Why it exists: the exact profile's one multiplier is the
    * multi-countDistinct Expand — ×n_cols rows into the aggregate — and
    * it is q_table_profile's 24× count-vs-noop divergence (BASELINE.md
    * divergence table). HLL sketches are distinct-free aggregates: no
    * Expand, one pass at ×1 rows, constant sketch state per column —
    * the shape a 100 TB dataset-card run wants when ~2% error on
    * distinct counts is acceptable. UNREGISTERED: the registry row
    * keeps the exact plan (the certification stance in [[profile]]'s
    * scaladoc — approximate variants are opt-in, never silently
    * default); this twin is measured noop-vs-noop by
    * `tools/TableProfileProbe` and would only be promoted to a
    * bench-only production-twin row on a ≥1.5× record, like the
    * xxhash64 MinHash twin. */
  def profileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileWith(df, approx_count_distinct(_, rsd))

  private def profileWith(df: DataFrame,
      distinctAgg: Column => Column): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile an empty schema")
    def numd(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      case _: TimestampType => Some(col(f.name).cast("double")) // epoch s
      case _: TimestampNTZType =>
        // NTZ has no double cast; the timestamp hop preserves the wall
        // clock under the UTC session every entrypoint pins
        Some(col(f.name).cast("timestamp").cast("double"))
      case _ => None
    }
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(count(c).as(s"_c_${f.name}"),
        distinctAgg(c).as(s"_d_${f.name}")) ++
        numd(f).toSeq.flatMap { n =>
          Seq(min(n).as(s"_mn_${f.name}"), max(n).as(s"_mx_${f.name}"),
            sum(floor(n * 1e6).cast("decimal(38,0)")).as(s"_s_${f.name}"))
        } ++ (f.dataType match {
          case _: StringType =>
            Seq(min(c).as(s"_mns_${f.name}"), max(c).as(s"_mxs_${f.name}"))
          case _ => Seq.empty
        })
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.map { f =>
      val isNum = numd(f).isDefined
      val isStr = f.dataType.isInstanceOf[StringType]
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_c_${f.name}")).as("n_nulls"),
        col(s"_d_${f.name}").as("n_distinct"),
        (if (isNum) round(col(s"_mn_${f.name}"), 6)
         else lit(null).cast("double")).as("min_num"),
        (if (isNum) round(col(s"_mx_${f.name}"), 6)
         else lit(null).cast("double")).as("max_num"),
        (if (isNum)
           round(col(s"_s_${f.name}").cast("double") / lit(1e6)
             / col(s"_c_${f.name}"), 6)
         else lit(null).cast("double")).as("mean_num"),
        (if (isStr) col(s"_mns_${f.name}")
         else lit(null).cast("string")).as("min_str"),
        (if (isStr) col(s"_mxs_${f.name}")
         else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.*"))
      .orderBy("col_name")
  }
}
