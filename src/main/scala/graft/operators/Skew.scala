package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-stage aggregation.
  *
  * A `groupBy(k).agg(...)` on a skewed key sends every row of the hot key
  * to one reducer. Salting splits each key into `saltFactor` sub-keys for a
  * partial (map-side-combinable) aggregate, then merges the partials in a
  * second, tiny aggregate — the hot key's work spreads over `saltFactor`
  * tasks and the second stage only sees `saltFactor` rows per key.
  *
  * Only algebraic aggregates decompose this way; this helper covers the
  * sum/count/min/max family (avg = merged sum / merged count). AQE's
  * skew-join handling covers the join side; this covers aggregation.
  */
object Skew {

  /** `groupBy(keyCols).agg(sum/count/min/max)` computed via salted two-stage
    * aggregation. `aggs` maps output column name → (valueCol, kind) with
    * kind ∈ sum | count | min | max | avg. */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String],
                      aggs: Map[String, (String, String)],
                      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    // stage 1: per (key, salt) partials
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val partialAggs = aggs.toSeq.flatMap { case (out, (in, kind)) =>
      kind match {
        case "sum"   => Seq(sum(col(in)).as(s"_p_sum_$out"))
        case "count" => Seq(count(col(in)).as(s"_p_cnt_$out"))
        case "min"   => Seq(min(col(in)).as(s"_p_min_$out"))
        case "max"   => Seq(max(col(in)).as(s"_p_max_$out"))
        case "avg"   => Seq(sum(col(in)).as(s"_p_sum_$out"),
                            count(col(in)).as(s"_p_cnt_$out"))
        case other   => throw new IllegalArgumentException(
          s"saltedAggregate: non-algebraic kind '$other'")
      }
    }
    val partial = salted.groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    // stage 2: merge partials per key (saltFactor rows per key)
    val finalAggs: Seq[Column] = aggs.toSeq.map { case (out, (_, kind)) =>
      kind match {
        case "sum"   => sum(col(s"_p_sum_$out")).as(out)
        case "count" => sum(col(s"_p_cnt_$out")).as(out)
        case "min"   => min(col(s"_p_min_$out")).as(out)
        case "max"   => max(col(s"_p_max_$out")).as(out)
        case "avg"   => (sum(col(s"_p_sum_$out")) / sum(col(s"_p_cnt_$out"))).as(out)
      }
    }
    partial.groupBy(keyCols.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
