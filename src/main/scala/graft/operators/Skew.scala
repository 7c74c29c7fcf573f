package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-stage aggregation and salted joins.
  *
  * A `groupBy(k).agg(...)` on a skewed key sends every row of the hot key
  * to one reducer. Salting splits each key into `saltFactor` sub-keys for a
  * partial (map-side-combinable) aggregate, then merges the partials in a
  * second, tiny aggregate — the hot key's work spreads over `saltFactor`
  * tasks and the second stage only sees `saltFactor` rows per key.
  *
  * Only algebraic aggregates decompose this way; this helper covers the
  * sum/count/min/max family (avg = merged sum / merged count).
  *
  * For JOINS on a skewed key there are two tools: AQE's runtime skew-join
  * split (preferred when it fires — AqeSkewSpec demonstrates it on a hot
  * key with tuned thresholds) and the explicit [[saltedJoin]] below, the
  * static mitigation for when the skew is known up front or the engine's
  * thresholds can't be trusted at the target scale (q_join_skewed is the
  * oracle-checked registry instance).
  */
object Skew {

  /** Inner equi-join resilient to hot keys: every FACT row gets a
    * deterministic-per-row salt in [0, saltFactor); the DIM side is
    * replicated once per salt value and the join runs on (keys, salt).
    * The hot key's rows — all landing in one sort-merge task in a naive
    * shuffle join — spread across `saltFactor` tasks, at the price of a
    * saltFactor× dim replication (choose the factor so dim·saltFactor
    * stays small next to the fact table; at 100 TB fact scale a 16×
    * replication of a million-row dim is noise while a single 90%-hot
    * task is a stage-killer).
    *
    * The salt never reaches the output, and because each dim row appears
    * exactly once per salt value, the result multiset is identical to the
    * unsalted inner join — SkewSpec asserts that equality and the salted
    * plan shape. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val salted = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltFactor)).cast("int"))
    val dimSalted = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(dimSalted, keys :+ "_salt").drop("_salt")
  }

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
