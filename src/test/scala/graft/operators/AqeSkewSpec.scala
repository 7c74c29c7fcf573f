package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Evidence that AQE's runtime skew-join split actually fires on a hot
  * key — the dynamic counterpart to the static Skew.saltedJoin pattern
  * (q_join_skewed). SCALE.md's claim that "skew is AQE's job" on the plain
  * shuffle joins rests on this spec: a 90%-hot join, thresholds scaled to
  * the test volume the way a production job would scale them to executor
  * memory, and the FINAL adaptive plan asserted to contain a skew=true
  * sort-merge join. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Full physical traversal: AQE wrappers and query-stage nodes hide
    * their subtree from `children`, so a plain `collect` sees none of the
    * executed operators. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def smjsOf(df: org.apache.spark.sql.DataFrame): Seq[SortMergeJoinExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case s: SortMergeJoinExec => s
    }

  test("AQE splits the hot partition of a skewed sort-merge join (skew=true in the final plan)") {
    // ~94% of fact rows share one key; dim is 8 rows (broadcast disabled
    // so the join exercises the skewed-shuffle path AQE must repair).
    val fact = (1 to 80000).map { i =>
      (if (i % 16 == 0) s"cold_${(i / 16) % 8}" else "hot", i.toLong)
    }.toDF("k", "v").repartition(8)
    val dim = (Seq("hot") ++ (0 until 8).map(i => s"cold_$i"))
      .zipWithIndex.map { case (k, a) => (k, a.toLong) }.toDF("k", "attr")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // global aggregate above the join: a keyed groupBy on the join key
      // would REQUIRE hashpartitioning(k) of the join output, and
      // OptimizeSkewedJoin declines any split that forces an extra shuffle
      // (unless forceOptimizeSkewedJoin) — the demo wants the organic fire.
      val joined = fact.join(dim.hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      val row = joined.collect()(0)
      // correctness first: the split must not change results
      assert(row.getLong(0) == 80000L, s"row count ${row.getLong(0)}")
      assert(row.getLong(1) == 3200040000L, s"sum ${row.getLong(1)}")
      val smjs = smjsOf(joined)
      assert(smjs.nonEmpty, "join was not planned as sort-merge:\n" +
        finalPlan(joined.queryExecution.executedPlan).toString)
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew=true:\n" +
          finalPlan(joined.queryExecution.executedPlan).toString)
    }
  }

  test("without AQE skew handling the same join keeps one monolithic hot partition") {
    // The negative control: skew handling off → no skew=true anywhere,
    // pinning that the positive assert above detects the optimization and
    // not some always-on decoration.
    val fact = (1 to 40000).map { i =>
      (if (i % 16 == 0) s"cold_${(i / 16) % 8}" else "hot", i.toLong)
    }.toDF("k", "v").repartition(8)
    val dim = (Seq("hot") ++ (0 until 8).map(i => s"cold_$i"))
      .zipWithIndex.map { case (k, a) => (k, a.toLong) }.toDF("k", "attr")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      val joined = fact.join(dim.hint("merge"), Seq("k"))
        .agg(count(lit(1)).as("cnt"))
      joined.collect()
      val smjs = smjsOf(joined)
      assert(smjs.nonEmpty && !smjs.exists(_.isSkewJoin))
    }
  }
}
