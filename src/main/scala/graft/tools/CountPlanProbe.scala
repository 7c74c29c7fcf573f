package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the OPTIMIZED plan of `queries(name).count()` — the
  * exact plan Bench times — next to the query's own plan. Round 14: the
  * flagship exposed that a count-shaped execution lets Catalyst prune
  * window projections the full result would compute (the O(n²) bfill
  * hid behind this for three rounds); this probe makes the gap
  * inspectable per row instead of inferred from timings.
  * Usage: {{{ runMain graft.tools.CountPlanProbe <queryName> <sfDir> }}} */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CountPlanProbe <queryName> <sfDir>")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Array(name, dir) = args.take(2)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val counted = df.groupBy().count()
    println("==== optimized plan of count() (what Bench times) ====")
    println(counted.queryExecution.optimizedPlan.treeString)
    println("==== optimized plan of the full result (what Verify writes) ====")
    println(df.queryExecution.optimizedPlan.treeString.take(4000))
    spark.stop()
  }
}
