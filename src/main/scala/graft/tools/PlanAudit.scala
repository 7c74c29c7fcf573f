package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan of selected registry
  * queries so pushdown/broadcast/partitioning claims can be verified (and
  * regressions spotted). NOTE: construction is not free — queries built on
  * eager localCheckpoints (anomaly stats, the partitioned prefix-sum and
  * window families) execute real jobs against the data dir while being
  * built, so point this at the small sf0.001 set. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty && args(0) != "ALL") args(0).split(",").toSeq
      else graft.Queries.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.Queries.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
