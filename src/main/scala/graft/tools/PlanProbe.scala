package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query by name, print cold + warm wall time
  * and the formatted physical plan. Usage:
  * {{{ sbt "runMain graft.tools.PlanProbe q_contamination /root/testdata/sf0.1" }}}
  * Cold-vs-warm separates codegen/JIT cost from steady-state execution —
  * the number that matters for the per-round bench is the warm one; the
  * plan dump is the scale audit (look for Exchange count, join strategy,
  * PushedFilters, WholeStageCodegen spans). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanProbe <queryName> <sfDir>")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Array(name, dir) = args.take(2)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.count()
    println(s"cold: ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).count()
    println(s"warm: ${(System.nanoTime() - t1) / 1e9}s")
    df.explain("formatted")
    spark.stop()
  }
}
