package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE registered query exactly the way Bench does
  * (local[32], 32 shuffle partitions, warmup scans, construction inside the
  * timer, fresh JVM) — the number PlanProbe can't give because its cold
  * timer excludes construction and it runs local[8]. Repeats N times in the
  * same session to split first-run codegen/JIT from steady state.
  * Usage: {{{ sbt "runMain graft.tools.BenchOne q_contamination /root/testdata/sf0.1 3" }}} */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <queryName> <sfDir> [reps]")
    val Array(name, dir) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.read.parquet(s"$dir/lineitem.parquet").limit(100).count()
      graft.Tables.events(spark, dir).limit(100).count()
    } catch { case _: Throwable => () }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries.getOrElse(name,
        graft.Queries.benchOnly(name))(spark, dir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"run $i: construct ${(t1 - t0) / 1e9}%.3f s, execute ${(t2 - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
