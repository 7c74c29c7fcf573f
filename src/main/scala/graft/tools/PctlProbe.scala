package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 18): before/after evidence for the graft_percentile
  * kernel swap on the EAGER fit aggregates, which never appear in a
  * registry row's final plan (`Scalers.fitRobust` / `Fill.fillMedian`
  * run their percentile aggregate at query-BUILD time via `head()`, so
  * `PlanAudit` shows only the transform leg). This probe times and
  * explains the fit aggregate itself, built-in `percentile` vs the
  * bit-identical `graft_percentile` kernel (ExactPercentileSpec), on
  * the exact q_scale_robust fit input (lineitem l_quantity +
  * l_extendedprice, array(0.25, 0.5, 0.75)).
  *
  * Usage: {{{ runMain graft.tools.PctlProbe <sfDir> [reps] [--plans] }}} */
object PctlProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PctlProbe <sfDir> [reps] [--plans]")
    val sfDir = args(0)
    val reps = math.max(2, if (args.length > 1) args(1).toInt else 4)
    val plans = args.contains("--plans")
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
    try { spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count() }
    catch { case _: Throwable => () }

    def li: DataFrame = graft.Tables.lineitem(spark, sfDir)
    val ps = array(lit(0.25), lit(0.5), lit(0.75))
    def builtin: DataFrame = li.agg(
      percentile(col("l_quantity"), ps).as("q_q"),
      percentile(col("l_extendedprice"), ps).as("q_ep"))
    def kernel: DataFrame = li.agg(
      call_function("graft_percentile", col("l_quantity"), ps).as("q_q"),
      call_function("graft_percentile", col("l_extendedprice"), ps).as("q_ep"))

    if (plans) {
      println("========== fit_builtin ==========")
      println(builtin.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("========== fit_kernel ==========")
      println(kernel.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def run(label: String, plan: () => DataFrame): String = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        plan().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      f""""$label":{"first_s":${times.head}%.3f,"steady_s":${median(times.tail)}%.3f}"""
    }
    // parity assert before any timing: same three quantiles, bit-for-bit
    val b = builtin.head(); val k = kernel.head()
    require(b.getSeq[Double](0) == k.getSeq[Double](0) &&
      b.getSeq[Double](1) == k.getSeq[Double](1),
      s"kernel != builtin: $k vs $b")
    val rows = Seq("builtin" -> (() => builtin), "kernel" -> (() => kernel))
      .map { case (l, p) => run(l, p) }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"pctl_fit","sf":"$sfDir","reps":$reps,"sink":"noop","load_avg":$load%.2f,${rows.mkString(",")}}""")
    spark.stop()
  }
}
