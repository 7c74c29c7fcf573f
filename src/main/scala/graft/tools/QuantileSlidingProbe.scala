package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round-16): materialized (noop-sink) price of the two exact
  * `quantile_over_time` plans on the q_quantile_ot shape — the registry's
  * `percentile().over(rows frame)` (re-aggregates the frame per row; the
  * row's 33× count-vs-noop divergence) vs
  * `Rates.quantileOverTimeSliding` (one pass, frame-bounded
  * order-statistics buffer). Both exact, spec-pinned bit-identical
  * (RatesSpec); this banks the promotion evidence the un-registered twin
  * needs for a round-17 noop-vs-noop swap decision.
  *
  * Usage: {{{ runMain graft.tools.QuantileSlidingProbe <sfDir> [reps] }}} */
object QuantileSlidingProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QuantileSlidingProbe <sfDir> [reps]")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
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
    try { graft.Tables.events(spark, sfDir).limit(100).count() }
    catch { case _: Throwable => () }

    def milliEv: DataFrame = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us"), col("event_id"),
        expr("cast(round(value * 1000) as long)").as("v"))
    // both emit the registry row's exact projection
    def windowPlan: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us", "event_id")
        .rowsBetween(-49, 0)
      milliEv.withColumn("med_ot",
          round(percentile(col("v"), lit(0.5)).over(w) / 1000.0, 6))
        .select("event_type", "ts_us", "event_id", "med_ot")
    }
    def slidingPlan: DataFrame =
      graft.operators.Rates.quantileOverTimeSliding(milliEv, "event_type",
          Seq("ts_us", "event_id"), "v", frameRows = 50, p = 0.5)
        .withColumn("med_ot", round(col("q_ot") / 1000.0, 6))
        .select("event_type", "ts_us", "event_id", "med_ot")

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
      val steady = median(times.tail)
      f""""$label":{"first_s":${times.head}%.3f,"steady_s":$steady%.3f}"""
    }
    val rows = Seq("window" -> (() => windowPlan),
      "sliding" -> (() => slidingPlan)).map { case (l, p) => run(l, p) }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"quantile_sliding","sf":"$sfDir","reps":$reps,"sink":"noop","load_avg":$load%.2f,${rows.mkString(",")}}""")
    spark.stop()
  }
}
