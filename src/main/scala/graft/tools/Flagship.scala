package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: bank a WALL-TIME number for the composed flagship pipeline
  * (`Pipeline.flagship`: align → fill → scale → window → LSTM score →
  * anomaly stats — the driver-contract `entry()` body) at an arbitrary
  * scale directory. Round-14 order #3: every registry ROW is
  * scale-certified, but the end-to-end COMPOSITION had no banked number
  * above the sf0.001 smoke — this runs it with the bench's rep
  * discipline (first rep pays codegen/JIT, steady = median of the rest;
  * cache cleared between reps) and prints one JSON line.
  *
  * Per-stage attribution: `SPARK_GRAFT_FLAGSHIP_STAGES=1` additionally
  * times a cumulative-prefix ladder (minute-agg → +fill → +align →
  * +scale → +window → +score+stats ≡ full) on ONE extra rep each, so the
  * record names the dominant stage without a profiler. Each prefix is
  * MATERIALIZED through the noop sink, not count()ed: count() lets
  * Catalyst prune unreferenced window projections, so a bare-count
  * ladder silently defers the fill/window cost to the first prefix that
  * references the columns — the r14 record priced 'fill' BELOW
  * 'minute_agg', impossible for a true cumulative ladder (round-15
  * ADVICE, medium; same trap as `tools/CountPlanProbe` documents). The
  * full-pipeline wall above is unaffected: its final aggregate
  * references every upstream column.
  *
  * Usage: {{{ runMain graft.tools.Flagship <sfDir> [reps] }}} */
object Flagship {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Flagship <sfDir> [reps]")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same session warmup as Bench: scan-init + codegen baseline off the
    // first timed rep
    try { graft.Tables.events(spark, sfDir).limit(100).count() }
    catch { case _: Throwable => () }

    def timeOnce(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      (dt, n)
    }
    // full materialization: every output column reaches the sink, so no
    // prefix can shed its window/fill cost to a later one (scaladoc)
    def materialize(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    val runs = (1 to math.max(2, reps)).map { _ =>
      timeOnce(graft.Pipeline.flagship(spark, sfDir).count())
    }
    val first = runs.head._1
    val steady = median(runs.tail.map(_._1))
    val rows = runs.head._2

    // cumulative-prefix ladder: stage i's own cost ≈ prefix(i) − prefix(i−1)
    // (composition effects included by construction — that is the point)
    val stages: Seq[(String, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_FLAGSHIP_STAGES", "0") == "1")
        graft.Pipeline.flagshipPrefixes(spark, sfDir).map {
          case (name, mk) => name -> timeOnce(materialize(mk()))._1
        }
      else Seq.empty
    val stagesJson = stages
      .map { case (n, t) => f""""$n":$t%.3f""" }.mkString("{", ",", "}")
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"flagship","sf":"$sfDir","rows":$rows,"first_s":$first%.3f,"steady_s":$steady%.3f,"reps":${runs.size},"load_avg":$load%.2f,"stage_prefix_s":$stagesJson}""")
    spark.stop()
  }
}
