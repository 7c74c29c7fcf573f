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
  * Effective-cores channel (round-17 order #3): the 100× wall wandered
  * 326–384 s across rounds 14–16 with only `load_avg` to reason from —
  * the channel that closed the `q_neardup_clusters_dist` pricing case
  * (Bench scaladoc, round-16 order #2) now rides on flagship records
  * too. Every timed rep carries its own `eff_cores` (this JVM's process
  * CPU over the rep's wall — quota-location-independent: an
  * ancestor-held cpu.max caps the ratio even when the leaf cpu.stat
  * reads 0 throttles), each stage-ladder row carries the same pair, and
  * the record closes with a whole-window `ctx` (proc_cpu/wall/eff-cores,
  * load start+end, throttled_ms delta + which cpu.stat it came from).
  * With it, a wall drift is nameable env-vs-plan from the record alone:
  * plan regressions keep eff-cores flat while reps slow; external
  * load/quota shows up as depressed eff-cores at unchanged plans.
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

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // this JVM's own CPU clock (getrusage utime+stime) — no cgroup file
    // needed, so the ratio is honest wherever the quota sits (Bench's
    // round-16 order #2 channel, verbatim semantics)
    def processCpuSec(): Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        val ns = b.getProcessCpuTime
        if (ns < 0) -1.0 else ns / 1e9
      case _ => -1.0
    }
    def loadAvg(): Double = osBean.getSystemLoadAverage
    // throttled_ms from whichever cpu.stat is visible, named in the
    // record — a 0 here with depressed eff-cores is the ancestor-quota
    // signature the r16 QUOTAPROOF validated
    val cgroupStatPath: Option[String] =
      Seq("/sys/fs/cgroup/cpu.stat", "/sys/fs/cgroup/cpu/cpu.stat")
        .find(f => new java.io.File(f).exists())
    def throttledMs(): Double =
      try {
        cgroupStatPath.flatMap { f =>
          val src = scala.io.Source.fromFile(f)
          val lines = try src.getLines().toList finally src.close()
          lines.collectFirst {
            case l if l.startsWith("throttled_usec ") =>
              l.split("\\s+")(1).toDouble / 1e3
            case l if l.startsWith("throttled_time ") =>
              l.split("\\s+")(1).toDouble / 1e6
          }
        }.getOrElse(-1.0)
      } catch { case _: Throwable => -1.0 }

    // (wall s, eff-cores over the timed region, body result)
    def timeOnce(body: => Long): (Double, Double, Long) = {
      val c0 = processCpuSec()
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      val c1 = processCpuSec()
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      // both readings must be valid: a -1 sentinel on EITHER side would
      // otherwise emit a garbage negative ratio instead of -1
      val eff = if (c0 < 0 || c1 < 0 || dt <= 0) -1.0 else (c1 - c0) / dt
      (dt, eff, n)
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

    val loadStart = loadAvg()
    val throttleStart = throttledMs()
    val windowCpu0 = processCpuSec()
    val windowT0 = System.nanoTime()

    val runs = (1 to math.max(2, reps)).map { _ =>
      timeOnce(graft.Pipeline.flagship(spark, sfDir).count())
    }
    val first = runs.head._1
    val steady = median(runs.tail.map(_._1))
    // steady eff-cores pairs with the steady wall: median over tail reps
    val effSteady = median(runs.tail.map(_._2))
    val rows = runs.head._3
    val repsJson = runs
      .map { case (w, e, _) => f"""{"wall_s":$w%.3f,"eff_cores":$e%.2f}""" }
      .mkString("[", ",", "]")

    // cumulative-prefix ladder: stage i's own cost ≈ prefix(i) − prefix(i−1)
    // (composition effects included by construction — that is the point);
    // each row carries its own eff-cores so a slow stage is nameable
    // env-vs-plan per stage, not just per record
    val stages: Seq[(String, Double, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_FLAGSHIP_STAGES", "0") == "1")
        graft.Pipeline.flagshipPrefixes(spark, sfDir).map {
          case (name, mk) =>
            val (w, e, _) = timeOnce(materialize(mk()))
            (name, w, e)
        }
      else Seq.empty
    val stagesJson = stages
      .map { case (n, t, e) =>
        f""""$n":{"wall_s":$t%.3f,"eff_cores":$e%.2f}""" }
      .mkString("{", ",", "}")

    val windowWall = (System.nanoTime() - windowT0) / 1e9
    val windowCpu1 = processCpuSec()
    val windowCpu =
      if (windowCpu0 < 0 || windowCpu1 < 0) -1.0 else windowCpu1 - windowCpu0
    val windowEff =
      if (windowCpu < 0 || windowWall <= 0) -1.0 else windowCpu / windowWall
    val thrDelta = {
      val end = throttledMs()
      if (throttleStart < 0 || end < 0) -1.0 else end - throttleStart
    }
    val ctx = f"""{"proc_cpu_s":$windowCpu%.1f,"wall_s":$windowWall%.1f,"effective_cores":$windowEff%.2f,"load_avg_start":$loadStart%.2f,"load_avg_end":${loadAvg()}%.2f,"throttled_ms":$thrDelta%.1f,"cgroup_path":"${cgroupStatPath.getOrElse("none")}","procs":${Runtime.getRuntime.availableProcessors}}"""
    // fmt 2 since r17: top-level load_avg moved into ctx (start/end) and
    // stage_prefix_s values became {wall_s, eff_cores} objects — tooling
    // that parses pre-r17 records can dispatch on this field
    println(f"""{"probe":"flagship","fmt":2,"sf":"$sfDir","rows":$rows,"first_s":$first%.3f,"steady_s":$steady%.3f,"steady_eff_cores":$effSteady%.2f,"reps":${runs.size},"rep_detail":$repsJson,"stage_prefix_s":$stagesJson,"ctx":$ctx}""")
    spark.stop()
  }
}
