package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round-15 order #6): the flagship's 100× wall is 84% the
  * LSTM scoring stage (`Pipeline.scoreWindows` — map-only, broadcast
  * weights). This measures that stage ALONE at several feed widths
  * (multiples of defaultParallelism) over the SAME frozen window set,
  * so the record shows whether throughput flattens exactly at the core
  * count — the signature of a stage with nothing hidden serializing —
  * or keeps moving with width, the signature of skew or a serial
  * segment the width papers over.
  *
  * Protocol: the window feed (everything upstream of scoring) is built
  * once and localCheckpointed — each width times ONLY the
  * repartition + forward pass + the flagship's stats tail, against
  * identical input blocks. Per width: first rep pays codegen, steady =
  * median of the remaining reps (the bench discipline).
  *
  * Usage: {{{ runMain graft.tools.ScoreScaleProbe <sfDir> [mults] [reps] }}}
  * e.g. `ScoreScaleProbe /root/testdata/sf10 1,2,4 3`. */
object ScoreScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScoreScaleProbe <sfDir> [mults] [reps]")
    val sfDir = args(0)
    val mults = (if (args.length > 1) args(1) else "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
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
    spark.sparkContext.setLogLevel("WARN")
    try { graft.Tables.events(spark, sfDir).limit(100).count() }
    catch { case _: Throwable => () }

    // freeze the scoring input: the flagship ladder's "window" prefix,
    // cut to the score stage's exact feed columns, pinned in block
    // storage so every width reads identical input
    val feed = graft.Pipeline.flagshipPrefixes(spark, sfDir)
      .find(_._1 == "window").get._2()
      .select("window_id", "window")
      .localCheckpoint(true)
    val nWindows = feed.count()
    val types = graft.Tables.EventTypes
    val params = graft.model.Lstm.glorotInit(types.size, seed = 42L)
    val base = spark.sparkContext.defaultParallelism

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def timeOnce(parts: Int): Double = {
      val t0 = System.nanoTime()
      // ONE forward pass (round-16 ADVICE): uncached, `scored` would be
      // recomputed by both consumers below and windows_per_s would
      // understate single-pass throughput ~2× (the r15 banked curve has
      // this double-pass shape — cross-width SHAPE unaffected, absolute
      // level now honest). localCheckpoint is eager, so the pass runs
      // here; the (window_id, mse) blocks are 2 numbers/row and are
      // released by the ContextCleaner when the rep's RDD unroots.
      val scored = graft.Pipeline.scoreWindows(spark, feed, types, params,
        numParts = Some(parts)).localCheckpoint(true)
      // the flagship's stats tail rides along so the timed region is the
      // real score_stats prefix delta, not a bare count of mse rows
      val thr = scored.stat.approxQuantile("mse", Array(0.95), 0.0).head
      graft.operators.Score.anomalyStats(scored, "mse", thr).count()
      (System.nanoTime() - t0) / 1e9
    }

    val rows = mults.map { m =>
      val parts = base * m
      val runs = (1 to math.max(2, reps)).map(_ => timeOnce(parts))
      val steady = median(runs.tail)
      f""""x$m":{"parts":$parts,"first_s":${runs.head}%.3f,"steady_s":$steady%.3f,"windows_per_s":${nWindows / steady}%.0f}"""
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"score_scale","sf":"$sfDir","windows":$nWindows,"base_parts":$base,"reps":$reps,"load_avg":$load%.2f,"widths":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
