package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line over SparkEntry.queries (driver contract).
  *
  * Each query runs `SPARK_GRAFT_REPS` times (default 2): the first rep pays
  * codegen/JIT (Janino compiles, whole-stage fusion, C2 warmup), the
  * remaining reps are steady state and the recorded steady number is their
  * MEDIAN. The driver contract field `queries` carries the steady numbers
  * (and `value` their total) because round-over-round comparisons on
  * first-run numbers chase JIT placement noise (BASELINE.md documents an
  * unchanged q1_agg swinging 1.28→2.93 s between adjacent solo runs) — and
  * the round-6 record showed even a SINGLE steady rep can land 4× hot when
  * the machine is contended, so certification runs use REPS≥4 (median of
  * ≥3 steady reps). `queries_first`/`value_first` preserve the first-run
  * numbers for cold-start analysis.
  *
  * The Spark cache is cleared between reps: query builders may cache
  * intermediates, and CacheManager matches by logical plan, so without the
  * clear a later rep would silently reuse earlier blocks and measure
  * nothing. (The one-shot operators now localCheckpoint instead — rebuilt
  * fresh per rep — but the clear stays as a fence.)
  *
  * The JSON carries a `ctx` object (load average at start/end, available
  * processors, max heap, rep count) so a hot record is attributable to
  * machine contention WITHOUT a re-run — the round-6 official record was
  * 1.67× the committed run of identical code and nothing in the artifact
  * could say why.
  *
  * Failures are reported per-query (`"failed":[...]`) instead of silently
  * contributing wall time; a failed query also forces rc 1.
  *
  * Two subtotals (round-9 verdict item 2): `oracle_total` (= `value`, the
  * oracle-green registry as-is) and `production_total` (same workload with
  * each md5-parity row's steady time replaced by its xxhash/float
  * production twin from `Queries.benchOnly`, whose per-query times ride in
  * `queries_bench_only`). The heaviest registry rows pay md5-per-shingle
  * so DuckDB can replay them; the production subtotal is what a user of
  * the library pays. A GC fence before each binary-payload rep keeps the
  * media queries' session numbers attributable (see `gcBarrier`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // Session warmup: the first Spark job pays scan-init + codegen baseline
    // (~5 s) that would otherwise be attributed to whichever query runs
    // first; run one throwaway job per base table shape before timing.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()
      Tables.events(spark, sfDir).limit(100).count()
    } catch { case _: Throwable => () }

    var failed = List.empty[String]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        if (!failed.contains(name)) failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop plan-matched cache entries so the next rep re-executes; persisted
      // intermediates otherwise satisfy the second rep's identical subtrees.
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      dt
    }
    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    // Binary-payload family: decoded media batches (tens of MB per task)
    // promote into the old gen during whatever ran before, and the sf1
    // session record showed q_vhash at 12.6x in-session vs 3.2x solo —
    // GC pressure inherited from neighbors, not the query's own cost. A
    // full System.gc() fence before each rep keeps session records
    // attributable to the query (disable: SPARK_GRAFT_GC_BARRIER=0).
    val gcBarrier = sys.env.getOrElse("SPARK_GRAFT_GC_BARRIER", "1") != "0"
    def isBinaryFamily(name: String): Boolean =
      name.startsWith("q_mm_") || name.startsWith("q_phash") ||
      name.startsWith("q_ahash") || name.startsWith("q_vhash")
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, Double, Double) = {
      def fence(): Unit = if (gcBarrier && isBinaryFamily(name)) {
        System.gc(); Thread.sleep(50)
      }
      fence()
      val first = timeOnce(name, fn)
      // iterator, not Range: the failure check must run BEFORE each rep,
      // so a mid-sequence steady-rep crash skips the remaining reps
      val steadies = Iterator.range(2, reps + 1)
        .takeWhile(_ => !failed.contains(name))
        .map { _ => fence(); timeOnce(name, fn) }.toSeq
      // a steady-rep failure would otherwise record its time-to-crash as
      // the "steady" number — fall back to the valid first-rep measurement
      val steady =
        if (failed.contains(name) || steadies.isEmpty) first
        else median(steadies)
      (name, first, steady)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => measure(name, fn)
    }
    // Production twins run AFTER the registry (same session, same rep
    // discipline) so the registry's cross-round comparability is untouched.
    val twinResults = Queries.benchOnly.toSeq.sortBy(_._1).map {
      case (name, fn) => measure(name, fn)
    }
    val loadEnd = osBean.getSystemLoadAverage
    def jmapOf(rs: Seq[(String, Double, Double)])(
        sel: ((String, Double, Double)) => Double): String =
      rs.map { r => "\"" + r._1 + "\":" + sel(r) }.mkString("{", ",", "}")
    def jmap(sel: ((String, Double, Double)) => Double): String =
      jmapOf(results)(sel)
    val qsSteady = jmap(_._3)
    val qsFirst = jmap(_._2)
    val qsTwins = jmapOf(twinResults)(_._3)
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val totalSteady = results.map(_._3).sum
    val totalFirst = results.map(_._2).sum
    // oracle_total = the registry as-is (every row oracle-green, some
    // paying cross-engine digest parity); production_total = the same
    // workload with each md5-parity row's time replaced by its xxhash/
    // float production twin's — the subtotal a production user of the
    // library actually pays. Both appear in every record so the 2x gate
    // discussion can cite either without a re-run.
    val steadyByName = results.map(r => r._1 -> r._3).toMap
    val productionTotal = totalSteady -
      Queries.productionSubstitutes.valuesIterator
        .map(md5 => steadyByName.getOrElse(md5, 0.0)).sum +
      twinResults.map(_._3).sum
    val ctx = {
      val heapGb = Runtime.getRuntime.maxMemory / 1e9
      // Locale.ROOT: the default-locale f-interpolator would render 1,42
      // under comma-decimal locales — invalid JSON
      def d2(x: Double) = String.format(java.util.Locale.ROOT, "%.2f",
        java.lang.Double.valueOf(x))
      def d1(x: Double) = String.format(java.util.Locale.ROOT, "%.1f",
        java.lang.Double.valueOf(x))
      s"""{"load_avg_start":${d2(loadStart)},"load_avg_end":${d2(loadEnd)},"procs":${Runtime.getRuntime.availableProcessors},"heap_max_gb":${d1(heapGb)},"reps":$reps}"""
    }
    val json =
      s"""{"metric":"total_steady","value":$totalSteady,"unit":"sec","queries":$qsSteady,"value_first":$totalFirst,"queries_first":$qsFirst,"oracle_total":$totalSteady,"production_total":$productionTotal,"queries_bench_only":$qsTwins,"failed":$fs,"sf":"$sfDir","ctx":$ctx}"""
    println(json)
    // Also persist to a file: log captures of the stdout line have truncated
    // the head of long JSON lines, losing the alphabetically-first per-query
    // timings — the file copy is always fully parseable.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
