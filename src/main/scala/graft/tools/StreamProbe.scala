package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming._

/** Dev tool: MEASURE Structured Streaming throughput for the stateful
  * operator family (sessions, rates/EWMA, dedup-at-ingest, reference
  * drift) over the real testdata, instead of arguing it from state-shape
  * alone. The batch-parity specs pin semantics; this pins rates.
  *
  * Protocol (mirrors the batch bench's steady discipline):
  *  - the source table is staged once as a `files`-file parquet dir under
  *    `.scratch/streamprobe/` (default 200), and each operator streams it
  *    with `maxFilesPerTrigger=2` → `files`/2 micro-batches per run
  *    (default 100) — a real incremental consumption, not one giant
  *    batch;
  *  - sink is `noop`, trigger `AvailableNow`, so wall time is operator +
  *    state-store cost, not sink I/O;
  *  - every operator runs TWICE (fresh checkpoint each rep) and the
  *    recorded number is the STEADY second rep (first-rep JIT/codegen
  *    inflation hits streaming harder than batch — each micro-batch
  *    replans);
  *  - reported per op: input rows, wall s, rows/s, micro-batches,
  *    batch-latency avg/p95 ms, and the engine's own `stateOperators`
  *    state rows at the HALFWAY batch and at the END — the growth curve
  *    that must track ACTIVE KEYS, not stream length, for the 100 TB
  *    story to hold (state_rows_end ≈ state_rows_mid on a key-bounded
  *    operator once all keys have appeared).
  *
  * Usage:
  * {{{ runMain graft.tools.StreamProbe <sfDir> [op,...|all] [files] }}} */
object StreamProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamProbe <sfDir> [op,...]")
    val sfDir = args(0)
    val only: Set[String] =
      if (args.length > 1 && args(1) != "all")
        args(1).split(",").map(_.trim).toSet
      else Set.empty
    val files = if (args.length > 2) args(2).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Round-14 order #2 knobs — the streaming state-commit floor is
    // per-STATE-PARTITION per micro-batch (each partition opens, updates
    // and commits its store every batch, data or not), so the floor
    // scales with shuffle partitions, not rows. The probe family's
    // active-key counts are 100–85k: 32 state partitions is provisioning
    // for a 32-core BATCH shuffle, not for per-batch commit cost.
    //  - SPARK_GRAFT_STREAM_PARTS: shuffle/state partitions for the
    //    probe session (fresh checkpoints per rep, so the setting binds);
    //  - SPARK_GRAFT_STATE_PROVIDER=rocksdb: the RocksDB state store
    //    (changelog-free local instances) vs the default HDFS-backed one.
    val streamParts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", cpus)
    val provider = sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
    // Round-15 order #5: the USER-FACING path to the r14 state-partition
    // finding — leave the session at its batch setting and pin the state
    // partition count per query through StreamingConf.withStatePartitions
    // (the knob the streaming API ships). STREAM_PARTS above re-sizes the
    // whole session instead (the r14 probe protocol); this proves the two
    // paths price identically.
    val apiParts: Option[Int] =
      sys.env.get("SPARK_GRAFT_STREAM_API_PARTS").map(_.toInt)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", streamParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tag = new java.io.File(sfDir).getName
    val stageRoot = s".scratch/streamprobe/$tag-f$files"

    // ---- stage sources: normalized tables as 16-file parquet dirs ----
    def stage(name: String, df: => DataFrame): String = {
      val path = s"$stageRoot/$name"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        df.repartition(files).write.mode("overwrite").parquet(path)
      }
      path
    }
    // events: ts normalized to a plain UTC timestamp for the watermark
    val eventsPath = stage("events",
      graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts_us"),
          col("ts").cast("timestamp").as("ts")))
    val docsPath = stage("documents",
      graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text")))
    val embPath = stage("embeddings",
      graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")))
    // semdedup's quantizer bits: frozen at the corpus's auto-bits capacity
    // (the batch rule, graft.Queries.AutoBitsTargetCell — the SINGLE
    // definition; a probe-local 64 would silently desync from the
    // batch/oracle contract if the constant ever moved) BEFORE the stream
    // starts — one count job
    lazy val semBits = graft.sim.Ann.autoBits(
      spark.read.parquet(embPath).count(),
      targetCell = graft.Queries.AutoBitsTargetCell)

    // builders take the session to read from: the state-partition knob
    // hands each query a conf-scoped session CLONE, and the stateful
    // operator's partition count pins from df.sparkSession's conf — a
    // stream built from the parent session would silently ignore the
    // knob (StreamingConf scaladoc, round-16 order #6)
    def stream(s: SparkSession, path: String): DataFrame =
      s.readStream
        .schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(path)

    // drift's frozen reference: the corpus head vocabulary (top 1000
    // tokens), collected once from the batch table — vocabulary-sized by
    // construction, the broadcastable side
    lazy val refVocab: Map[String, Long] =
      graft.Tables.documents(spark, sfDir)
        .select(explode(graft.text.TextStats.tokens(lower(col("text")))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    lazy val refTotal: Long = refVocab.values.sum

    def sampleStream(s: SparkSession)
        : org.apache.spark.sql.Dataset[StreamingRates.Sample] =
      stream(s, eventsPath).select(
          concat(lit("u"), col("user_id")).as("key"),
          col("ts_us").as("tsUs"),
          (col("value") * 1000).cast("long").as("v"),
          col("event_id").as("seq"))
        .as[StreamingRates.Sample]

    val ops: Seq[(String, SparkSession => DataFrame)] = Seq(
      // the probe's own floor: a stateless one-column projection through
      // the same source/trigger/sink — what 100 micro-batches of replan +
      // scheduling + state-store-free execution cost, the baseline every
      // stateful row's wall should be read against (per-batch operator
      // cost = row wall − this wall, per-batch)
      "floor" -> (s => stream(s, docsPath).select(col("doc_id"))),
      "sessions" -> (s =>
        StreamingSessions.sessionize(stream(s, eventsPath),
          "user_id", "ts", gap = "30 minutes", watermark = "10 minutes")),
      "counter_rate" -> (s =>
        StreamingRates.counterRate(sampleStream(s)).toDF),
      "ewma" -> (s => StreamingRates.ewma(sampleStream(s), 0.3).toDF),
      "zscore" -> (s =>
        StreamingRates.zscore(sampleStream(s), rangeUs = 600L * 1000000).toDF),
      "dedup_ingest" -> (s =>
        StreamingDedup.nearDupCandidates(stream(s, docsPath),
          "doc_id", "text").toDF),
      // the PRODUCTION posture of dedup-at-ingest: bucket state is
      // TTL-evicted (idle buckets dropped wholesale), so state tracks
      // RECENTLY-ACTIVE buckets instead of growing with stream length —
      // ttlMs=0 above measures the by-definition-unbounded exact path,
      // this row measures the bounded one (round-13 order; semantics
      // pinned by StreamingDedupSpec's TTL tests). Needs the manual-stop
      // run path: with timeouts armed the engine schedules empty batches
      // forever (nearDupCandidates scaladoc), so AvailableNow never
      // self-terminates.
      "dedup_ingest_ttl" -> (s =>
        StreamingDedup.nearDupCandidates(stream(s, docsPath),
          "doc_id", "text", ttlMs = 10000L).toDF),
      "semdedup" -> (s =>
        StreamingSemDedup.admittedStream(stream(s, embPath),
          "vec_id", "embedding", threshold = 0.30, bits = semBits).toDF),
      "drift" -> (s => {
        val ref = refVocab; val n = refTotal // force before the stream starts
        StreamingDrift.drift(
          stream(s, docsPath).select(col("source"),
              graft.text.TextStats.tokens(lower(col("text"))).as("tokens"),
              col("doc_id").as("seq"))
            .as[StreamingDrift.Doc], ref, n).toDF
      }))

    // Ops whose query NEVER self-terminates under AvailableNow: an armed
    // processing-time timeout makes the engine schedule empty batches
    // forever to fire future timeouts, so awaitTermination would hang
    // (measured: 25 min of ~1 s empty batches before this path existed).
    // These are run to data completion — consumed rows polled against the
    // staged source count — and stopped explicitly; wall is the time to
    // consume all staged rows, directly comparable to the self-
    // terminating rows' wall. Timeout-only batches carry zero input rows
    // and are already excluded from the rows/latency/state series.
    val manualStop = Set("dedup_ingest_ttl")
    val sourceOf = Map(
      "dedup_ingest_ttl" -> docsPath)
    val srcCount = scala.collection.mutable.Map.empty[String, Long]
    def expectedRows(path: String): Long =
      srcCount.getOrElseUpdate(path, spark.read.parquet(path).count())

    final case class Run(wall: Double, rows: Long, batches: Int,
                         latAvgMs: Double, latP95Ms: Double,
                         stateMid: Long, stateEnd: Long,
                         statePartsPinned: Long)
    // Progress accounting rides a StreamingQueryListener, NOT
    // `q.recentProgress`: that is a ring buffer capped by
    // spark.sql.streaming.numRecentProgressUpdates, and the manual-stop
    // ops emit an unbounded tail of timeout-only EMPTY batches that can
    // evict the data batches — `consumed` then never reaches `expected`
    // and the probe spins to its deadline (round-14 ADVICE, medium). The
    // listener sees every progress event exactly once; data batches
    // (numInputRows > 0) are kept for the rows/latency/state series.
    final class ProgressTap extends org.apache.spark.sql.streaming
        .StreamingQueryListener {
      val dataBatches = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Double, Long)]() // (rows, batchDurationMs, stateRowsMax)
      @volatile var consumed = 0L
      // the ENGINE's own state-store partition count, not the env echo:
      // proof in the record that the clone-scoped knob actually pinned
      // (StateOperatorProgress.numShufflePartitions; -1 = stateless op)
      @volatile var statePartsPinned = -1L
      override def onQueryStarted(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) {
          consumed += p.numInputRows
          dataBatches.add((p.numInputRows, p.batchDuration.toDouble,
            p.stateOperators.map(_.numRowsTotal).foldLeft(0L)(math.max)))
        }
        if (p.stateOperators.nonEmpty)
          statePartsPinned = p.stateOperators.head.numShufflePartitions
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    def runOnce(name: String, build: SparkSession => DataFrame): Run = {
      val ckpt = graft.Queries.scratchDir(s"streamprobe-$name-")
      val tap = new ProgressTap
      val t0 = System.nanoTime()
      // the progress listener is per-SESSION (each StreamingQueryManager
      // only sees its own runIds), so it must register on the SAME
      // session the query starts from — the conf-scoped clone when the
      // knob is in play, the parent otherwise
      var tapSession: SparkSession = spark
      def startQuery(s: SparkSession) = {
        tapSession = s
        s.streams.addListener(tap)
        build(s).writeStream
          .format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      val q = apiParts.fold(startQuery(spark))(n =>
        graft.streaming.StreamingConf.withStatePartitions(spark, n)(
          startQuery _))
      try {
        if (manualStop(name)) {
          val expected = expectedRows(sourceOf(name))
          val deadline = System.nanoTime() + 30L * 60 * 1000000000L
          while (q.isActive && tap.consumed < expected &&
              System.nanoTime() < deadline)
            Thread.sleep(100)
          require(tap.consumed >= expected,
            s"$name: only ${tap.consumed}/$expected rows consumed before deadline")
        } else q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        if (manualStop(name)) q.stop()
        // listener events post asynchronously — drain until the series is
        // stable so the LAST data batch is in it before we summarize
        var last = -1
        var stable = 0
        while (stable < 5) { // 5 × 100 ms of no growth
          val n = tap.dataBatches.size
          if (n == last) stable += 1 else { stable = 0; last = n }
          Thread.sleep(100)
        }
        import scala.jdk.CollectionConverters._
        val progress = tap.dataBatches.asScala.toVector
        val rows = progress.map(_._1).sum
        val lats = progress.map(_._2).sorted
        val latAvg = if (lats.isEmpty) 0.0 else lats.sum / lats.length
        val latP95 =
          if (lats.isEmpty) 0.0
          else lats(math.min(lats.length - 1, (lats.length * 95) / 100))
        val states = progress.map(_._3)
        val stateMid = if (states.isEmpty) 0L else states(states.length / 2)
        val stateEnd = if (states.isEmpty) 0L else states.last
        Run(wall, rows, progress.length, latAvg, latP95, stateMid, stateEnd,
          tap.statePartsPinned)
      } finally tapSession.streams.removeListener(tap)
    }

    val results = ops
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, build) =>
        val _ = runOnce(name, build) // rep 1: JIT/codegen warm-up
        val r = runOnce(name, build)
        val line = f"""{"op":"$name","rows":${r.rows},"wall_s":${r.wall}%.3f,""" +
          f""""rows_per_s":${r.rows / r.wall}%.0f,"batches":${r.batches},""" +
          f""""batch_ms_avg":${r.latAvgMs}%.0f,"batch_ms_p95":${r.latP95Ms}%.0f,""" +
          f""""state_rows_mid":${r.stateMid},"state_rows_end":${r.stateEnd},""" +
          f""""state_parts_pinned":${r.statePartsPinned}}"""
        println(line)
        line
      }
    println(s"""{"probe":"streaming","sf":"$sfDir","files":$files,"state_parts":$streamParts,"api_state_parts":${apiParts.getOrElse(-1)},"provider":"$provider","ops":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
