package graft.streaming

import graft.SparkSpec
import graft.model.Lstm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import scala.jdk.CollectionConverters._

class StreamingDetectorSpec extends SparkSpec {
  import StreamingDetector._

  private val L = 4
  private val params = Lstm.glorotInit(2, units = Seq(4, 2, 2, 4), seed = 3L)

  private def row(k: String, t: Long): FeatureRow =
    FeatureRow(k, t, Seq(0.4 + 0.1 * math.sin(t.toDouble), 0.5))

  test("incremental windows: one scored window per row once the buffer fills") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FeatureRow]
    val scored = scoredWindows(input.toDS(), params, L, threshold = 1e9)
    val q = scored.writeStream.format("memory").queryName("scored1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L to 6L).map(t => row("a", t)))
      q.processAllAvailable()
      val out = spark.table("scored1").as[ScoredWindow].collect().sortBy(_.tsEnd)
      // 6 rows, L=4 → windows end at t=4,5,6
      assert(out.map(_.tsEnd).toSeq == Seq(4L, 5L, 6L))
      assert(out.forall(w => w.mse >= 0 && !w.isAnomaly))

      // next batch continues from state: one more row → one more window
      input.addData(Seq(row("a", 7L)))
      q.processAllAvailable()
      val out2 = spark.table("scored1").as[ScoredWindow].collect()
      assert(out2.map(_.tsEnd).sorted.toSeq == Seq(4L, 5L, 6L, 7L))
    } finally q.stop()
  }

  test("streaming windows equal the batch computation on the same series") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val series = (1L to 10L).map(t => row("k", t))
    val input = MemoryStream[FeatureRow]
    val scored = scoredWindows(input.toDS(), params, L, threshold = 1e9)
    val q = scored.writeStream.format("memory").queryName("scored2")
      .outputMode(OutputMode.Append()).start()
    try {
      // feed in two arbitrary chunks — state must bridge the batch boundary
      input.addData(series.take(5)); q.processAllAvailable()
      input.addData(series.drop(5)); q.processAllAvailable()
      val stream = spark.table("scored2").as[ScoredWindow].collect()
        .sortBy(_.tsEnd).map(w => (w.tsEnd, w.mse)).toSeq
      val batch = series.sliding(L).map { win =>
        val x = breeze.linalg.DenseMatrix.tabulate(L, 2)((i, j) => win(i).features(j))
        (win.last.tsSec, Lstm.mse(x, Lstm.forward(params, x)))
      }.toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("per-key state is independent; anomaly counter accumulates (ST4)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FeatureRow]
    val scored = scoredWindows(input.toDS(), params, L, threshold = 0.0) // all anomalous
    val q = scored.writeStream.format("memory").queryName("scored3")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L to 6L).flatMap(t => Seq(row("a", t), row("b", t))))
      q.processAllAvailable()
      val byKey = spark.table("scored3").as[ScoredWindow].collect()
        .groupBy(_.seriesKey)
      assert(byKey.keySet == Set("a", "b"))
      // each key saw 3 windows; its counter ends at 3 (not 6 — keys independent)
      assert(byKey("a").map(_.anomalyTotal).max == 3L)
      assert(byKey("b").map(_.anomalyTotal).max == 3L)
    } finally q.stop()
  }

  test("checkpoint recovery: kill and restart the stateful scoring query, " +
    "state and outputs survive exactly-once (ST4 crash-restart)") {
    // The real-world failure mode of a 30s-cadence deployment: the driver
    // dies mid-stream and the query restarts from its checkpoint. The
    // restarted query must (a) recover the trailing-window buffer AND the
    // running anomaly counter from the state store — not recompute from
    // scratch or emit duplicates — and (b) produce, across both lives,
    // exactly the outputs of an uninterrupted run.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val series = (1L to 10L).map(t => row("a", t))
    val input = MemoryStream[FeatureRow]
    // foreachBatch sink keyed by batchId: a replayed batch overwrites its
    // own slot, so the map holds each committed batch exactly once
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[ScoredWindow]]()
    def start() = scoredWindows(input.toDS(), params, L, threshold = 0.0)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[ScoredWindow], id: Long) =>
        got.put(id, ds.collect().toSeq); ()
      }
      .start()

    val q1 = start()
    try { input.addData(series.take(6)); q1.processAllAvailable() }
    finally q1.stop() // clean-stop life 1 after committing rows 1..6
    val afterLife1 = got.values().asScala.flatten.toSeq
    assert(afterLife1.map(_.tsEnd).sorted == Seq(4L, 5L, 6L), afterLife1.toString)

    input.addData(series.drop(6)) // arrives while the query is down
    val q2 = start()
    try { input.addData(Seq.empty[FeatureRow]); q2.processAllAvailable() }
    finally q2.stop()

    val out = got.values().asScala.flatten.toSeq.sortBy(_.tsEnd)
    // exactly one window per row once the buffer fills — no replays, no gaps
    assert(out.map(_.tsEnd) == (4L to 10L), out.map(_.tsEnd).toString)
    // threshold 0 → every window anomalous; a monotone 1..7 counter proves
    // the ST4 state crossed the restart (a reset would restart at 1)
    assert(out.map(_.anomalyTotal) == (1L to 7L), out.map(_.anomalyTotal).toString)
    // and the scores equal the uninterrupted batch computation — the
    // recovered buffer really held rows 5 and 6, not zero-padded state
    val batch = series.sliding(L).map { win =>
      val x = breeze.linalg.DenseMatrix.tabulate(L, 2)((i, j) => win(i).features(j))
      Lstm.mse(x, Lstm.forward(params, x))
    }.toSeq
    assert(out.map(_.mse) == batch)
  }

  test("windowed rates: watermark + event-time windows finalize and drop late rows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingDetector.windowedRates(
      input.toDF().toDF("ts", "alias", "value"),
      "ts", "alias", "value", "1 minute", "2 minutes")
    val q = agg.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Append()).start()
    def t(min: Int, sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    try {
      input.addData((t(0, 10), "m1", 2.0), (t(0, 50), "m1", 4.0), (t(1, 5), "m1", 8.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 10:01 windows
      input.addData((t(10, 0), "m1", 1.0))
      q.processAllAvailable()
      val rows = spark.table("rates").orderBy("ts").collect()
      assert(rows.length == 2) // finalized windows only
      assert(rows(0).getAs[Double]("v") == 3.0) // avg(2,4) in 10:00
      assert(rows(0).getAs[Long]("n") == 2L)
      assert(rows(1).getAs[Double]("v") == 8.0)
      // a row older than the watermark is dropped, closed windows stay final
      input.addData((t(0, 30), "m1", 100.0), (t(11, 0), "m1", 1.0))
      q.processAllAvailable()
      val after = spark.table("rates").orderBy("ts").collect()
      assert(after.count(_.getAs[java.sql.Timestamp]("ts").toString.contains("10:00")) == 1)
      assert(after.head.getAs[Double]("v") == 3.0) // unchanged by the late row
    } finally q.stop()
  }

  test("dedupStream: watermarked streaming dedup drops replayed keys, keeps state bounded") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val dd = StreamingDetector.dedupStream(
      input.toDF().toDF("ts", "k", "v"), "ts", "10 seconds", Seq("k"))
    val q = dd.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:${sec}%02d")
    try {
      // duplicate key "a" within the same batch and replayed in the next
      input.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(3), "b", 3.0))
      q.processAllAvailable()
      input.addData((t(4), "a", 4.0)) // replay within the watermark horizon
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
      assert(rows.map(_.getAs[String]("k")).sorted.toSeq == Seq("a", "b"),
        rows.mkString(","))
    } finally q.stop()
  }

  test("DSv2 source micro-batch: readStream over the Prometheus table (S1 streaming face)") {
    // Bounded historical range [0, 2h) with the canned fixture fetcher: one
    // AvailableNow replay must pull every (alias × chunk) cell through the
    // SAME chunk-grid partitions the batch scan plans, then terminate.
    graft.sources.CannedFetcher.reset()
    val df = spark.readStream
      .format("graft.sources.PrometheusDataSource")
      .option("url", "http://prom.test")
      .option("queries", "cpu=rate(cpu[1m]);mem=mem_free")
      .option("start", "0").option("end", (2 * 3600).toString)
      .option("step", "120").option("chunkHours", "1")
      .option("fetcher", classOf[graft.sources.CannedFetcher].getName)
      .load()
    assert(df.isStreaming)
    val q = df.writeStream
      .format("memory").queryName("prom_stream")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("prom_stream").collect()
    // 2 queries × 2 one-hour chunks × 30 points
    assert(rows.length == 2 * 2 * 30, s"got ${rows.length}")
    assert(graft.sources.CannedFetcher.count == 4)
    assert(rows.map(_.getAs[String]("alias")).toSet == Set("cpu", "mem"))
    // coerce-to-null decode carried over from the shared reader
    assert(rows.count(_.isNullAt(2)) == 2 * 2 * 6)
  }

  test("end-to-end incremental: DSv2 source micro-batch feeds stateful window scoring") {
    // The full streaming slice on one table abstraction: Prometheus DSv2
    // source → FeatureRow stream → flatMapGroupsWithState sliding windows →
    // scored rows. 1 h at 120 s step = 30 samples → 30−L+1 scored windows.
    graft.sources.CannedFetcher.reset()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = spark.readStream
      .format("graft.sources.PrometheusDataSource")
      .option("url", "http://prom.test")
      .option("queries", "cpu=rate(cpu[1m])")
      .option("start", "0").option("end", "3600")
      .option("step", "120").option("chunkHours", "1")
      .option("fetcher", classOf[graft.sources.CannedFetcher].getName)
      .load()
    val feats = src
      .select($"alias", unix_timestamp($"ts").as("tsSec"),
        coalesce($"value", lit(0.0)).as("v"))
      .as[(String, Long, Double)]
      .map { case (k, t, v) => FeatureRow(k, t, Seq(v / 100.0, 0.5)) }
    val scored = StreamingDetector.scoredWindows(feats, params, L,
      threshold = Double.MaxValue)
    val q = scored.writeStream
      .format("memory").queryName("e2e_stream")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // awaitTermination returns false on timeout without throwing — surface
    // that as the failure (not a misleading partial-count mismatch), and
    // never leak a running query into later suites
    try assert(q.awaitTermination(120000), "stream did not finish in 120s")
    finally q.stop()
    val out = spark.table("e2e_stream").collect()
    assert(out.length == 30 - L + 1, s"got ${out.length}")
    assert(out.forall(_.getAs[String]("seriesKey") == "cpu"))
    assert(out.forall(!_.getAs[Boolean]("isAnomaly")))
  }

  test("polling loop fed by the DSv2 source: fetch -> score end-to-end (ST1 + S1)") {
    graft.sources.CannedFetcher.reset()
    val cfg = graft.config.GraftConfig.fromYaml(
      "queries:\n  cpu: 'rate(cpu[1m])'\ndata_settings:\n  step: \"120\"\ntraining_settings:\n  sequence_length: 3\n")
    val exp = new graft.realtime.Exporter()
    val feats = cfg.featureColumns // cpu + day_of_week + hour_of_day
    val det = new graft.realtime.Detector(spark, cfg, exp,
      Some(graft.operators.Scalers.MinMaxScaler(feats,
        Seq.fill(feats.size)(0.0), Seq(100.0, 6.0, 23.0))),
      Some(Lstm.glorotInit(feats.size, Seq(4, 2, 2, 4), 1L)),
      // source-fed cycles must never re-fetch on their own
      (_, _, _) => sys.error("fetchWindow must not be called on the DSv2 path"))
    val q = StreamingDetector.startPollingDsv2(spark, det, Map(
      "url" -> "http://prom.test",
      "queries" -> "cpu=rate(cpu[1m])",
      "start" -> "0", "end" -> "3600",
      "step" -> "120", "chunkHours" -> "1",
      "maxSecondsPerBatch" -> "1200", // 3 capped micro-batches over [0, 3600)
      "fetcher" -> classOf[graft.sources.CannedFetcher].getName),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    try {
      // capped batches drain the bounded range over ~3 triggers; wait for
      // the cycle that scored the final window (maxTs 3480 + step = 3600)
      val deadline = System.currentTimeMillis() + 90000
      def done() = exp.render()
        .contains("last_successful_run_timestamp_seconds 3600\n")
      while (!done() && System.currentTimeMillis() < deadline) Thread.sleep(250)
      val rendered = exp.render()
      assert(rendered.contains("last_successful_run_timestamp_seconds 3600\n"),
        rendered)
      // the last cycle scored the trailing (L+2)-step window: samples at
      // t=3000 (null, dropped by inner align), 3120..3480 -> 4 points
      assert(rendered.contains("data_points_in_current_window 4\n"), rendered)
      assert(rendered.contains("latest_reconstruction_error_mse"), rendered)
      // the bounded range was fetched chunk-by-chunk through the fixture:
      // 3 capped batches x 1 alias, at least one chunk each
      assert(graft.sources.CannedFetcher.count >= 3,
        s"fetches=${graft.sources.CannedFetcher.count}")
    } finally q.stop()
  }

  test("polling shape: rate-source stream drives detection cycles (ST1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cfg = graft.config.GraftConfig.fromYaml(
      "queries:\n  m1: 'q'\ndata_settings:\n  step: \"60\"\ntraining_settings:\n  sequence_length: 3\n")
    val exp = new graft.realtime.Exporter()
    val feats = cfg.featureColumns
    val det = new graft.realtime.Detector(spark, cfg, exp,
      Some(graft.operators.Scalers.MinMaxScaler(feats,
        Seq.fill(feats.size)(0.0), Seq(1.0, 6.0, 23.0))),
      Some(Lstm.glorotInit(feats.size, Seq(4, 2, 2, 4), 1L)),
      (s, e, st) => (s until e by st).map(t => ("m1", t, 0.5)).toSeq
        .toDF("alias", "epoch", "value")
        .select($"alias", timestamp_seconds($"epoch").as("ts"), $"value"))
    val q = StreamingDetector.startPolling(spark, det, intervalSeconds = 1)
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (!exp.render().contains("latest_reconstruction_error_mse") &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(exp.render().contains("latest_reconstruction_error_mse"))
      assert(exp.render().contains("last_successful_run_timestamp_seconds"))
    } finally q.stop()
  }
}
