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
  *  - the source table is staged once as a 16-file parquet dir under
  *    `.scratch/streamprobe/`, and each operator streams it with
  *    `maxFilesPerTrigger=2` → 8 micro-batches per run — a real
  *    incremental consumption, not one giant batch;
  *  - sink is `noop`, trigger `AvailableNow`, so wall time is operator +
  *    state-store cost, not sink I/O;
  *  - every operator runs TWICE (fresh checkpoint each rep) and the
  *    recorded number is the STEADY second rep (first-rep JIT/codegen
  *    inflation hits streaming harder than batch — each micro-batch
  *    replans);
  *  - reported per op: input rows, wall s, rows/s, micro-batches, and
  *    peak state rows from the engine's own `stateOperators` metrics —
  *    the number that must track ACTIVE KEYS, not stream length, for the
  *    100 TB story to hold.
  *
  * Usage: {{{ runMain graft.tools.StreamProbe /root/testdata/sf0.1 }}} */
object StreamProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamProbe <sfDir> [op,...]")
    val sfDir = args(0)
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
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
    import spark.implicits._

    val tag = new java.io.File(sfDir).getName
    val stageRoot = s".scratch/streamprobe/$tag"

    // ---- stage sources: normalized tables as 16-file parquet dirs ----
    def stage(name: String, df: => DataFrame): String = {
      val path = s"$stageRoot/$name"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        df.repartition(16).write.mode("overwrite").parquet(path)
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

    def stream(path: String): DataFrame =
      spark.readStream
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

    def sampleStream(): org.apache.spark.sql.Dataset[StreamingRates.Sample] =
      stream(eventsPath).select(
          concat(lit("u"), col("user_id")).as("key"),
          col("ts_us").as("tsUs"),
          (col("value") * 1000).cast("long").as("v"),
          col("event_id").as("seq"))
        .as[StreamingRates.Sample]

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "sessions" -> (() =>
        StreamingSessions.sessionize(stream(eventsPath),
          "user_id", "ts", gap = "30 minutes", watermark = "10 minutes")),
      "counter_rate" -> (() => StreamingRates.counterRate(sampleStream()).toDF),
      "ewma" -> (() => StreamingRates.ewma(sampleStream(), 0.3).toDF),
      "dedup_ingest" -> (() =>
        StreamingDedup.nearDupCandidates(stream(docsPath),
          "doc_id", "text").toDF),
      "drift" -> (() => {
        val ref = refVocab; val n = refTotal // force before the stream starts
        StreamingDrift.drift(
          stream(docsPath).select(col("source"),
              graft.text.TextStats.tokens(lower(col("text"))).as("tokens"),
              col("doc_id").as("seq"))
            .as[StreamingDrift.Doc], ref, n).toDF
      }))

    def runOnce(name: String, build: () => DataFrame): (Double, Long, Int, Long) = {
      val ckpt = graft.Queries.scratchDir(s"streamprobe-$name-")
      val t0 = System.nanoTime()
      val q = build().writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress
      val rows = progress.map(_.numInputRows).sum
      val batches = progress.count(_.numInputRows > 0)
      val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
      (wall, rows, batches, stateRows)
    }

    val results = ops
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, build) =>
        val _ = runOnce(name, build) // rep 1: JIT/codegen warm-up
        val (wall, rows, batches, stateRows) = runOnce(name, build)
        val line = f"""{"op":"$name","rows":$rows,"wall_s":$wall%.3f,""" +
          f""""rows_per_s":${rows / wall}%.0f,"batches":$batches,""" +
          f""""state_rows":$stateRows}"""
        println(line)
        line
      }
    println(s"""{"probe":"streaming","sf":"$sfDir","ops":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
