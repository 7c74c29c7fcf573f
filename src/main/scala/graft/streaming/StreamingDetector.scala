package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import breeze.linalg.DenseMatrix

import graft.model.Lstm
import graft.realtime.Detector

/** Structured Streaming surface for the realtime stage.
  *
  * Two shapes, matching SURVEY §2.8:
  *
  *  1. [[startPolling]] — the faithful port of the reference's 30 s poll
  *     loop (`realtime_detector.py:392-398`): a rate source fires
  *     `Trigger.ProcessingTime` microbatches and `foreachBatch` runs one
  *     stateless detection cycle (ST1/ST2). The stream is pure clockwork;
  *     each cycle re-fetches its own window, exactly like the reference.
  *
  *  2. [[scoredWindows]] — the genuinely incremental upgrade path: a long
  *     stream of per-series feature rows is bucketed per series key and a
  *     `flatMapGroupsWithState` keeps the trailing (L−1)-row buffer as
  *     explicit state, emitting one scored window per arriving row (W2 in
  *     streaming form + M4 scoring + P8 classification). State size is
  *     O(L · F) per key regardless of stream length — the 100 TB-safe
  *     shape, since each key's state and compute are independent and
  *     Spark shards keys across executors.
  */
object StreamingDetector {

  /** Shape 1: rate-source clock → foreachBatch polling cycles (ST1). */
  def startPolling(spark: SparkSession, detector: Detector,
                   intervalSeconds: Int): StreamingQuery = {
    spark.readStream
      .format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .outputMode(OutputMode.Append())
      .foreachBatch { (_: Dataset[org.apache.spark.sql.Row], _: Long) =>
        detector.runCycle(System.currentTimeMillis() / 1000)
        ()
      }
      .start()
  }

  /** Shape 1b: the polling loop fed BY the DSv2 Prometheus source — the
    * metric stream reads through `PromMicroBatchStream` (same table
    * abstraction as the batch scan, offsets tracked by the source) and
    * each micro-batch's long rows accumulate into the detector's trailing
    * window for one scoring cycle ([[Detector.runCycleFromBatch]]). Unlike
    * [[startPolling]]'s clockwork re-fetch, every sample is fetched exactly
    * once; chunk fetches parallelize across executors inside each batch. */
  def startPollingDsv2(spark: SparkSession, detector: Detector,
                       sourceOptions: Map[String, String],
                       trigger: Trigger): StreamingQuery =
    spark.readStream
      .format("graft.sources.PrometheusDataSource")
      .options(sourceOptions)
      .load()
      .writeStream
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        detector.runCycleFromBatch(batch.toDF())
        ()
      }
      .start()

  /** Streaming J1 building block: event-time windowed per-series averages
    * with a watermark — `readStream → withWatermark → groupBy(window(...))`.
    * Late rows beyond `lateness` are dropped and windows finalize, so state
    * is bounded by (watermark horizon × active series), not stream length.
    * The output long rows feed the same pivot-align the batch path uses. */
  def windowedRates(events: DataFrame, tsCol: String, keyCol: String,
                    valueCol: String, windowDuration: String,
                    lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(avg(col(valueCol)).as("v"), count(lit(1)).as("n"))
      .select(col("window.start").as("ts"), col(keyCol), col("v"), col("n"))

  /** Streaming exact-dedup — the ingest-time face of the batch dedup
    * family (W3 / exact dedup): drop rows whose `keyCols` were already
    * seen, with state BOUNDED by the event-time watermark
    * (`dropDuplicatesWithinWatermark`): two rows with the same key are
    * deduped when they arrive within the `lateness` horizon of each
    * other, and the key's state is reclaimed once the watermark passes —
    * so state size tracks the horizon × key arrival rate, not stream
    * length. The right shape for at-least-once upstream ingestion (HTTP
    * retries, source replays) at 100 TB: keys shard across executors like
    * all keyed state. */
  def dedupStream(events: DataFrame, tsCol: String, lateness: String,
                  keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One input row of the incremental stream. */
  final case class FeatureRow(seriesKey: String, tsSec: Long, features: Seq[Double])
  /** One emitted scored window. */
  final case class ScoredWindow(seriesKey: String, tsEnd: Long, mse: Double,
                                isAnomaly: Boolean, anomalyTotal: Long)
  /** Per-key state: trailing rows + the running anomaly counter (ST4/A10). */
  final case class WindowState(rows: Seq[(Long, Seq[Double])], anomalyTotal: Long)

  /** Shape 2: incremental sliding-window scoring with explicit state. */
  def scoredWindows(rows: Dataset[FeatureRow], params: Lstm.AeParams,
                    seqLen: Int, threshold: Double): Dataset[ScoredWindow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(params)

    def update(key: String, batch: Iterator[FeatureRow],
               state: GroupState[WindowState]): Iterator[ScoredWindow] = {
      var st = state.getOption.getOrElse(WindowState(Vector.empty, 0L))
      val out = scala.collection.mutable.ArrayBuffer[ScoredWindow]()
      // within-batch ordering by event time (cross-batch order is the
      // stream's arrival order, as in the reference's append-only feed)
      batch.toSeq.sortBy(_.tsSec).foreach { r =>
        val rows = (st.rows :+ (r.tsSec, r.features)).takeRight(seqLen)
        var total = st.anomalyTotal
        if (rows.size == seqLen) {
          val f = rows.head._2.size
          val x = DenseMatrix.tabulate(seqLen, f)((i, j) => rows(i)._2(j))
          val mse = Lstm.mse(x, Lstm.forward(bc.value, x))
          val isAnomaly = mse > threshold
          if (isAnomaly) total += 1
          out += ScoredWindow(key, r.tsSec, mse, isAnomaly, total)
        }
        st = WindowState(rows, total)
      }
      state.update(st)
      out.iterator
    }

    rows.groupByKey(_.seriesKey)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
