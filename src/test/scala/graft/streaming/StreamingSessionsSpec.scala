package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSessionsSpec extends SparkSpec {

  test("watermark finalizes sessions exactly once; parity with batch sessionize") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val gapUs = 30000000L // 30 s
    // user 1: two sessions (1000s-1010s, 2000s); user 2: one (1005s)
    val batch1 = Seq((1L, 1000L), (1L, 1010L), (2L, 1005L))
    val batch2 = Seq((1L, 2000L))
    val fin = Seq((9L, 9999L)) // watermark pusher, far in the future

    val input = MemoryStream[(Long, Long)]
    val sessions = StreamingSessions.sessionize(
      input.toDF().toDF("user_id", "ts_s")
        .withColumn("ts", timestamp_seconds(col("ts_s"))),
      "user_id", "ts", "30 seconds", "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("ss1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      input.addData(fin); q.processAllAvailable()
      // one more empty-ish batch so the watermark from `fin` finalizes it all
      input.addData(Seq((9L, 10000L))); q.processAllAvailable()
      val streamed = spark.table("ss1")
        .filter(col("user_id") < 9)
        .collect().map(r => (r.getLong(0),
          r.getTimestamp(1).toInstant.getEpochSecond,
          r.getTimestamp(2).toInstant.getEpochSecond,
          r.getLong(3))).toSet
      // batch reference over the same rows: end = ts_end + gap
      val batchRows = graft.operators.Sessions.sessionize(
          (batch1 ++ batch2).toDF("user_id", "ts_us")
            .withColumn("ts_us", col("ts_us") * 1000000L),
          Seq("user_id"), "ts_us", gapUs)
        .collect().map(r => (r.getLong(0),
          r.getLong(3) / 1000000L,
          (r.getLong(4) + gapUs) / 1000000L,
          r.getLong(2))).toSet
      assert(streamed == batchRows,
        s"streamed=$streamed\nbatch=$batchRows")
      assert(streamed.size == 3)
    } finally q.stop()
  }
}
