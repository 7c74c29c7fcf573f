package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingJoinsSpec extends SparkSpec {

  test("interval join matches the batch predicate; watermark bounds state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long)] // (user, ts_s)
    val views = MemoryStream[(Long, Long)]
    def cdf = clicks.toDF().toDF("c_user", "c_ts_s")
      .withColumn("c_ts", timestamp_seconds(col("c_ts_s")))
    def vdf = views.toDF().toDF("v_user", "v_ts_s")
      .withColumn("v_ts", timestamp_seconds(col("v_ts_s")))
    val joined = StreamingJoins.intervalJoin(cdf, vdf,
        "c_user", "v_user", "c_ts", "v_ts",
        watermark = "10 seconds", beforeSec = 30L, afterSec = 30L)
      .select("c_user", "c_ts_s", "v_ts_s")
    val q = joined.writeStream.format("memory").queryName("sj1")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: click at 1000 pairs with views at 980 and 1020 (within
      // ±30 s) but NOT 1031; user 2 pairs once; user 3 has no click
      clicks.addData((1L, 1000L), (2L, 5000L))
      views.addData((1L, 980L), (1L, 1020L), (1L, 1031L), (2L, 5025L),
        (3L, 1000L))
      q.processAllAvailable()
      val got = spark.table("sj1").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = Set((1L, 1000L, 980L), (1L, 1000L, 1020L),
        (2L, 5000L, 5025L))
      assert(got == expected, got.toString)
      // batch parity against the SAME predicate builder the streaming join
      // uses — intervalJoinBatch is the oracle-checked twin (q_interval_join)
      val bc = Seq((1L, 1000L), (2L, 5000L)).toDF("c_user", "c_ts_s")
        .withColumn("c_ts", timestamp_seconds(col("c_ts_s")))
      val bv = Seq((1L, 980L), (1L, 1020L), (1L, 1031L), (2L, 5025L),
        (3L, 1000L)).toDF("v_user", "v_ts_s")
        .withColumn("v_ts", timestamp_seconds(col("v_ts_s")))
      val batch = StreamingJoins.intervalJoinBatch(bc, bv,
          "c_user", "v_user", "c_ts", "v_ts", beforeSec = 30L, afterSec = 30L)
        .select("c_user", "c_ts_s", "v_ts_s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch)
      // advance both watermarks far past t=1000 (the user-9 rows are
      // 900 000 s apart, so they never pair), then replay an old view:
      // click@1000's state window is closed — no new match may emit
      clicks.addData((9L, 999000L)); views.addData((9L, 999900L))
      q.processAllAvailable()
      views.addData((1L, 1001L)) // would match click@1000 if state lived
      q.processAllAvailable()
      assert(spark.table("sj1").count() == expected.size,
        spark.table("sj1").collect().mkString(","))
    } finally q.stop()
  }
}
