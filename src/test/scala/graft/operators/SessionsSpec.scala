package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split at gaps >= gap, chain below it, per key") {
    // user a: 0,10,20 | 100,105 | 200   (gap 50)
    // user b: 0 | 60                     (isolated from a)
    val df = Seq(("a", 0L), ("a", 10L), ("a", 20L), ("a", 100L), ("a", 105L),
      ("a", 200L), ("b", 0L), ("b", 60L)).toDF("k", "ts")
    val got = Sessions.sessionize(df, Seq("k"), "ts", 50L)
      .orderBy("k", "session_idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", 0L, 3L, 0L, 20L), ("a", 1L, 2L, 100L, 105L),
      ("a", 2L, 1L, 200L, 200L),
      ("b", 0L, 1L, 0L, 0L), ("b", 1L, 1L, 60L, 60L)), got.toString)
  }

  test("boundary semantics: diff == gap starts a new session (native parity)") {
    val df = Seq(("a", 0L), ("a", 50L), ("a", 99L)).toDF("k", "ts")
    val got = Sessions.sessionize(df, Seq("k"), "ts", 50L)
      .orderBy("session_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq // (n_events, ts_start)
    // 50 is exactly gap after 0 -> split; 99 is 49 after 50 -> chain
    assert(got == Seq((1L, 0L), (2L, 50L)), got.toString)
  }

  test("matches Spark's native session_window grouping on random data") {
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(500)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000000).toLong * 7L + 3L))
      .toDF("user_id", "ts_us").distinct()
    val gapUs = 37000L
    val ours = Sessions.sessionize(df, Seq("user_id"), "ts_us", gapUs)
      .select(col("user_id"), col("n_events"), col("ts_start"), col("ts_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val native = df
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapUs microseconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("ts_start"), max(col("ts_us")).as("ts_end"))
      .select("user_id", "n_events", "ts_start", "ts_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(ours == native,
      s"ours-only=${(ours -- native).take(3)} native-only=${(native -- ours).take(3)}")
  }

  test("ties never split and the summary is tie-order independent") {
    val df = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("a", 100L))
      .toDF("k", "ts")
    val got = Sessions.sessionize(df, Seq("k"), "ts", 50L)
      .orderBy("session_idx").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((3L, 10L, 10L), (1L, 100L, 100L)), got.toString)
  }
}
