package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import scala.jdk.CollectionConverters._

class StreamingRatesSpec extends SparkSpec {
  import StreamingRates._

  // one series with a reset (9 -> 2) and one flat series
  private val samples = Seq(
    Sample("a", 1000000L, 5L, 0L), Sample("a", 2000000L, 9L, 1L),
    Sample("a", 3000000L, 2L, 2L), Sample("a", 5000000L, 7L, 3L),
    Sample("b", 1000000L, 4L, 4L), Sample("b", 9000000L, 4L, 5L))

  private def driverRate(ss: Seq[Sample]): Seq[RatePoint] = {
    // reference fold, same reset rule
    ss.groupBy(_.key).toSeq.flatMap { case (k, g) =>
      val ordered = g.sortBy(s => (s.tsUs, s.seq))
      var inc = 0L
      ordered.zipWithIndex.map { case (s, i) =>
        if (i > 0) {
          val prev = ordered(i - 1).v
          inc += (if (s.v < prev) s.v else s.v - prev)
        }
        val span = s.tsUs - ordered.head.tsUs
        RatePoint(k, s.tsUs, s.v, inc,
          if (span <= 0) 0.0 else inc * 1000000.0 / span)
      }
    }
  }

  test("counterRate across micro-batches matches the batch fold exactly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sample]
    val q = counterRate(input.toDS()).writeStream.format("memory")
      .queryName("sr1").outputMode(OutputMode.Append()).start()
    try {
      // deliver in three batches, out of order WITHIN each batch
      input.addData(Seq(samples(1), samples(0))) // a: ts2, ts1 shuffled
      q.processAllAvailable()
      input.addData(Seq(samples(4), samples(2))) // b starts, a resets
      q.processAllAvailable()
      input.addData(Seq(samples(3), samples(5)))
      q.processAllAvailable()
      val got = spark.table("sr1").as[RatePoint].collect()
        .sortBy(p => (p.key, p.tsUs)).toSeq
      val want = driverRate(samples).sortBy(p => (p.key, p.tsUs))
      assert(got == want, s"\ngot  $got\nwant $want")
      // the reset at ts3 contributed v (2), not a negative delta
      assert(got.find(p => p.key == "a" && p.tsUs == 3000000L)
        .get.increase == 6L) // 4 (5->9) + 2 (reset)
    } finally q.stop()
  }

  test("ewma recurrence is the exact adjust=True form; batch twin agrees within truncation") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val alpha = 0.3; val k = 40
    val rnd = new scala.util.Random(7)
    val series = Seq.tabulate(120)(i =>
      Sample("s", i.toLong * 1000000L, rnd.nextInt(10000).toLong, i.toLong))
    val input = MemoryStream[Sample]
    val q = ewma(input.toDS(), alpha).writeStream.format("memory")
      .queryName("sr2").outputMode(OutputMode.Append()).start()
    try {
      series.grouped(50).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val got = spark.table("sr2").as[EwmaPoint].collect()
        .sortBy(_.tsUs).map(_.ewma).toSeq
      // exact driver-side recurrence: bitwise equality
      var num = 0.0; var den = 0.0
      val want = series.map { s =>
        num = (1 - alpha) * num + s.v; den = (1 - alpha) * den + 1.0
        num / den
      }
      assert(got == want)
      // batch twin (k-truncated closed form) agrees within (1-alpha)^k*range
      val batch = graft.operators.Rates.ewma(
          series.toDF("key", "ord", "v", "seq").select("key", "ord", "v"),
          Seq("key"), Seq("ord"), "v", alpha, k)
        .orderBy("ord").select("ewma_val").collect().map(_.getDouble(0))
      val tol = math.pow(1 - alpha, k) * 10000 / 1000.0 + 1e-6
      got.map(_ / 1000.0).zip(batch).zipWithIndex.foreach {
        case ((s, b), i) =>
          assert(math.abs(s - b) <= tol, s"i=$i stream=$s batch=$b tol=$tol")
      }
    } finally q.stop()
  }

  test("streaming holtWinters matches the batch fold bitwise across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val series = Seq.tabulate(90)(i =>
      Sample(s"s${i % 2}", (i / 2).toLong * 1000000L,
        rnd.nextInt(10000).toLong, i.toLong))
    val input = MemoryStream[Sample]
    val q = holtWinters(input.toDS(), sf = 0.3, tf = 0.1)
      .writeStream.format("memory").queryName("sr3")
      .outputMode(OutputMode.Append()).start()
    try {
      series.grouped(40).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val got = spark.table("sr3").as[HwPoint].collect()
        .sortBy(p => (p.key, p.tsUs)).toSeq
      val batch = graft.operators.Rates.holtWinters(
          series.toDF("key", "tsUs", "v", "seq"), "key", "tsUs", "v",
          sf = 0.3, tf = 0.1)
        .orderBy("key", "tsUs").collect()
        .map(r => HwPoint(r.getString(0), r.getLong(1),
          r.getDouble(2).toLong,
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming zscore matches the batch RANGE-frame plan bitwise, ties and eviction included") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ts = (i/3)·1s over 2 interleaved keys → same-key TIES at one ts
    // (RANGE semantics), span ≫ range → steady eviction
    val series = Seq.tabulate(90)(i =>
      Sample(s"s${i % 2}", (i / 3).toLong * 1000000L,
        rnd.nextInt(10000).toLong, i.toLong))
    val rangeUs = 5000000L
    val input = MemoryStream[Sample]
    val q = zscore(input.toDS(), rangeUs)
      .writeStream.format("memory").queryName("sr_z")
      .outputMode(OutputMode.Append()).start()
    try {
      series.grouped(30).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val got = spark.table("sr_z").as[ZPoint].collect()
        .sortBy(p => (p.key, p.tsUs, p.v)).toSeq
      // batch twin: the q_zscore composition verbatim (overTime + the
      // same fixed z/anom expressions)
      val batch = graft.operators.Rates.overTime(
          series.toDF("key", "tsUs", "v", "seq").select("key", "tsUs", "v"),
          Seq("key"), "tsUs", "v", rangeUs)
        .selectExpr("key", "tsUs", "v", "cnt_ot",
          "CASE WHEN cnt_ot < 2 OR std_ot = 0.0 THEN NULL " +
            "ELSE round((CAST(v AS DOUBLE) / 1000.0 - avg_ot) / std_ot, 6) " +
            "END AS z")
        .selectExpr("key", "tsUs", "v", "cnt_ot", "z",
          "CASE WHEN z IS NULL THEN CAST(0 AS BIGINT) " +
            "WHEN abs(z) > 3.0 THEN CAST(1 AS BIGINT) " +
            "ELSE CAST(0 AS BIGINT) END AS anom")
        .orderBy("key", "tsUs", "v").collect()
        .map(r => ZPoint(r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getLong(5))).toSeq
      assert(got == batch)
      // non-vacuous: ties really occurred and at least one window evicted
      assert(series.groupBy(s => (s.key, s.tsUs)).values.exists(_.size > 1))
      assert(got.map(_.cnt).max < 45) // eviction kept windows bounded
    } finally q.stop()
  }

  test("counter state survives a checkpointed restart") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_rates_ckpt").toString
    val input = MemoryStream[Sample]
    val got = new java.util.concurrent.ConcurrentHashMap[Long,
      Seq[RatePoint]]()
    def start() = counterRate(input.toDS())
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[RatePoint], bid: Long) =>
          got.put(bid, ds.collect().toSeq); ()
      }.start()
    val q1 = start()
    try {
      input.addData(Seq(Sample("a", 1000000L, 5L, 0L),
        Sample("a", 2000000L, 9L, 1L)))
      q1.processAllAvailable()
    } finally q1.stop()
    // a reset arrives while the query is down
    input.addData(Seq(Sample("a", 3000000L, 2L, 2L)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val pts = got.values().asScala.flatten.toSeq.sortBy(_.tsUs)
    // the restarted query still knows lastV=9: increase 4 (5->9) + 2 (reset)
    assert(pts.map(_.increase) == Seq(0L, 4L, 6L), pts.toString)
  }

  test("alpha domain guard") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sample]
    intercept[IllegalArgumentException] { ewma(input.toDS(), 1.0) }
  }

  test("zscore window state survives a checkpointed restart") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_z_ckpt").toString
    val rangeUs = 5000000L
    // 8 pre-restart samples, 2 post-restart; window spans the restart
    val pre = Seq.tabulate(8)(i =>
      Sample("a", i.toLong * 1000000L, (i * 100).toLong, i.toLong))
    val post = Seq(Sample("a", 8000000L, 1L, 8L),
      Sample("a", 9000000L, 900L, 9L))
    val input = MemoryStream[Sample]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[ZPoint]]()
    def start() = zscore(input.toDS(), rangeUs)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[ZPoint], bid: Long) =>
          got.put(bid, ds.collect().toSeq); ()
      }.start()
    val q1 = start()
    try { input.addData(pre); q1.processAllAvailable() } finally q1.stop()
    input.addData(post) // arrives while the query is down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val pts = got.values().asScala.flatten.toSeq.sortBy(_.tsUs)
    // the restarted window still holds the pre-restart samples: compare
    // against the batch plan over the FULL series
    val all = pre ++ post
    val want = graft.operators.Rates.overTime(
        all.toDF("key", "tsUs", "v", "seq").select("key", "tsUs", "v"),
        Seq("key"), "tsUs", "v", rangeUs)
      .selectExpr("key", "tsUs", "v", "cnt_ot",
        "CASE WHEN cnt_ot < 2 OR std_ot = 0.0 THEN NULL " +
          "ELSE round((CAST(v AS DOUBLE) / 1000.0 - avg_ot) / std_ot, 6) " +
          "END AS z")
      .selectExpr("key", "tsUs", "v", "cnt_ot", "z",
        "CASE WHEN z IS NULL THEN CAST(0 AS BIGINT) " +
          "WHEN abs(z) > 3.0 THEN CAST(1 AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END AS anom")
      .orderBy("tsUs").collect()
      .map(r => ZPoint(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getLong(5))).toSeq
    assert(pts == want)
    // non-vacuous: the post-restart windows MUST straddle the restart
    // (cnt > 2 means pre-restart samples were retained in state)
    assert(pts.filter(_.tsUs >= 8000000L).forall(_.cnt > 2))
  }
}
