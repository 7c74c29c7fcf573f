package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PromQL range-function family: each operator checked against a
  * brute-force reference computed in plain Scala on the driver. */
class RatesSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts_us, v-milli) fixture: two series with ties and resets
  private def fixture = Seq(
    ("a", 1000000L, 0L, 5000L), ("a", 2000000L, 1L, 7000L),
    ("a", 2000000L, 2L, 3000L), ("a", 4000000L, 3L, 9000L),
    ("a", 9000000L, 4L, 1000L),
    ("b", 1000000L, 5L, 10000L), ("b", 5000000L, 6L, 10000L))
    .toDF("k", "ts_us", "id", "v")

  test("overTime: frame stats match brute force, ties share the frame") {
    val got = Rates.overTime(fixture, Seq("k"), "ts_us", "v",
        rangeUs = 3000000L)
      .orderBy("id")
      .select("id", "cnt_ot", "sum_ot", "avg_ot", "std_ot", "min_ot",
        "max_ot")
      .collect()
    val rows = fixture.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for (r <- got) {
      val id = r.getLong(0)
      val (k, ts, _, _) = rows.find(_._3 == id).get
      val frame = rows.filter(x => x._1 == k && x._2 >= ts - 3000000L &&
        x._2 <= ts).map(_._4)
      assert(r.getLong(1) == frame.length, s"cnt id=$id")
      assert(r.getLong(2) == frame.sum, s"sum id=$id")
      val mean = frame.sum.toDouble / frame.length
      assert(math.abs(r.getDouble(3) - mean / 1000.0) < 1e-6, s"avg id=$id")
      val varPop =
        frame.map(x => (x - mean) * (x - mean)).sum / frame.length
      assert(math.abs(r.getDouble(4) - math.sqrt(varPop) / 1000.0) < 1e-6,
        s"std id=$id")
      assert(r.getDouble(5) == frame.min / 1000.0, s"min id=$id")
      assert(r.getDouble(6) == frame.max / 1000.0, s"max id=$id")
    }
    // the two ts=2000000 ties see each other (RANGE peers)
    val tie = got.filter(r => r.getLong(0) == 1L || r.getLong(0) == 2L)
    assert(tie.forall(_.getLong(1) == 3L), "ties must share the frame")
  }

  test("derivPredict matches driver-side least squares") {
    val got = Rates.derivPredict(fixture, Seq("k"), "ts_us", "v",
        horizonSec = 10L)
      .orderBy("k").collect()
    // series a: x = whole seconds since first sample
    val xs = Seq(0.0, 1.0, 1.0, 3.0, 8.0)
    val ys = Seq(5000.0, 7000.0, 3000.0, 9000.0, 1000.0)
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val predict = sy / n + slope * (8.0 + 10.0 - sx / n)
    val a = got(0)
    assert(a.getLong(1) == 5L)
    assert(math.abs(a.getDouble(2) - slope * 3.6) < 1e-6, "deriv a")
    assert(math.abs(a.getDouble(3) - predict / 1000.0) < 1e-6, "predict a")
    // series b: two equal samples -> slope 0, predict = the constant
    val b = got(1)
    assert(b.getDouble(2) == 0.0 && b.getDouble(3) == 10.0, b.toString)
  }

  test("quantileOverTimeSliding is bit-identical to the percentile window plan") {
    // the registry plan (q_quantile_ot's exact shape, smaller frame so
    // the fixture exercises full frames, partial head frames, ties,
    // evictions and a null inside + outside the frame)
    def windowPlan(df: org.apache.spark.sql.DataFrame, frame: Int, p: Double) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("ts_us", "id")
        .rowsBetween(-(frame - 1), 0)
      df.withColumn("q_ot", percentile(col("v"), lit(p)).over(w))
        .select("k", "ts_us", "id", "v", "q_ot").orderBy("id")
    }
    val withNulls = Seq(
      ("a", 1L, 0L, Some(5000L)), ("a", 2L, 1L, Some(7000L)),
      ("a", 3L, 2L, None), ("a", 4L, 3L, Some(9000L)),
      ("a", 5L, 4L, Some(1000L)), ("a", 6L, 5L, Some(1000L)),
      ("b", 1L, 6L, None), ("b", 2L, 7L, Some(10000L)),
      ("c", 1L, 8L, None))
      .toDF("k", "ts_us", "id", "v")
    val rng = new scala.util.Random(7)
    val random = (0 until 3000).map { i =>
      (s"k${i % 5}", (i / 5).toLong, i.toLong,
        if (rng.nextInt(50) == 0) None else Some(rng.nextInt(100000).toLong))
    }.toDF("k", "ts_us", "id", "v")
    // boundary quantiles (exact frame-min / frame-max paths), a frame
    // LARGER than every series (never evicts; partial frames only), and
    // magnitudes near ±2^63 (the long→double conversion both engines
    // share must stay bit-identical through the interpolation)
    val extremes = Seq(
      ("a", 1L, 0L, Some(Long.MaxValue)), ("a", 2L, 1L, Some(Long.MinValue)),
      ("a", 3L, 2L, Some(Long.MaxValue - 1L)), ("a", 4L, 3L, Some(0L)),
      ("a", 5L, 4L, Some(Long.MinValue + 1L)), ("b", 1L, 5L, Some(Long.MaxValue)))
      .toDF("k", "ts_us", "id", "v")
    for ((df, frame, p) <- Seq((withNulls, 3, 0.5), (random, 50, 0.5),
        (random, 7, 0.9), (random, 1, 0.25),
        (withNulls, 10, 1.0), (random, 5, 0.0),
        (extremes, 3, 0.5), (extremes, 2, 0.75))) {
      val want = windowPlan(df, frame, p).collect()
      val got = Rates.quantileOverTimeSliding(df, "k", Seq("ts_us", "id"),
        "v", frame, p).orderBy("id").collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(2) == w.getLong(2))
        val (gn, wn) = (g.isNullAt(4), w.isNullAt(4))
        assert(gn == wn, s"null shape differs at id=${g.getLong(2)} " +
          s"(frame=$frame p=$p)")
        if (!gn) assert(
          java.lang.Double.doubleToRawLongBits(g.getDouble(4)) ==
            java.lang.Double.doubleToRawLongBits(w.getDouble(4)),
          s"id=${g.getLong(2)} frame=$frame p=$p: " +
            s"${g.getDouble(4)} vs ${w.getDouble(4)}")
      }
    }
  }

  test("derivPredict: sums past Long.MaxValue do not overflow (r15 10x bug)") {
    // x offsets ~3.1e9 s make a LONG Σxx pass 2^63 with two samples —
    // the shape that failed loud under ANSI at ld1 in the r15 noop bench
    // (Rates.scala scaladoc). The double accumulator must survive and
    // still produce the exact line through the points.
    val big = 3100000000L // seconds
    val df = Seq(
      ("k", 0L, 0L, 1000L),
      ("k", big * 1000000L, 1L, 1000L + big /* slope 1 milli/s */),
      ("k", 2L * big * 1000000L, 2L, 1000L + 2L * big))
      .toDF("k", "ts_us", "id", "v")
    val r = Rates.derivPredict(df, Seq("k"), "ts_us", "v", 0L).collect()
    assert(r.length == 1)
    // 1 milli-unit/sec = 3.6 units/hour / 1000-milli scaling => 3.6 * 1.0
    assert(math.abs(r(0).getDouble(2) - 3.6) < 1e-4,
      s"slope per hour: ${r(0).getDouble(2)}")
  }

  test("derivPredict: constant-x key yields NULL slope, not a crash") {
    val one = Seq(("c", 5L, 0L, 100L), ("c", 5L, 1L, 200L))
      .toDF("k", "ts_us", "id", "v")
    val r = Rates.derivPredict(one, Seq("k"), "ts_us", "v", 1L).collect()
    assert(r.length == 1 && r(0).isNullAt(2) && r(0).isNullAt(3))
  }

  test("resetsChanges counts drops and changes, first row exempt") {
    // a: 5,3,3,9,1 -> resets 2 (5->3, 9->1), changes 3 (5->3, 3->9, 9->1)
    val df = Seq(("a", 0L, 5L), ("a", 1L, 3L), ("a", 2L, 3L), ("a", 3L, 9L),
      ("a", 4L, 1L)).toDF("k", "ord", "c")
    val r = Rates.resetsChanges(df, Seq("k"), Seq("ord"), "c").collect()
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 3L, r(0).toString)
  }

  test("deltaIrate: endpoints, last-two rate, single-sample NULLs") {
    val got = Rates.deltaIrate(fixture, Seq("k"), "ts_us", "v", "id")
      .orderBy("k").collect()
    // a: first 5000, last 1000 (ts 9e6), prev 9000 (ts 4e6)
    val a = got(0)
    assert(a.getDouble(1) == -4.0, "delta a")     // (1000-5000)/1000
    assert(a.getDouble(2) == -8.0, "idelta a")    // (1000-9000)/1000
    // irate: -8000 milli * 1000 / 5e6 us = -1.6 /sec
    assert(math.abs(a.getDouble(3) + 1.6) < 1e-6, "irate a")
    val single = Seq(("c", 7L, 0L, 100L)).toDF("k", "ts_us", "id", "v")
    val r = Rates.deltaIrate(single, Seq("k"), "ts_us", "v", "id").collect()
    assert(r(0).getDouble(1) == 0.0 && r(0).isNullAt(2) && r(0).isNullAt(3))
  }

  test("ewma matches the brute-force truncated closed form") {
    val alpha = 0.3; val k = 5
    val vs = Seq(5000L, 7000L, 3000L, 9000L, 1000L, 4000L, 8000L)
    val df = vs.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "ord", "v")
    val got = Rates.ewma(df, Seq("k"), Seq("ord"), "v", alpha, k)
      .orderBy("ord").select("ewma_val").collect().map(_.getDouble(0))
    val ws = Rates.ewmaWeights(alpha, k)
    val want = vs.indices.map { t =>
      val terms = (0 until math.min(k, t + 1)).map(j => ws(j) * vs(t - j))
      val wsum = (0 until math.min(k, t + 1)).map(ws).sum
      BigDecimal(terms.sum / wsum / 1000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-6, s"t=$i got $g want $w")
    }
    // head behavior: first value is itself (normalized single term)
    assert(got.head == 5.0)
  }

  test("ewmaSliding == ewma BITWISE on adversarial fixtures") {
    // interleaved keys, isolated nulls (an ALL-null frame raises ANSI
    // DIVIDE_BY_ZERO through BOTH forms — pinned separately below),
    // negatives, zeros, values past 2^53's double-exact range — every
    // row compared as raw double bits
    val rows: Seq[(String, Long, java.lang.Long)] =
      Seq[(String, Long, java.lang.Long)](
        ("a", 0L, 5000L), ("a", 1L, null), ("a", 2L, -3000L),
        ("a", 3L, 0L), ("a", 4L, 9007199254740993L), ("a", 5L, 1L),
        ("b", 0L, 7L), ("b", 1L, null), ("b", 2L, 55L), ("b", 3L, null),
        ("c", 0L, 42L)) ++
        (0 until 100).map(i => ("d", i.toLong,
          java.lang.Long.valueOf(if (i % 7 == 0) -i * 997L else i * 31L))) ++
        (0 until 10).map(i => ("e", i.toLong,
          if (i % 3 == 2) null else java.lang.Long.valueOf(i * 13L)))
    val df = rows.toDF("k", "ord", "v")
    for (kLags <- Seq(2, 5, 40)) {
      def collect(out: org.apache.spark.sql.DataFrame) = out
        .orderBy("k", "ord")
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq
      val win = collect(Rates.ewma(df, Seq("k"), Seq("ord"), "v", 0.3, kLags)
        .select("k", "ord", "v", "ewma_val"))
      val ring = collect(
        Rates.ewmaSliding(df, Seq("k"), Seq("ord"), "v", 0.3, kLags))
      assert(ring == win, s"k=$kLags")
    }
  }

  test("ewmaSliding == ewma on the sf0.001 milli events (registry shape)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val milli = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("ts_us"), col("event_id"),
        expr("cast(round(value * 1000) as long)").as("v"))
    def collect(out: org.apache.spark.sql.DataFrame) = out
      .select("event_type", "ts_us", "event_id", "v", "ewma_val")
      .orderBy("event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)))).toSeq
    val win = collect(
      Rates.ewma(milli, Seq("event_type"), Seq("ts_us", "event_id"), "v",
        0.3, 40))
    val ring = collect(
      Rates.ewmaSliding(milli, Seq("event_type"), Seq("ts_us", "event_id"),
        "v", 0.3, 40))
    assert(ring.nonEmpty && ring == win)
  }

  test("ewmaSliding error-parity: an all-null frame raises ANSI DIVIDE_BY_ZERO like the window form") {
    val df = Seq[(String, Long, java.lang.Long)](("z", 0L, null))
      .toDF("k", "ord", "v")
    val e1 = intercept[Throwable] {
      Rates.ewma(df, Seq("k"), Seq("ord"), "v", 0.3, 2).collect()
    }
    val e2 = intercept[Throwable] {
      Rates.ewmaSliding(df, Seq("k"), Seq("ord"), "v", 0.3, 2).collect()
    }
    Seq(e1, e2).foreach { e =>
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString("; ")
      assert(chain.contains("DIVIDE_BY_ZERO"), chain)
    }
  }

  test("ewmaSliding guards: non-long value, binary key, taken name") {
    intercept[IllegalArgumentException] {
      Rates.ewmaSliding(Seq(("a", 1L, 2.0)).toDF("k", "ord", "v"),
        Seq("k"), Seq("ord"), "v", 0.5, 2)
    }
    intercept[IllegalArgumentException] {
      Rates.ewmaSliding(
        Seq((Array[Byte](1), 1L, 2L)).toDF("k", "ord", "v"),
        Seq("k"), Seq("ord"), "v", 0.5, 2)
    }
    intercept[IllegalArgumentException] {
      Rates.ewmaSliding(Seq(("a", 1L, 2L, 0.0)).toDF("k", "ord", "v", "ewma_val"),
        Seq("k"), Seq("ord"), "v", 0.5, 2)
    }
  }

  test("rateWindow: frame increase is reset-aware, rate spans the frame") {
    // one key: ctr 5, 9, 2(reset), 7 at ts 0s, 10s, 20s, 40s; range 25s
    val df = Seq(("a", 0L, 0L, 5L), ("a", 10000000L, 1L, 9L),
      ("a", 20000000L, 2L, 2L), ("a", 40000000L, 3L, 7L))
      .toDF("k", "ts_us", "id", "c")
    val got = Rates.rateWindow(df, Seq("k"), "ts_us", "c", "id",
        rangeUs = 25000000L)
      .orderBy("id").select("increase_w", "rate_w").collect()
    // increments: 0, 4, 2 (reset -> post-reset value), 5
    // frames (25s trailing): [0], [0,10], [0,10,20], [20,40]
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 4L, 6L, 7L))
    assert(got(0).isNullAt(1)) // single-sample frame: zero span
    assert(math.abs(got(1).getDouble(1) - 0.4) < 1e-9)  // 4 / 10s
    assert(math.abs(got(2).getDouble(1) - 0.3) < 1e-9)  // 6 / 20s
    assert(math.abs(got(3).getDouble(1) - 0.35) < 1e-9) // 7 / 20s
  }

  test("overTime and rateWindow match brute force on random series") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      val key = s"k${rnd.nextInt(3)}"
      // clustered timestamps so frames vary from 1 to many samples
      val ts = rnd.nextInt(2000).toLong * 1000000L
      (key, ts, i.toLong, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("k", "ts_us", "id", "v")
    val range = 60000000L // 60 s

    val ot = Rates.overTime(df, Seq("k"), "ts_us", "v", range)
      .select("id", "cnt_ot", "sum_ot").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, ts, id, _) <- rows) {
      val frame = rows.filter(x => x._1 == k && x._2 >= ts - range &&
        x._2 <= ts)
      assert(ot(id) == ((frame.length.toLong, frame.map(_._4).sum)),
        s"overTime id=$id")
    }

    val rw = Rates.rateWindow(df, Seq("k"), "ts_us", "v", "id", range)
      .select("id", "increase_w").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byKey = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.sortBy(x => (x._2, x._3))
    }
    for ((k, ts, id, _) <- rows) {
      val ordered = byKey(k)
      val incs = ordered.zipWithIndex.map { case (x, i) =>
        if (i == 0) 0L
        else {
          val p = ordered(i - 1)._4
          if (x._4 < p) x._4 else x._4 - p
        }
      }
      val want = ordered.zip(incs)
        .filter { case (x, _) => x._2 >= ts - range && x._2 <= ts }
        .map(_._2).sum
      assert(rw(id) == want, s"rateWindow id=$id")
    }
  }

  test("holtWinters matches the driver-side Prometheus recurrence exactly") {
    val rnd = new scala.util.Random(11)
    // 7 keys so key boundaries cross the 4 shuffle partitions
    val rows = (0 until 7).flatMap { k =>
      val n = 1 + rnd.nextInt(60) // includes single-sample keys
      Seq.tabulate(n)(i => (s"k$k", i.toLong, rnd.nextDouble() * 100))
    }
    val got = Rates.holtWinters(rows.toDF("k", "ts", "x"), "k", "ts", "x",
        sf = 0.3, tf = 0.1)
      .orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val ordered = g.sortBy(_._2)
      var s = 0.0; var b = 0.0
      ordered.zipWithIndex.map { case ((_, ts, x), i) =>
        if (i == 0) { s = x; b = 0.0; (k, ts, None, None) }
        else {
          if (i == 1) b = x - s
          val s1 = 0.3 * x + 0.7 * (s + b)
          val b1 = 0.1 * (s1 - s) + 0.9 * b
          s = s1; b = b1
          (k, ts, Some(s1), Some(b1))
        }
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want) // bitwise: same fold, same op order
  }

  test("holtWinters rejects out-of-range factors") {
    val df = Seq(("a", 1L, 2.0)).toDF("k", "ts", "x")
    intercept[IllegalArgumentException] {
      Rates.holtWinters(df, "k", "ts", "x", 1.0, 0.1)
    }
    intercept[IllegalArgumentException] {
      Rates.holtWinters(df, "k", "ts", "x", 0.3, 0.0)
    }
  }

  test("ewmaWeights is the (1-alpha)^j ladder") {
    val ws = Rates.ewmaWeights(0.5, 4)
    assert(ws == Seq(1.0, 0.5, 0.25, 0.125))
  }

  test("column-collision guards fail fast") {
    val df = Seq(("a", 1L, 2L)).toDF("k", "ts_us", "avg_ot")
    intercept[IllegalArgumentException] {
      Rates.overTime(df, Seq("k"), "ts_us", "avg_ot", 10L)
    }
    intercept[IllegalArgumentException] {
      Rates.ewma(Seq(("a", 1L, 2.0)).toDF("k", "ord", "ewma_val"),
        Seq("k"), Seq("ord"), "ewma_val", 0.5, 2)
    }
    intercept[IllegalArgumentException] { // alpha out of range
      Rates.ewma(Seq(("a", 1L, 2L)).toDF("k", "ord", "v"),
        Seq("k"), Seq("ord"), "v", 1.0, 2)
    }
    intercept[IllegalArgumentException] { // keyless window
      Rates.overTime(Seq(("a", 1L, 2L)).toDF("k", "ts_us", "v"),
        Seq(), "ts_us", "v", 10L)
    }
  }
}
