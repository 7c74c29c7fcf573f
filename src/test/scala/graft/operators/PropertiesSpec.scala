package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): windowing reassembly, scaler
  * round-trip, fill completeness — over scalacheck-generated inputs sampled
  * under fixed seeds (no scalatest-plus bridge in the offline cache, so
  * generation is driven manually; each case is a Spark job, so N is small). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val seriesGen: Gen[List[Double]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))

  test("windowing: count = max(0, n-L+1); stride-1 windows are exact slices") {
    for (seed <- 1L to 6L) {
      val xs = sample(seriesGen, seed)
      val l = sample(Gen.chooseNum(1, 8), seed * 31)
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ts", "v")
      val wins = Windows.slidingWindows(df, Seq("ts"), Seq("v"), l)
        .orderBy("window_id").collect()
        .map(r => r.getSeq[Row](r.fieldIndex("window")).map(_.getDouble(0)))
      assert(wins.length == math.max(0, xs.size - l + 1), s"seed=$seed n=${xs.size} l=$l")
      if (wins.nonEmpty) {
        val reassembled = wins.head ++ wins.tail.map(_.last)
        assert(reassembled.toList == xs, s"seed=$seed reassembly")
        wins.zipWithIndex.foreach { case (w, i) =>
          assert(w.toList == xs.slice(i, i + l), s"seed=$seed window $i")
        }
      }
    }
  }

  test("scaler round-trip: inverse(transform(x)) ≈ x for both kinds") {
    for (seed <- 1L to 4L) {
      val xs = sample(seriesGen.suchThat(_.size >= 2), seed * 7)
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      for (kind <- Seq("minmax", "standard")) {
        val s = Scalers.fit(df, kind, Seq("v"))
        val back = s.inverse(s.transform(df)).orderBy("id")
          .select("v").as[Double].collect()
        xs.zip(back).foreach { case (a, b) =>
          assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
            s"seed=$seed kind=$kind $a vs $b")
        }
      }
    }
  }

  test("ffillBfill leaves no nulls iff the column has at least one non-null") {
    val optGen = Gen.listOfN(20, Gen.option(Gen.chooseNum(-10.0, 10.0)))
    for (seed <- 1L to 6L) {
      val xs = sample(optGen, seed * 13)
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ts", "v")
      val nulls = Fill.ffillBfill(df, "ts", Seq("v"))
        .filter(org.apache.spark.sql.functions.col("v").isNull).count()
      if (xs.exists(_.isDefined)) assert(nulls == 0, s"seed=$seed")
      else assert(nulls == xs.size, s"seed=$seed")
    }
  }

  test("A6 fixed-point oracle envelope: 1e4 quantization keeps Long sums safe with ≥1000× headroom") {
    // q_window_mse_a6 quantizes v → round(v·1e4) and sums vi and vi² over
    // L=20 rows in Long (Queries.scala). The driver generator's events.value
    // stays ≤ ~561 at every sf (observed max 560.21 at sf0.1; the minute-avg
    // click series is a mean of those values, so it shares the bound). This
    // property pins the envelope so a future data change can't silently
    // overflow: at maxAbs=1000 (≈2× cover over the data) the worst-case Σvi²
    // must clear Long.MaxValue by 3 orders of magnitude, every quantized sum
    // must convert to double EXACTLY (< 2^53 — the oracle's float formula
    // depends on bit-identical integer inputs), and sampled windows must
    // agree with BigInt arithmetic term-for-term.
    val L = 20
    val maxAbsV = 1000.0
    val worst = BigInt(L) * BigInt(math.round(maxAbsV * 1e4)).pow(2)
    assert(worst * 1000 < BigInt(Long.MaxValue),
      s"1e4 quantization headroom lost: worst=$worst")
    assert(worst < BigInt(2).pow(53), s"Σvi² exceeds exact-double range: $worst")
    assert(BigInt(L) * BigInt(math.round(maxAbsV * 1e4)) < BigInt(2).pow(53))
    val vGen = Gen.chooseNum(-maxAbsV, maxAbsV)
    for (seed <- 1L to 40L) {
      val vs = sample(Gen.listOfN(L, vGen), seed * 23)
      val vi = vs.map(v => math.round(v * 1e4))
      val s1 = vi.sum
      val s2 = vi.map(x => x * x).sum
      assert(BigInt(s1) == vi.map(BigInt(_)).sum, s"seed=$seed s1 overflow")
      assert(BigInt(s2) == vi.map(x => BigInt(x) * BigInt(x)).sum,
        s"seed=$seed s2 overflow")
      assert(s1.toDouble.toLong == s1 && s2.toDouble.toLong == s2,
        s"seed=$seed double conversion not exact")
    }
  }

  test("prefixSumPartitioned equals the global running sum (nulls as 0) on random inputs") {
    // The shared scale-safe machinery under globalRowNumber and the
    // partitioned A10 must match the single-window semantics row-for-row —
    // including null handling (CASE … ELSE 0) and tiny/empty inputs.
    val optGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.option(Gen.chooseNum(0L, 5L))))
    for (seed <- 1L to 6L) {
      val xs = sample(optGen, seed * 29)
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "flag")
      val got = Windows.prefixSumPartitioned(df, Seq("id"),
          org.apache.spark.sql.functions.col("flag"), "ps")
        .orderBy("id").select("id", "ps").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      var acc = 0L
      val want = xs.zipWithIndex.map { case (v, i) =>
        acc += v.getOrElse(0L); (i.toLong, acc)
      }
      assert(got.toSeq == want.toSeq, s"seed=$seed n=${xs.size}")
    }
  }

  test("ffillBfillBucketed equals global ffillBfill on random sparse series") {
    // The boundary-value-carry fill must equal the single-window semantics
    // row-for-row on arbitrary null layouts: leading/trailing null runs,
    // runs longer than a bucket, all-null and all-present columns.
    val optGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.option(Gen.chooseNum(-50.0, 50.0))))
    for (seed <- 1L to 6L) {
      val xs = sample(optGen, seed * 41)
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("ts", "x").repartition(7)
      def vals(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("ts").collect().map(r => Option(r.get(r.fieldIndex("x")))).toSeq
      val global = vals(Fill.ffillBfill(df, "ts", Seq("x")))
      val bucketed = vals(Fill.ffillBfillBucketed(df, "ts", Seq("x")))
      assert(bucketed == global, s"seed=$seed n=${xs.size}")
    }
  }

  test("asof join: every left row appears once with the max right ts <= its ts") {
    val rowsGen = Gen.chooseNum(0, 30)
    for (seed <- 1L to 5L) {
      val nL = sample(rowsGen, seed * 3) + 1
      val nR = sample(rowsGen, seed * 5)
      val l = (0 until nL).map(i =>
        (i.toLong, sample(Gen.chooseNum(0, 3), seed * 7 + i).toString,
          sample(Gen.chooseNum(0L, 40L), seed * 11 + i))).toDF("id", "k", "ts")
      // right unique per (k, rts) by construction
      val rRows = (0 until nR).map(i =>
        (sample(Gen.chooseNum(0, 3), seed * 13 + i).toString,
          sample(Gen.chooseNum(0L, 40L), seed * 17 + i),
          i.toDouble)).distinctBy(x => (x._1, x._2))
      val r = rRows.toDF("k", "rts", "v")
      val got = Asof.joinAsOf(l, r, Seq("k"), "ts", "rts", Seq("v"))
        .collect().map(x => (x.getAs[Long]("id"),
          if (x.isNullAt(x.fieldIndex("v"))) None
          else Some(x.getAs[Double]("v")))).toMap
      assert(got.size == nL, s"seed=$seed left rows lost or duplicated")
      val lRows = l.collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      lRows.foreach { case (id, k, ts) =>
        val best = rRows.filter(x => x._1 == k && x._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(id) == best, s"seed=$seed id=$id")
      }
    }
  }

  test("sessionize partitions every row into exactly one session; gaps respected") {
    for (seed <- 1L to 5L) {
      val n = sample(Gen.chooseNum(1, 40), seed * 23)
      val gap = sample(Gen.chooseNum(1L, 15L), seed * 29)
      val rows = (0 until n).map(i =>
        (sample(Gen.chooseNum(0, 2), seed * 31 + i).toLong,
          sample(Gen.chooseNum(0L, 100L), seed * 37 + i)))
      val df = rows.toDF("k", "ts")
      val sess = Sessions.sessionize(df, Seq("k"), "ts", gap).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getLong(4)))
      // row conservation
      assert(sess.map(_._3).sum == n, s"seed=$seed")
      sess.groupBy(_._1).foreach { case (k, ss) =>
        val sorted = ss.sortBy(_._2).toSeq
        // ordinals are 0..m-1, spans ordered and separated by >= gap
        assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(b._4 - a._5 >= gap, s"seed=$seed k=$k adjacent sessions closer than gap")
          case _ => ()
        }
        // within a session: max internal silence < gap (check via raw rows)
        val byKey = rows.filter(_._1 == k).map(_._2).sorted
        sorted.foreach { case (_, _, _, lo, hi) =>
          val inSess = byKey.filter(t => t >= lo && t <= hi).distinct.sorted
          inSess.sliding(2).foreach {
            case Seq(a, b) => assert(b - a < gap, s"seed=$seed split missed")
            case _ => ()
          }
        }
      }
    }
  }

  test("windowMse ≥ 0, = 0 on identical windows, symmetric in arguments") {
    for (seed <- 1L to 4L) {
      val xs = sample(Gen.listOfN(6, Gen.chooseNum(-5.0, 5.0)), seed * 17)
      val ys = sample(Gen.listOfN(6, Gen.chooseNum(-5.0, 5.0)), seed * 19)
      val w1 = xs.grouped(3).map(_.toSeq).toSeq
      val w2 = ys.grouped(3).map(_.toSeq).toSeq
      val df = Seq((w1, w1, w2)).toDF("x", "same", "other")
      import org.apache.spark.sql.functions.col
      val r = df.select(
        Score.windowMse(col("x"), col("same")).as("zero"),
        Score.windowMse(col("x"), col("other")).as("ab"),
        Score.windowMse(col("other"), col("x")).as("ba")).head()
      assert(r.getDouble(0) == 0.0)
      assert(r.getDouble(1) >= 0.0)
      assert(r.getDouble(1) == r.getDouble(2), s"seed=$seed symmetry")
    }
  }
}
