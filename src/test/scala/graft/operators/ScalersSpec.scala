package graft.operators

import graft.SparkSpec

class ScalersSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (0.0, 10.0, 7.0), (5.0, 20.0, 7.0), (10.0, 30.0, 7.0)
  ).toDF("a", "b", "c") // c is zero-range

  test("minmax: (x-min)/(max-min); zero-range column maps to 0.0 (sklearn, A3)") {
    val s = Scalers.fitMinMax(df, Seq("a", "b", "c"))
    val t = s.transform(df).orderBy("a").collect()
    assert(t.map(_.getDouble(0)).toSeq == Seq(0.0, 0.5, 1.0))
    assert(t.map(_.getDouble(1)).toSeq == Seq(0.0, 0.5, 1.0))
    assert(t.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0, 0.0)) // NOT 0.5 (MLlib)
  }

  test("standard: population std ddof=0 (sklearn, A4)") {
    val s = Scalers.fitStandard(df, Seq("a"))
    assert(s.means == Seq(5.0))
    assert(math.abs(s.stds.head - math.sqrt(50.0 / 3.0)) < 1e-12) // stddev_pop
    val t = s.transform(df).orderBy("b").collect().map(_.getDouble(0))
    assert(math.abs(t(1)) < 1e-12) // centered value at the mean
  }

  test("inverse transform round-trips (scaler round-trip property)") {
    for (kind <- Seq("minmax", "standard")) {
      val s = Scalers.fit(df, kind, Seq("a", "b"))
      val back = s.inverse(s.transform(df)).orderBy("a").collect()
      val orig = df.orderBy("a").collect()
      for (i <- orig.indices; j <- 0 to 1)
        assert(math.abs(back(i).getDouble(j) - orig(i).getDouble(j)) < 1e-9)
    }
  }

  test("params persist and load as JSON (S8)") {
    val p = java.nio.file.Files.createTempFile("scaler", ".json").toString
    val s = Scalers.fitMinMax(df, Seq("a", "b", "c"))
    Scalers.save(s, p)
    val loaded = Scalers.load(p).asInstanceOf[Scalers.MinMaxScaler]
    assert(loaded.cols == s.cols && loaded.mins == s.mins && loaded.maxs == s.maxs)
    val s2 = Scalers.fitStandard(df, Seq("a"))
    Scalers.save(s2, p)
    val l2 = Scalers.load(p).asInstanceOf[Scalers.StandardScaler]
    assert(l2.means == s2.means && l2.stds == s2.stds)
  }

  test("unknown scaler kind is rejected") {
    intercept[IllegalArgumentException] { Scalers.fit(df, "banana", Seq("a")) }
  }

  test("robust: (x-median)/IQR with interpolated quantiles; zero-IQR -> /1") {
    // a = 0,5,10: median 5, q25 = 2.5, q75 = 7.5 (numpy linear interp)
    val s = Scalers.fitRobust(df, Seq("a", "c"))
    assert(s.medians == Seq(5.0, 7.0))
    assert(s.iqrs == Seq(5.0, 0.0))
    val t = s.transform(df).orderBy("b").collect()
    assert(t.map(_.getDouble(0)).toSeq == Seq(-1.0, 0.0, 1.0))
    assert(t.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0, 0.0)) // zero-IQR rule
    // round-trip + JSON persistence
    val back = s.inverse(s.transform(df)).orderBy("a").collect()
    assert(back.map(_.getDouble(0)).toSeq == Seq(0.0, 5.0, 10.0))
    val p = java.nio.file.Files.createTempFile("robust", ".json").toString
    Scalers.save(s, p)
    val l = Scalers.load(p).asInstanceOf[Scalers.RobustScaler]
    assert(l.cols == s.cols && l.medians == s.medians && l.iqrs == s.iqrs)
  }

  test("robust fit matches driver-side numpy-style quantiles on random data") {
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(257)(rnd.nextDouble() * 1000 - 500) // odd n, no ties
    val df2 = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x")
    val s = Scalers.fitRobust(df2, Seq("x"))
    def q(p: Double): Double = {
      val sorted = xs.sorted
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == pos) sorted(lo)
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
    assert(math.abs(s.medians.head - q(0.5)) < 1e-9)
    assert(math.abs(s.iqrs.head - (q(0.75) - q(0.25))) < 1e-9)
  }

  test("winsorize matches the naive per-group clip on random data") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(300)(i =>
      (s"g${rnd.nextInt(4)}", i.toLong, rnd.nextDouble() * 100))
    val got = Scalers.winsorize(rows.toDF("k", "id", "v"), Seq("k"), "v",
        0.1, 0.9)
      .orderBy("id").collect().map(_.getDouble(2))
    def q(xs: Seq[Double], p: Double): Double = {
      val sorted = xs.sorted
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == pos) sorted(lo)
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
    val bounds = rows.groupBy(_._1).map { case (k, g) =>
      k -> (q(g.map(_._3), 0.1), q(g.map(_._3), 0.9))
    }
    val want = rows.sortBy(_._2).map { case (k, _, v) =>
      val (lo, hi) = bounds(k)
      math.max(math.min(v, hi), lo)
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-9, s"row $i: got $g want $w")
    }
  }

  test("winsorize clips to per-group quantiles, leaves the middle intact") {
    val g = Seq(("a", 0L, 0.0), ("a", 1L, 10.0), ("a", 2L, 20.0),
      ("a", 3L, 30.0), ("a", 4L, 1000.0),
      ("b", 5L, -5.0), ("b", 6L, 5.0)).toDF("k", "id", "v")
    val got = Scalers.winsorize(g, Seq("k"), "v", 0.25, 0.75)
      .orderBy("id").collect().map(_.getDouble(2))
    // group a quantiles (n=5): q25 = 10, q75 = 30 -> 0 clips up, 1000 down
    assert(got.take(5).toSeq == Seq(10.0, 10.0, 20.0, 30.0, 30.0))
    // group b (n=2): q25 = -2.5, q75 = 2.5
    assert(got.drop(5).toSeq == Seq(-2.5, 2.5))
    intercept[IllegalArgumentException] {
      Scalers.winsorize(g, Seq("k"), "v", 0.9, 0.1) // pLo >= pHi
    }
    intercept[IllegalArgumentException] {
      Scalers.winsorize(g, Seq(), "v", 0.1, 0.9) // keyless
    }
  }
}
