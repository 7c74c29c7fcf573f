package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScoreSpec extends SparkSpec {
  import spark.implicits._

  test("windowMse: 0 iff X == Xhat, else mean of squared error (A6)") {
    val df = Seq((
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      Seq(Seq(2.0, 2.0), Seq(3.0, 0.0))
    )).toDF("x", "same", "diff")
    val r = df.select(
      Score.windowMse(col("x"), col("same")).as("zero"),
      Score.windowMse(col("x"), col("diff")).as("nz")).head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - (1.0 + 16.0) / 4) < 1e-12)
  }

  test("histogram: equal-width buckets, max value lands in last bucket (A7)") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = Score.histogram(df, "v", bins = 10).orderBy("bucket").collect()
    assert(h.length == 10)
    assert(h.head.getLong(1) == 10)  // 0..9
    assert(h.last.getLong(1) == 11)  // 90..100: right-inclusive last bin
    assert(h.map(_.getLong(1)).sum == 101)
  }

  test("histogramFraction: interpolated CDF shares; full range covers everything") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val hist = Score.histogramWith(df, "v", 0.0, 100.0, 50)
    val r = Score.histogramFraction(hist, 0.0, 100.0, 50,
        Seq((0.0, 50.0), (25.0, 75.0), (0.0, 100.0)))
      .orderBy("x_lo", "x_hi").collect()
    val frac = r.map(x => (x.getDouble(0), x.getDouble(1)) -> x.getDouble(2)).toMap
    // [0,50): buckets 1..25 hold v=0..49, endpoints land on exact bucket edges
    assert(frac((0.0, 50.0)) == 50.0 / 101.0)
    // [25,75]: F(75)=75 (half of bucket 38), F(25)=25 → 50/101 again
    assert(frac((25.0, 75.0)) == 50.0 / 101.0)
    // full range: x=hi overflows into the clamped last bucket, frac=1 → total
    assert(frac((0.0, 100.0)) == 1.0)
  }

  test("histogramFraction: empty histogram yields the empty frame, not an NPE") {
    val empty = Score.histogramWith(
      Seq.empty[Double].toDF("v"), "v", 0.0, 1.0, 50)
    val r = Score.histogramFraction(empty, 0.0, 1.0, 50, Seq((0.0, 0.5)))
    assert(r.collect().isEmpty)
    assert(r.columns.toSeq == Seq("x_lo", "x_hi", "fraction"))
  }

  test("anomalyStats: counts and ratios sum to 1 (A9/P8)") {
    val df = Seq(0.1, 0.2, 0.9, 1.5).toDF("mse")
    val s = Score.anomalyStats(df, "mse", 0.5).orderBy("is_anomaly").collect()
    assert(s.map(r => (r.getBoolean(0), r.getLong(1))).toSeq ==
      Seq((false, 2L), (true, 2L)))
    assert(math.abs(s.map(_.getDouble(2)).sum - 1.0) < 1e-12)
  }

  test("runningAnomalyCount is monotone cumulative (A10)") {
    val df = Seq((1L, 0.9), (2L, 0.1), (3L, 0.8), (4L, 0.7)).toDF("ts", "mse")
    val r = Score.runningAnomalyCount(df, Seq("ts"), "mse", 0.5)
      .orderBy("ts").select("anomaly_total").as[Long].collect().toSeq
    assert(r == Seq(1L, 1L, 2L, 3L))
  }

  test("perFeatureMse groups squared error by feature (A8)") {
    val df = Seq(("a", 1.0, 2.0), ("a", 3.0, 3.0), ("b", 0.0, 2.0))
      .toDF("f", "x", "xhat")
    val m = Score.perFeatureMse(df, "f", "x", "xhat").orderBy("f").collect()
    assert(m(0).getDouble(1) == 0.5) // (1+0)/2
    assert(m(1).getDouble(1) == 4.0)
  }

  test("histogramStats: exact count, midpoint-mass sum/avg estimates") {
    // values 0..10 over [0,10] in 2 bins: [0,5) -> 5 values (0..4),
    // [5,10] -> 6 values (5..10). midpoints 2.5 and 7.5.
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val h = Score.histogramWith(df, "v", 0.0, 10.0, 2)
    val r = Score.histogramStats(h, 0.0, 10.0, 2).head()
    assert(r.getAs[Long]("n") == 11L)
    // sum_est = 5*2.5 + 6*7.5 = 57.5; factored formula must agree exactly
    assert(r.getAs[Double]("sum_est") == 57.5)
    assert(r.getAs[Double]("avg_est") == 57.5 / 11.0)
  }
}
