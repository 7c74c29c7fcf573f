package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class WindowsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def series(n: Int) =
    (1 to n).map(i => (i.toLong, i.toDouble)).toDF("ts", "v")

  test("slidingWindows: emits n-L+1 windows; n<L empty; n=L one (W2)") {
    forAll(Table(("n", "l"), (3, 5), (5, 5), (10, 4), (1, 1))) { (n, l) =>
      val w = Windows.slidingWindows(series(n), Seq("ts"), Seq("v"), l)
      assert(w.count() == math.max(0, n - l + 1))
    }
  }

  test("slidingWindows: windows are contiguous and stride-1 (overlap invariant)") {
    val w = Windows.slidingWindows(series(6), Seq("ts"), Seq("v"), 3)
      .orderBy("window_id").collect()
    assert(w.map(_.getAs[Int]("window_id")).toSeq == Seq(0, 1, 2, 3))
    val values = w.map(_.getSeq[Row](w.head.fieldIndex("window"))
      .map(_.getDouble(0)))
    assert(values(0) == Seq(1.0, 2.0, 3.0))
    assert(values(1) == Seq(2.0, 3.0, 4.0)) // window i+1 = window i shifted by 1
    assert(values(3) == Seq(4.0, 5.0, 6.0))
  }

  test("slidingWindowsPartitioned equals the global computation for every bucket size") {
    val n = 50; val l = 7
    val global = Windows.slidingWindows(series(n), Seq("ts"), Seq("v"), l)
      .select(col("window_id").cast("long"), col("window"))
      .collect().map(r => (r.getLong(0), r.getSeq[Row](1).map(_.getDouble(0))))
      .sortBy(_._1).toSeq
    for (bucket <- Seq(7, 8, 16, 64)) {
      val part = Windows.slidingWindowsPartitioned(series(n), Seq("ts"),
          Seq("v"), l, bucketSize = bucket)
        .select(col("window_id").cast("long"), col("window"))
        .collect().map(r => (r.getLong(0), r.getSeq[Row](1).map(_.getDouble(0))))
        .sortBy(_._1).toSeq
      assert(part == global, s"bucketSize=$bucket")
    }
  }

  test("dedupKeepFirst is deterministic under explicit tiebreak (W3)") {
    val df = Seq((1L, "x", 1L, 10.0), (1L, "x", 2L, 20.0), (2L, "x", 3L, 30.0))
      .toDF("ts", "k", "arrival", "v")
    val d = Windows.dedupKeepFirst(df, Seq("ts", "k"), Seq("arrival"))
      .orderBy("ts").collect()
    assert(d.length == 2)
    assert(d(0).getDouble(3) == 10.0) // arrival 1 wins
  }

  test("tail returns newest n rows re-sorted ascending (W5)") {
    val t = Windows.tail(series(10), Seq("ts"), 3).collect()
    assert(t.map(_.getLong(0)).toSeq == Seq(8L, 9L, 10L))
  }

  test("stepAlign floors to step boundary with integer math (W6)") {
    val df = Seq(0L, 119L, 120L, 121L, 359L).toDF("ts")
    val a = df.select(Windows.stepAlign(col("ts"), 120L).as("s"))
      .as[Long].collect().toSeq
    assert(a == Seq(0L, 0L, 120L, 120L, 240L))
  }

  test("trainValSplit: disjoint, union = input, sizes near ratio (W7)") {
    val df = series(1000)
    val (tr, va) = Windows.trainValSplit(df, 0.8, seed = 42L)
    val (nt, nv) = (tr.count(), va.count())
    assert(nt + nv == 1000)
    assert(math.abs(nt - 800L) < 60, s"train size $nt")
    assert(tr.intersect(va).count() == 0)
  }
}
