package graft.operators

import graft.SparkSpec

class FillSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, None: Option[Double], Some(5.0)),
    (2L, Some(2.0), None: Option[Double]),
    (3L, None: Option[Double], None: Option[Double]),
    (4L, Some(4.0), Some(8.0))
  ).toDF("ts", "x", "y")

  test("ffillBfill: interior nulls take last previous value, leading take first following (W1)") {
    val f = Fill.ffillBfill(df, "ts", Seq("x", "y")).orderBy("ts").collect()
    assert(f.map(_.getDouble(1)).toSeq == Seq(2.0, 2.0, 2.0, 4.0)) // bfill leading, ffill interior
    assert(f.map(_.getDouble(2)).toSeq == Seq(5.0, 5.0, 5.0, 8.0))
  }

  test("ffillBfill leaves no nulls iff column has at least one non-null") {
    val withEmpty = df.withColumn("z",
      org.apache.spark.sql.functions.lit(null).cast("double"))
    val f = Fill.ffillBfill(withEmpty, "ts", Seq("x", "z"))
    assert(f.filter($"x".isNull).count() == 0)
    assert(f.filter($"z".isNull).count() == 4) // all-null column stays null
  }

  test("ffillBfillBucketed == global ffillBfill across bucket boundaries, no global window") {
    // long sparse series: null runs longer than a bucket, leading and
    // trailing nulls, an all-null column — every carry case exercised
    val rows = (0 until 200).map { i =>
      val x = if (i < 7 || i >= 193 || (i % 29) < 13) None else Some(i.toDouble)
      val y = if (i == 100) Some(1.5) else None // one non-null: carries everywhere
      (i.toLong, x, y, None: Option[Double])
    }
    val d = rows.toDF("ts", "x", "y", "z").repartition(8)
    val global = Fill.ffillBfill(d, "ts", Seq("x", "y", "z"))
      .orderBy("ts").collect().map(r => (r.get(1), r.get(2), r.get(3))).toSeq
    val bucketed = Fill.ffillBfillBucketed(d, "ts", Seq("x", "y", "z"))
    val got = bucketed.orderBy("ts").collect()
      .map(r => (r.get(r.fieldIndex("x")), r.get(r.fieldIndex("y")),
        r.get(r.fieldIndex("z")))).toSeq
    assert(got == global)
    // scale contract: the plan contains no single-partition window
    val exec = bucketed.queryExecution.executedPlan
    val globalWindows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, "bucketed fill must not plan a global window")
  }

  test("fillMean uses the column mean (A1)") {
    val f = Fill.fillMean(df, Seq("x")).orderBy("ts").collect()
    assert(f(0).getDouble(1) == 3.0) // mean(2,4)
    assert(f(2).getDouble(1) == 3.0)
  }

  test("fillMedian uses the exact median (A2)") {
    val d = Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(10.0)),
      (4L, None: Option[Double])).toDF("ts", "x")
    val f = Fill.fillMedian(d, Seq("x")).orderBy("ts").collect()
    assert(f(3).getDouble(1) == 2.0)
  }

  test("strategy dispatch: drop_rows (reference name) and drop both drop") {
    // only ts=4 has both x and y non-null
    assert(Fill(df, "drop_rows", "ts", Seq("x", "y")).count() == 1)
    assert(Fill(df, "drop", "ts", Seq("x", "y")).count() == 1)
  }

  test("strategy dispatch: none and unknown pass through unchanged") {
    assert(Fill(df, "none", "ts", Seq("x")).count() == 4)
    assert(Fill(df, "banana", "ts", Seq("x"))
      .filter($"x".isNull).count() == 2)
  }

  test("fillWithAgg guards empty column list") {
    assert(Fill.fillMean(df, Nil).count() == 4)
  }

  test("no UnboundedFollowing frame in any fill plan (quadratic at scale)") {
    // Spark re-aggregates a shrinking (current..unboundedFollowing) frame
    // from scratch per row — O(n²) per partition; at 389k minutes/series
    // the flagship's bfill measured 30+ min per task before the
    // descending-running-frame rewrite (round 14). Results are pinned
    // equal by the tests above; this pins the PLAN so the frame can't
    // silently come back.
    val filled = Fill.ffillBfill(df, "ts", Seq("x"))
    val filledP = Fill.ffillBfill(df, "ts", Seq("x"), partitionCols = Seq("ts"))
    val bucketed = Fill.ffillBfillBucketed(df, "ts", Seq("x"))
    for (d <- Seq(filled, filledP, bucketed)) {
      val plan = d.queryExecution.optimizedPlan.toString.toLowerCase
      assert(!plan.contains("unboundedfollowing"), plan.take(400))
    }
  }
}
