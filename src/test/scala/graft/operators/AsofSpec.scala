package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "b", 3L),
    (4L, "a", 4L)).toDF("id", "k", "ts")
  private def right = Seq(("a", 4L, 100.0), ("a", 7L, 101.0), ("b", 9L, 102.0),
    ("a", 9L, 103.0)).toDF("k", "rts", "v")

  test("latest right row at or before each left ts, per key; ties inclusive") {
    val got = Asof.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"),
        if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Double]("v"))))
      .toSeq
    // id 1 (a, ts 5) -> rts 4; id 2 (a, ts 9) -> rts 9 INCLUSIVE; id 3
    // (b, ts 3) -> nothing earlier (b's only right row is at 9); id 4
    // (a, ts 4) -> rts 4 inclusive. Key isolation: b never sees a's rows.
    assert(got == Seq((1L, Some(100.0)), (2L, Some(103.0)), (3L, None),
      (4L, Some(100.0))), got.toString)
  }

  test("matches the naive max-per-group formulation on random data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(4).toString, rnd.nextInt(50).toLong))
      .toDF("id", "k", "ts")
    val rRows = for (k <- 0 until 4; t <- 0 until 50 if rnd.nextBoolean())
      yield (k.toString, t.toLong, rnd.nextDouble())
    val r = rRows.toDF("k", "rts", "v")
    val fast = Asof.joinAsOf(l, r, Seq("k"), "ts", "rts", Seq("v"))
      .collect().map(x => x.getAs[Long]("id") ->
        (if (x.isNullAt(x.fieldIndex("v"))) None else Some(x.getAs[Double]("v"))))
      .toMap
    // quadratic reference: range join + keep the max-rts row per left id
    val naive = l.join(r, l("k") === r("k") && r("rts") <= l("ts"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(l("id")).orderBy(r("rts").desc_nulls_last)))
      .filter(col("rk") === 1)
      .collect().map(x => x.getAs[Long]("id") ->
        (if (x.isNullAt(x.fieldIndex("v"))) None else Some(x.getAs[Double]("v"))))
      .toMap
    assert(fast.size == 200 && fast == naive)
  }

  test("plan: one keyed window, never a single-partition WindowExec") {
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.inputPlan)
        case _ => p.children
      }
      p +: kids.flatMap(nodes)
    }
    val all = nodes(Asof.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .queryExecution.executedPlan)
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
    // and the whole thing is union + window: no join node anywhere
    assert(!all.exists(n => n.nodeName.toLowerCase.contains("join")),
      all.map(_.nodeName).mkString(","))
  }

  test("a matched right row's NULL payload comes through, not an older value") {
    // right at ts=9 has v=NULL: left ts=12 must get NULL (the ts=9 ROW
    // matches), not leak ts=4's 100.0 through the fill
    val r = Seq(("a", 4L, Some(100.0)), ("a", 9L, None))
      .toDF("k", "rts", "v")
    val l = Seq((1L, "a", 12L), (2L, "a", 5L)).toDF("id", "k", "ts")
    val got = Asof.joinAsOf(l, r, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy("id").collect()
      .map(x => if (x.isNullAt(x.fieldIndex("v"))) None
                else Some(x.getAs[Double]("v"))).toSeq
    assert(got == Seq(None, Some(100.0)), got.toString)
  }

  test("rejects empty keys and payload collisions") {
    intercept[IllegalArgumentException] {
      Asof.joinAsOf(left, right, Seq.empty, "ts", "rts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Asof.joinAsOf(left.withColumn("v", lit(1)), right, Seq("k"), "ts",
        "rts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Asof.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
        direction = "nearest")
    }
  }

  test("direction=forward: earliest right row at or after, ties inclusive") {
    val got = Asof.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
        direction = "forward")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"),
        if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Double]("v"))))
      .toSeq
    // id 1 (a, ts 5) -> rts 7; id 2 (a, ts 9) -> rts 9 INCLUSIVE; id 3
    // (b, ts 3) -> rts 9 (forward finds b's later row the backward join
    // could not); id 4 (a, ts 4) -> rts 4 inclusive
    assert(got == Seq((1L, Some(101.0)), (2L, Some(103.0)), (3L, Some(102.0)),
      (4L, Some(100.0))), got.toString)
  }

  test("tolerance: out-of-bound matches null the payload, rows are kept") {
    // backward: id 1 (ts 5, match rts 4, gap 1) in-bound at tol=1;
    // id 2 (ts 9, match rts 9, gap 0) in; id 3 no match stays None;
    // id 4 (ts 4, rts 4, gap 0) in. At tol=0 id 1 drops to None.
    def run(tol: Long) =
      Asof.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
          tolerance = Some(tol))
        .orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"),
          if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Double]("v"))))
        .toSeq
    assert(run(1L) == Seq((1L, Some(100.0)), (2L, Some(103.0)), (3L, None),
      (4L, Some(100.0))))
    assert(run(0L) == Seq((1L, None), (2L, Some(103.0)), (3L, None),
      (4L, Some(100.0))))
    // forward + tolerance compose: id 3 (b, ts 3 -> rts 9, gap 6) nulls
    // at tol=5 but survives at tol=6
    def fwd(tol: Long) =
      Asof.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
          direction = "forward", tolerance = Some(tol))
        .orderBy("id").collect()
        .map(r => if (r.isNullAt(r.fieldIndex("v"))) None
                  else Some(r.getAs[Double]("v"))).toSeq
    assert(fwd(5L) == Seq(Some(101.0), Some(103.0), None, Some(100.0)))
    assert(fwd(6L) == Seq(Some(101.0), Some(103.0), Some(102.0), Some(100.0)))
  }
}
