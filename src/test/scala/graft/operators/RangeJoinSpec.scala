package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L),
    (5L, 25L)).toDF("pid", "p")
  private def intervals = Seq((10L, 5L, 20L), (11L, 20L, 21L), (12L, 0L, 3L))
    .toDF("iid", "s", "e")

  test("half-open containment, exactly one row per qualifying pair") {
    // bucketWidth 4 makes interval 10 span five buckets — a duplicate per
    // shared bucket is the classic bug this asserts against
    val got = RangeJoin.joinRange(points, intervals, "p", "s", "e", 4L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    // p=5 hits [5,20) (start inclusive); p=20 misses [5,20) (end
    // exclusive) but hits [20,21); [0,3) catches nothing
    assert(got == Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 4L)), got.toString)
  }

  test("matches the naive cross-filter on random data, any bucket width") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "p")
    val ivs = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong
      (1000L + i, s, s + 1 + rnd.nextInt(120))
    }.toDF("iid", "s", "e")
    val naive = pts.crossJoin(ivs)
      .filter(col("s") <= col("p") && col("p") < col("e"))
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    for (w <- Seq(1L, 7L, 64L, 4096L)) {
      val got = RangeJoin.joinRange(pts, ivs, "p", "s", "e", w)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(got == naive, s"bucketWidth=$w: ${got.size} vs ${naive.size}")
    }
  }

  test("plan: hash equi-join on the bucket key, never a nested loop") {
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.inputPlan)
        case _ => p.children
      }
      p +: kids.flatMap(nodes)
    }
    val all = nodes(RangeJoin.joinRange(points, intervals, "p", "s", "e", 4L)
      .queryExecution.executedPlan)
    assert(!all.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
      n.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      all.map(_.nodeName).mkString(","))
  }

  test("rejects overlapping column names and bad widths") {
    intercept[IllegalArgumentException] {
      RangeJoin.joinRange(points, intervals.withColumnRenamed("iid", "pid"),
        "p", "s", "e", 4L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.joinRange(points, intervals, "p", "s", "e", 0L)
    }
  }
}
