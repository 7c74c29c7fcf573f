package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearestCellSpec extends SparkSpec {
  import spark.implicits._

  private val cents = Seq(
    (0, Array(1000000L, 0L)),        // cell 0 at (1, 0) on the 1e-6 grid
    (1, Array(0L, 1000000L)),        // cell 1 at (0, 1)
    (2, Array(1000000L, 0L)))        // cell 2: EXACT duplicate of cell 0

  private def kernel(q: Seq[Long]): Option[Int] = {
    val mat = array(cents.map { case (_, a) => array(a.map(lit(_)).toSeq: _*) }: _*)
    val ids = array(cents.map { case (c, _) => lit(c) }: _*)
    val r = Seq(Tuple1(q)).toDF("q")
      .select(call_function("graft_nearest_cell", col("q"), mat, ids)).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("graft_nearest_cell is registered and picks the min-distance cell") {
    assert(spark.catalog.functionExists("graft_nearest_cell"))
    assert(kernel(Seq(900L, 100L)) == Some(0))  // q=(0.9, 0.1) -> cell 0
    assert(kernel(Seq(100L, 900L)) == Some(1))
  }

  test("exact-distance ties break to the smallest cell id") {
    // equidistant from the duplicated centroid pair (cells 0 and 2)
    assert(kernel(Seq(1000L, 0L)) == Some(0))
    // equidistant between cells 0 and 1 -> smaller id wins
    assert(kernel(Seq(500L, 500L)) == Some(0))
  }

  test("kernel output is bit-identical to the HOF argmin fold on random vectors") {
    val rng = new scala.util.Random(23)
    val qs = (0 until 200).map(_ => Seq.fill(2)((rng.nextInt(4001) - 2000).toLong))
    val df = qs.map(Tuple1(_)).toDF("q")
    val mat = array(cents.map { case (_, a) => array(a.map(lit(_)).toSeq: _*) }: _*)
    val ids = array(cents.map { case (c, _) => lit(c) }: _*)
    // the HOF composition nearestCellInt falls back to when no extension:
    val scored = array(cents.map { case (cell, arr) =>
      struct(
        aggregate(zip_with(col("q"), array(arr.map(lit(_)).toSeq: _*),
          (a, b) => (a * lit(1000L) - b) * (a * lit(1000L) - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(cell).as("cell"))
    }: _*)
    val rows = df.select(
      call_function("graft_nearest_cell", col("q"), mat, ids).as("k"),
      array_min(scored).getField("cell").as("h")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("mismatched vector length yields null (no silent wrong cell)") {
    assert(kernel(Seq(1L, 2L, 3L)).isEmpty)
  }
}
