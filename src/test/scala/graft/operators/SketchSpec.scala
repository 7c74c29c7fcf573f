package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate aggregates a 100 TB user reaches for first
  * (HyperLogLog++ distinct counts, quantile sketches) validated against
  * their exact twins at oracle scale — the sketches are deterministic for
  * a given input and accuracy, but not cross-engine replayable, so the
  * contract asserted here is the error bound, not a hash. */
class SketchSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct (HLL++) lands within 5% of exact") {
    val r = docs.agg(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(exact > 100, s"fixture too small for a meaningful check: $exact")
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("percentile_approx brackets the exact median at high accuracy") {
    val r = docs.agg(
      expr("percentile(n_chars, 0.5)").as("exact"),
      expr("percentile_approx(n_chars, 0.5, 10000)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getLong(1).toDouble
    // percentile_approx returns an actual element; at accuracy 10000 over
    // 500 rows it must land within one neighbor of the true median
    val sorted = docs.select(col("n_chars").cast("long")).collect()
      .map(_.getLong(0)).sorted
    val idx = sorted.indexWhere(_ >= approx)
    assert(math.abs(idx - sorted.length / 2) <= 2,
      s"exact=$exact approx=$approx rank=$idx of ${sorted.length}")
  }
}
