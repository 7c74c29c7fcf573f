package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    ("a", Seq(1L, 2L, 3L)),
    ("a", Seq(10L, 20L, 30L)),
    ("b", Seq(-5L, 0L, 5L)),
    ("b", Seq(7L, -7L, 0L)),
    ("b", Seq(1L, 1L, 1L))).toDF("k", "v").repartition(5) // exercise merge paths

  test("graft_vec_sum_long is registered and matches the posexplode+sum shape") {
    val kernel = vecs.groupBy("k")
      .agg(call_function("graft_vec_sum_long", col("v")).as("s"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList))
    val exploded = vecs
      .select(col("k"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("k", "pos").agg(sum("x").as("s"))
      .groupBy("k")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        s => s.getField("s")).as("sv"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList))
    assert(kernel.toSeq == exploded.toSeq)
    assert(kernel.toMap.apply("a") == List(11L, 22L, 33L))
  }

  test("graft_vec_avg matches the per-dim avg(element_at) wide aggregate") {
    val dv = vecs.select(col("k"),
      transform(col("v"), x => x.cast("double") / 4).as("v"))
    val kernel = dv.groupBy("k")
      .agg(call_function("graft_vec_avg", col("v")).as("c"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toList))
    val wide = dv.groupBy("k")
      .agg(avg(element_at(col("v"), 1)).as("a0"),
        avg(element_at(col("v"), 2)).as("a1"),
        avg(element_at(col("v"), 3)).as("a2"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), List(r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    assert(kernel.toSeq == wide.toSeq)
  }

  test("null rows and null elements are skipped; unpopulated dims null out (avg) / zero (sum)") {
    val df = Seq(
      ("a", Some(Seq(Some(1L), None, Some(3L)))),
      ("a", None),
      ("a", Some(Seq(Some(9L), None, Some(7L))))).toDF("k", "v")
    val s = df.groupBy("k")
      .agg(call_function("graft_vec_sum_long", col("v")).as("s"))
      .collect()(0).getSeq[Long](1).toList
    assert(s == List(10L, 0L, 10L))
    val a = df.select(col("k"), col("v").cast("array<double>").as("v"))
      .groupBy("k").agg(call_function("graft_vec_avg", col("v")).as("c"))
      .collect()(0).getSeq[java.lang.Double](1).toList
    assert(a == List(5.0, null, 5.0))
  }

  test("centroids() on the kernel path equals the legacy exploded shape at 6dp") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val kernel = graft.sim.Ann.centroids(emb, "label", "embedding")
      .orderBy("label").collect()
      .map(r => (r.get(0), r.getSeq[Double](1).map(v => math.rint(v * 1e6) / 1e6).toList))
    val legacy = emb
      .select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
      .orderBy("label").collect()
      .map(r => (r.get(0), r.getSeq[Double](1).map(v => math.rint(v * 1e6) / 1e6).toList))
    assert(kernel.toSeq == legacy.toSeq)
  }
}
