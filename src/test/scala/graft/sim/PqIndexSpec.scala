package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // 3 separated clusters of 4 identical vectors, 4 dims — the PQ fixture
  private def v(base: Float) =
    Seq(base + 1.0f, base + 2.0f, base + 3.0f, base + 4.0f)
  private def corpus = (0 until 12).map { i =>
    (i.toLong, v((i / 4) * 100.0f))
  }.toDF("vec_id", "embedding")

  test("persisted ADC search returns exactly what in-memory pqTopK returns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    PqIndex.build(corpus, "vec_id", "embedding", dir,
      m = 2, ksub = 3, iters = 1, dims = 4)
    val q = corpus.filter($"vec_id" === 4L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val fromIndex = PqIndex.search(q, "qid", "qv", spark, dir, k = 3, dims = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val inMemory = Ann.pqTopK(q, "qid", "qv", corpus, "vec_id", "embedding",
        k = 3, m = 2, ksub = 3, iters = 1, dims = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(fromIndex.nonEmpty && fromIndex.sameElements(inMemory),
      s"index ${fromIndex.toSeq} vs in-memory ${inMemory.toSeq}")
  }

  test("persisted rerank search equals in-memory pqTopKRerank; index stores no vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqr").toString
    PqIndex.build(corpus, "vec_id", "embedding", dir,
      m = 2, ksub = 3, iters = 1, dims = 4)
    // the codes table carries only id + codes — the compression claim
    val codeCols = spark.read.parquet(s"$dir/codes").columns.toSeq
    assert(codeCols == Seq("vec_id", "code_0", "code_1"), codeCols.toString)
    val q = corpus.filter($"vec_id" === 4L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val fromIndex = PqIndex.search(q, "qid", "qv", spark, dir, k = 3, dims = 4,
        rerankFrom = Some((corpus, "vec_id", "embedding")), rerank = 6)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val inMemory = Ann.pqTopKRerank(q, "qid", "qv", corpus, "vec_id",
        "embedding", k = 3, m = 2, ksub = 3, iters = 1, dims = 4, rerank = 6)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(fromIndex.sameElements(inMemory),
      s"index ${fromIndex.toSeq} vs in-memory ${inMemory.toSeq}")
    // cluster-1 members (ids 5-7) win the exact rerank
    assert(fromIndex.map(_._2).toSet == Set(5L, 6L, 7L))
  }

  test("append codes a batch with the frozen codebooks; ADC search sees it; codebooks untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqa").toString
    PqIndex.build(corpus, "vec_id", "embedding", dir,
      m = 2, ksub = 3, iters = 1, dims = 4)
    val before = PqIndex.loadCodebooks(spark, dir)
    // twin of cluster 1: must receive cluster 1's exact codes
    val batch = Seq((100L, v(100.0f))).toDF("vec_id", "embedding")
    assert(PqIndex.append(batch, "vec_id", "embedding", spark, dir,
      dims = 4) == 1L)
    val after = PqIndex.loadCodebooks(spark, dir)
    assert(before.length == after.length)
    before.zip(after).foreach { case (a, b) =>
      assert(a.map(_._1) == b.map(_._1))
      a.zip(b).foreach { case ((_, x), (_, y)) => assert(x.sameElements(y)) }
    }
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == 13)
    val twinCodes = codes.filter($"vec_id" === 100L).collect()(0)
    val clusterCodes = codes.filter($"vec_id" === 4L).collect()(0)
    assert(twinCodes.getInt(1) == clusterCodes.getInt(1) &&
           twinCodes.getInt(2) == clusterCodes.getInt(2),
      s"frozen coding diverged: $twinCodes vs $clusterCodes")
    // the appended twin rides the ADC ranking like any build-time row
    val q = corpus.filter($"vec_id" === 5L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val top = PqIndex.search(q, "qid", "qv", spark, dir, k = 4, dims = 4)
      .collect().map(_.getLong(1)).toSet
    assert(top.contains(100L), s"appended row absent from ADC top-k: $top")
  }

  test("rebuild from the same corpus bit-matches the persisted codebooks") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_pq1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_pq2").toString
    PqIndex.build(corpus, "vec_id", "embedding", d1, m = 2, ksub = 3,
      iters = 2, dims = 4)
    PqIndex.build(corpus, "vec_id", "embedding", d2, m = 2, ksub = 3,
      iters = 2, dims = 4)
    val b1 = PqIndex.loadCodebooks(spark, d1)
    val b2 = PqIndex.loadCodebooks(spark, d2)
    assert(b1.length == b2.length)
    b1.zip(b2).foreach { case (x, y) =>
      assert(x.map(_._1) == y.map(_._1))
      x.zip(y).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
    }
  }
}
