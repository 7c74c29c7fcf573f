package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // 3 tight clusters of 4 vectors in 4 dims — same shape as the PQ fixture
  private def v(base: Float) =
    Seq(base + 1.0f, base + 2.0f, base + 3.0f, base + 4.0f)
  private def corpus = (0 until 12).map { i =>
    (i.toLong, v((i / 4) * 100.0f))
  }.toDF("vec_id", "embedding")

  test("persisted search returns exactly what the in-memory IVF path returns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val nCells = IvfIndex.build(corpus, "vec_id", "embedding", dir,
      centers = 3, iters = 2)
    assert(nCells >= 1 && nCells <= 3)
    val q = corpus.filter($"vec_id" === 4L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val fromIndex = IvfIndex.search(q, "qid", "qv", spark, dir,
        k = 3, nprobe = 1)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val inMemory = Ann.ivfTopKKmeans(q, "qid", "qv", corpus, "vec_id",
        "embedding", k = 3, centers = 3, iters = 2, nprobe = 1)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(fromIndex.nonEmpty && fromIndex.sameElements(inMemory),
      s"index ${fromIndex.toSeq} vs in-memory ${inMemory.toSeq}")
    // the probed cluster's own members (ids 5-7) win the exact rerank
    assert(fromIndex.map(_._2).toSet == Set(5L, 6L, 7L))
  }

  test("rebuild from the same corpus bit-matches the persisted centroids") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_ivf1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_ivf2").toString
    IvfIndex.build(corpus, "vec_id", "embedding", d1, centers = 3, iters = 2)
    IvfIndex.build(corpus, "vec_id", "embedding", d2, centers = 3, iters = 2)
    val c1 = IvfIndex.loadCentroids(spark, d1)
    val c2 = IvfIndex.loadCentroids(spark, d2)
    assert(c1.map(_._1) == c2.map(_._1))
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
  }

  test("search scans only the probed cell partitions (partition pruning contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf3").toString
    IvfIndex.build(corpus, "vec_id", "embedding", dir, centers = 3, iters = 2)
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val df = IvfIndex.search(q, "qid", "qv", spark, dir, k = 3, nprobe = 1)
    df.collect()
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan) // post-collect: the finalized adaptive plan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => p.children
      }
      p +: (kids ++ p.subqueries).flatMap(allNodes)
    }
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val cellScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("cells")))
    assert(cellScan.isDefined, "no file scan over the cells table")
    assert(cellScan.get.partitionFilters.exists(_.toString.contains("_cell")),
      s"cell scan is not partition-pruned: ${cellScan.get.partitionFilters}")
    // with nprobe=1 the pruned scan must read at most one cell directory
    assert(cellScan.get.relation.location.listFiles(
      cellScan.get.partitionFilters, Nil).size <= 1)
  }
}
