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

  test("append: frozen-quantizer assignment, search sees the batch, staleness reports both generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    IvfIndex.build(corpus, "vec_id", "embedding", dir, centers = 3, iters = 2)
    val centsBefore = IvfIndex.loadCentroids(spark, dir)
    // batch: an exact twin of vector 5 (same cluster → same cell, qerr
    // equal to 5's) plus a drifted outlier far from every build cluster
    // (outlier components stay < ~1e3: the exact-integer distance is
    // (q·1000 − c)² summed over dims, so ~1e9-scale diffs are the Long-
    // safe ceiling — the documented 10⁻³-grid envelope)
    val batch = Seq(
      (100L, v(100.0f)),                       // twin of ids 4-7's cluster
      (101L, Seq(800.0f, 800.0f, 800.0f, 800.0f))) // drifted
      .toDF("vec_id", "embedding")
    val n = IvfIndex.append(batch, "vec_id", "embedding", spark, dir)
    assert(n == 2L)
    // append must NOT touch the quantizer
    val centsAfter = IvfIndex.loadCentroids(spark, dir)
    assert(centsBefore.map(_._1) == centsAfter.map(_._1))
    centsBefore.zip(centsAfter).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b)) }
    // the appended twin is immediately searchable: querying vector 5
    // (ids 4-7 share one embedding) must surface id 100 among the top 4
    // — all four are cosine-1 matches, id-ascending tiebreak
    val q = corpus.filter($"vec_id" === 5L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val top = IvfIndex.search(q, "qid", "qv", spark, dir, k = 4, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(top == Set(4L, 6L, 7L, 100L), s"appended twin not found: $top")
    // staleness: every cell row has n_base > 0 or n_new > 0; the twin's
    // cell has qerr_new ~ qerr of its base cluster, and the outlier's
    // cell shows qerr_new >> qerr_base (the rebuild signal)
    val rep = IvfIndex.staleness(spark, dir).collect()
    assert(rep.map(_.getLong(1)).sum == 12L, s"base population: ${rep.toSeq}")
    assert(rep.map(_.getLong(2)).sum == 2L, s"appended population: ${rep.toSeq}")
    val drifted = rep.filter(r => !r.isNullAt(4) && !r.isNullAt(3))
      .filter(r => r.getDouble(4) > 100 * math.max(r.getDouble(3), 1e-9))
    assert(drifted.nonEmpty,
      s"outlier did not surface as quantization-error drift: ${rep.toSeq}")
  }

  test("meta pins column names: renamed append batches land under the index schema; pre-meta/pre-gen indexes still read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_meta").toString
    IvfIndex.build(corpus, "vec_id", "embedding", dir, centers = 3, iters = 2)
    // batch arrives under DIFFERENT column names — must not fork the schema
    val batch = Seq((100L, v(0.5f))).toDF("uid", "emb")
    IvfIndex.append(batch, "uid", "emb", spark, dir)
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.columns.toSeq.sorted == Seq("_cell", "_gen", "embedding", "vec_id"))
    assert(cells.filter($"vec_id" === 100L).count() == 1)
    // staleness resolves the vector column BY NAME even after the append
    assert(IvfIndex.staleness(spark, dir).count() > 0)

    // a pre-meta, pre-append index (no meta/ dir, no _gen column): both
    // readers fall back to the positional layout and a _gen of 0
    val legacy = java.nio.file.Files.createTempDirectory("graft_ivf_legacy").toString
    IvfIndex.build(corpus, "vec_id", "embedding", legacy, centers = 3, iters = 2)
    def rm(f: java.io.File): Unit = graft.util.Fs.deleteRecursively(f)
    rm(new java.io.File(s"$legacy/meta"))
    val stripped = spark.read.parquet(s"$legacy/cells")
      .select("vec_id", "embedding", "_cell")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_tmp").toString
    stripped.write.partitionBy("_cell").mode("overwrite").parquet(s"$tmp/cells")
    rm(new java.io.File(s"$legacy/cells"))
    new java.io.File(s"$tmp/cells").renameTo(new java.io.File(s"$legacy/cells"))
    val st = IvfIndex.staleness(spark, legacy)
    assert(st.count() > 0 && st.agg(sum("n_new")).as[Long].head() == 0L)
    val q = corpus.filter($"vec_id" === 4L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    assert(IvfIndex.search(q, "qid", "qv", spark, legacy, k = 3).count() == 3)
  }

  test("staleness->rebuild loop: drifted appends trip the ratio, rebuild restores single-probe recall") {
    // clusters need nonzero intra-cluster spread (identical members would
    // make qerr_base 0 and the ratio undefined-by-contract)
    val jittered = (0 until 12).map { i =>
      (i.toLong, v((i / 4) * 100.0f).map(_ + (i % 4) * 0.1f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_reb").toString
    IvfIndex.build(jittered, "vec_id", "embedding", dir, centers = 3, iters = 2)
    // fresh index: nothing appended -> no ratio, no rebuild
    assert(IvfIndex.stalenessRatio(spark, dir).isEmpty)
    assert(IvfIndex.rebuildIfStale(spark, dir).isEmpty)
    // healthy append (cluster members) keeps the ratio near 1 - no rebuild
    val healthy = Seq((100L, v(100.0f).map(_ + 0.05f)),
      (101L, v(0.0f).map(_ + 0.05f))).toDF("vec_id", "embedding")
    IvfIndex.append(healthy, "vec_id", "embedding", spark, dir, gen = 1L)
    val r1 = IvfIndex.stalenessRatio(spark, dir)
    assert(r1.exists(_ < 2.0), s"healthy append read as drift: $r1")
    assert(IvfIndex.rebuildIfStale(spark, dir, ratioThreshold = 2.0).isEmpty)
    // drifted append: a NEW cluster straddling the 0- and 100-clusters, so
    // the frozen quantizer splits it across two cells
    val drifted = (0 until 6).map { i =>
      (200L + i, v(40.0f + 4 * i))
    }.toDF("vec_id", "embedding")
    IvfIndex.append(drifted, "vec_id", "embedding", spark, dir, gen = 2L)
    val r2 = IvfIndex.stalenessRatio(spark, dir)
    assert(r2.exists(_ >= 2.0), s"drift not detected: $r2")

    // single-probe recall for a drifted query, against brute-force truth
    val all = jittered.unionByName(healthy).unionByName(drifted)
    val q = drifted.filter($"vec_id" === 202L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    def recall(): Double = {
      val got = IvfIndex.search(q, "qid", "qv", spark, dir, k = 5, nprobe = 1)
        .select("vec_id").as[Long].collect().toSet
      val truth = Ann.bruteForceTopK(q, "qid", "qv", all, "vec_id",
          "embedding", 5)
        .select("vec_id").as[Long].collect().toSet
      (got & truth).size.toDouble / truth.size
    }
    val before = recall()
    assert(before <= 0.6, s"straddled cluster should degrade recall: $before")
    // the policy fires, retrains on build+appends, swaps atomically
    val rebuilt = IvfIndex.rebuildIfStale(spark, dir, ratioThreshold = 2.0,
      centers = 4, iters = 2)
    assert(rebuilt.nonEmpty)
    // post-rebuild: all rows present as generation 0, ratio undefined again
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == 20 &&
      cells.agg(max("_gen")).as[Long].head() == 0L)
    assert(IvfIndex.stalenessRatio(spark, dir).isEmpty)
    val after = recall()
    assert(after == 1.0,
      s"rebuild should give the drifted cluster its own cell: $after")
  }

  test("crash window: readers serve .old WITHOUT renaming; recover() repairs explicitly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash")
      .resolve("idx").toString
    IvfIndex.build(corpus, "vec_id", "embedding", dir, centers = 3, iters = 2)
    val q = corpus.filter($"vec_id" === 4L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val healthyTop = IvfIndex.search(q, "qid", "qv", spark, dir, k = 3)
      .collect().map(_.getLong(1)).toSet

    // simulate a rebuild crash between move-out and move-in: path gone,
    // previous index at .old (exactly rebuild's intermediate state)
    val d = new java.io.File(dir)
    val old = new java.io.File(s"$dir.old")
    assert(d.renameTo(old))
    // a reader resolves to .old and serves the same answer — and must NOT
    // rename anything (the round-11 resolveRoot did, which let a reader
    // racing a LIVE rebuild's swap window discard the completed rebuild)
    val crashTop = IvfIndex.search(q, "qid", "qv", spark, dir, k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(crashTop == healthyTop)
    assert(!d.exists() && old.exists(),
      "reader mutated the layout: resolveRoot must be read-only")
    assert(IvfIndex.staleness(spark, dir).count() > 0 && !d.exists())

    // explicit repair, roll-back flavor (no completed rebuild on disk)
    assert(IvfIndex.recover(dir) == "rolled-back")
    assert(d.exists() && !old.exists())
    assert(IvfIndex.search(q, "qid", "qv", spark, dir, k = 3)
      .collect().map(_.getLong(1)).toSet == healthyTop)

    // roll-FORWARD flavor: crash left a COMPLETED rebuild at .rebuilding —
    // recover prefers the newest data and moves it in
    val tmp = new java.io.File(s"$dir.rebuilding")
    IvfIndex.build(corpus, "vec_id", "embedding", tmp.getPath,
      centers = 3, iters = 2)
    assert(d.renameTo(old))
    assert(IvfIndex.recover(dir) == "rolled-forward")
    assert(d.exists() && !old.exists() && !tmp.exists())
    assert(IvfIndex.search(q, "qid", "qv", spark, dir, k = 3)
      .collect().map(_.getLong(1)).toSet == healthyTop)

    // healthy index: recover is a no-op that sweeps stale leftovers
    assert(old.mkdirs())
    assert(IvfIndex.recover(dir) == "healthy")
    assert(d.exists() && !old.exists())
  }

  test("rebuild RETAINS .old: a reader that resolved mid-swap can finish its lazy reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_retain")
      .resolve("idx").toString
    IvfIndex.build(corpus, "vec_id", "embedding", dir, centers = 3, iters = 2)
    IvfIndex.rebuild(spark, dir, centers = 3, iters = 2)
    // the previous generation stays on disk after a SUCCESSFUL swap — a
    // concurrent search that resolved to .old during the two-rename window
    // reads its cells lazily and must not find a deleted directory
    // (round-12 deleted it here; ADVICE r12 item 1)
    val old = new java.io.File(s"$dir.old")
    assert(old.exists(), ".old must survive a successful rebuild swap")
    assert(spark.read.parquet(s"${old.getPath}/cells").count() == corpus.count())
    // the stale copy is swept by maintenance entry points, not by reads:
    // recover() on a healthy index clears it
    assert(IvfIndex.recover(dir) == "healthy")
    assert(!old.exists())
    // ...and the NEXT rebuild's pre-clean also starts from a swept slate
    IvfIndex.rebuild(spark, dir, centers = 3, iters = 2)
    assert(old.exists())
    IvfIndex.rebuild(spark, dir, centers = 3, iters = 2)
    assert(old.exists(), "second rebuild leaves ITS previous generation")
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
