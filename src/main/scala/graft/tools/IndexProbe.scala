package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the build-once/search-many amortization the
  * persisted ANN indexes exist for. Replicates the sf embeddings m×
  * (rotated, shifted ids — the ScaleProbe recipe, distinct vectors),
  * then times (a) one IVF/PQ index build, (b) `searches` repeated
  * queries against the PERSISTED index, and (c) the same queries on the
  * retrain-every-call in-memory path. The claim under test: persisted
  * search cost is independent of the build, so the in-memory path costs
  * ~build+search per query while the index path pays build once.
  * Usage: {{{ runMain graft.tools.IndexProbe /root/testdata/sf0.1 8 5 }}} */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val searches = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.embeddings(spark, dir)
    val corpus = (0 until m).map { i =>
      val rot = i % 64
      val rotated = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), lit(rot + 1), lit(64 - rot)),
          slice(col("embedding"), lit(1), lit(rot)))
      emb.select((col("vec_id") + lit(i.toLong << 40)).as("vec_id"),
        rotated.as("embedding"))
    }.reduce(_ unionByName _).persist()
    val n = corpus.count()

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"""{"op":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }

    def queryFrame(i: Int) = corpus.filter(col("vec_id") === i.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    // append batch: one un-replicated embeddings table (1/m of the
    // replicated index, so 1/8 at the default m=8), id-shifted to stay
    // distinct — the nightly-ingest shape whose cost must be O(batch),
    // not O(index)
    val batch = emb.select((col("vec_id") + lit(99L << 40)).as("vec_id"),
      col("embedding"))

    val ivfDir = graft.Queries.scratchDir("probe_ivf")
    time("ivf_build")(graft.sim.IvfIndex.build(corpus, "vec_id", "embedding",
      ivfDir, centers = 16, iters = 2))
    time("ivf_append")(graft.sim.IvfIndex.append(batch, "vec_id", "embedding",
      spark, ivfDir))
    time(s"ivf_search_x$searches") {
      (0 until searches).foreach { i =>
        graft.sim.IvfIndex.search(queryFrame(i), "qid", "qv", spark, ivfDir,
          k = 5, nprobe = 2).count()
      }
    }
    time(s"ivf_inmemory_x$searches") {
      (0 until searches).foreach { i =>
        graft.sim.Ann.ivfTopKKmeans(queryFrame(i), "qid", "qv", corpus,
          "vec_id", "embedding", k = 5, centers = 16, iters = 2,
          nprobe = 2).count()
      }
    }

    // ---- append→drift→rebuild loop (round-10 verdict item 6) ----
    // Worst-case drift for a frozen quantizer: clusters that STRADDLE two
    // existing cells. For up to 8 mutual-nearest centroid pairs, plant a
    // corpus-proportional cluster (max(64, n/64) vectors — a realistic
    // drift batch is sized like an ingest batch, and a vanishing drift
    // fraction would rightly not move the retrained quantizer) at the
    // pair's midpoint, nudged alternately
    // toward either centroid — the frozen assignment splits every cluster
    // half/half across the two cells, so a single-probe search can reach
    // only its own half; recall@(3/4 cluster) — a k that MUST span both
    // halves — degrades well below 1 until the staleness-triggered
    // rebuild (which retrains on
    // build+appends and swaps atomically) gives the drifted mass its own
    // cells and restores it.
    {
      import spark.implicits._
      // centroids in original units
      val centsD = graft.sim.IvfIndex.loadCentroids(spark, ivfDir)
        .map { case (id, arr) => (id, arr.map(_ / 1e6)) }
      val dims = centsD.head._2.length
      def d2(x: Array[Double], y: Array[Double]): Double =
        x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
      // mutual straddle pairs: each centroid with its nearest neighbor,
      // kept only when the midpoint's two nearest centroids ARE the pair
      // (otherwise the planted cluster would not split)
      val pairs = centsD.map { case (ia, a) =>
          val (ib, b) = centsD.filter(_._1 != ia)
            .minBy { case (_, c) => d2(a, c) }
          if (ia < ib) (ia, a, ib, b) else (ib, b, ia, a)
        }.distinct
        .filter { case (ia, a, ib, b) =>
          val mid = a.zip(b).map { case (x, y) => (x + y) / 2 }
          centsD.sortBy { case (_, c) => d2(mid, c) }.take(2)
            .map(_._1).toSet == Set(ia, ib)
        }.take(8)
      // base per-dim quantization MSE → base point-centroid distance R;
      // clusters sit √8·R off the midpoint ORTHOGONALLY to every
      // (centroid − midpoint) direction, so all centroid distances grow
      // by the same |offset|² — the cell ORDERING (and the half/half
      // straddle split the ±25% axis nudge decides) is exactly preserved
      // while drifted qerr lands ≈ 9× the base, decisively over the bar
      val qb = graft.sim.IvfIndex.staleness(spark, ivfDir)
        .agg((sum(col("qerr_base") * col("n_base")) / sum(col("n_base")))
          .as("m")).collect().head.getDouble(0)
      val target = math.sqrt(8.0 * qb * dims / 1e6)
      val clusterSize = math.max(64L, n / 64L)
      val drifted = (for {
        ((_, a, _, b), p) <- pairs.zipWithIndex
        j <- 0L until clusterSize
      } yield {
        val side = if (j % 2 == 0) -1.0 else 1.0
        val mid = a.zip(b).map { case (x, y) => (x + y) / 2 }
        val axis = a.indices.map(d => b(d) - a(d)).toArray
        // deterministic direction, Gram-Schmidt-orthogonalized against
        // EVERY (centroid − mid) so no third cell can jump the ordering
        var o = a.indices.map(d => ((p * 31 + d * 17) % 11 - 5).toDouble + 0.01).toArray
        for ((_, c) <- centsD) {
          val v = c.indices.map(d => c(d) - mid(d)).toArray
          val vn2 = v.map(x => x * x).sum
          if (vn2 > 0) {
            val dot = o.zip(v).map { case (x, y) => x * y }.sum
            o = o.zip(v).map { case (x, y) => x - dot / vn2 * y }
          }
        }
        val oLen = math.sqrt(o.map(x => x * x).sum)
        val vec = a.indices.map { d =>
          // ±25% axis nudge (sides at the 25%/75% points — decisively
          // inside each half, and above the 10⁻³ quantization grid)
          (mid(d) + side * 0.25 * axis(d) + o(d) / oLen * target).toFloat
        }
        ((500L << 40) + p * clusterSize + j, vec)
      }).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
      time("ivf_drift_append")(graft.sim.IvfIndex.append(drifted, "vec_id",
        "embedding", spark, ivfDir, gen = 2L))
      println(s"""{"op":"ivf_staleness_ratio","value":${
        graft.sim.IvfIndex.stalenessRatio(spark, ivfDir).getOrElse(-1.0)}}""")
      val everything = corpus.unionByName(batch).unionByName(drifted)
      val kRec = (clusterSize * 3 / 4).toInt
      // a centroid layout can yield fewer (even zero) mutual-nearest
      // straddle pairs — query only the clusters that exist, and report
      // the scenario as skipped rather than printing a 0/0 NaN record
      val nQueries = math.min(4, pairs.size)
      def recall48(): Double = {
        val qs = (0 until nQueries).map { p =>
          drifted.filter(col("vec_id") === (500L << 40) + p * clusterSize)
            .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        }.reduce(_ unionByName _)
        val got = graft.sim.IvfIndex.search(qs, "qid", "qv", spark, ivfDir,
            k = kRec, nprobe = 1)
          .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
        val truth = graft.sim.Ann.bruteForceTopK(qs, "qid", "qv", everything,
            "vec_id", "embedding", kRec)
          .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
        truth.map { case (q, t) =>
          val g = got.getOrElse(q, Array.empty).map(_._2).toSet
          (g & t.map(_._2).toSet).size.toDouble / t.length
        }.sum / truth.size
      }
      if (nQueries == 0) {
        println("""{"op":"ivf_drift_recall","skipped":"no straddle pairs for this centroid layout"}""")
      } else {
        val before = recall48()
        val rebuilt = time("ivf_rebuild_if_stale")(
          graft.sim.IvfIndex.rebuildIfStale(spark, ivfDir,
            ratioThreshold = 2.0, centers = 16, iters = 2))
        val after = recall48()
        println(f"""{"op":"ivf_drift_recall@$kRec%d","before":$before%.3f,"after":$after%.3f,"rebuilt":${rebuilt.nonEmpty}}""")
      }
    }

    val pqDir = graft.Queries.scratchDir("probe_pq")
    time("pq_build")(graft.sim.PqIndex.build(corpus, "vec_id", "embedding",
      pqDir, m = 8, ksub = 8, iters = 2, dims = 64))
    time("pq_append")(graft.sim.PqIndex.append(batch, "vec_id", "embedding",
      spark, pqDir, dims = 64))
    time(s"pq_search_x$searches") {
      (0 until searches).foreach { i =>
        graft.sim.PqIndex.search(queryFrame(i), "qid", "qv", spark, pqDir,
          k = 5, dims = 64,
          rerankFrom = Some((corpus, "vec_id", "embedding"))).count()
      }
    }
    time(s"pq_inmemory_x$searches") {
      (0 until searches).foreach { i =>
        graft.sim.Ann.pqTopKRerank(queryFrame(i), "qid", "qv", corpus,
          "vec_id", "embedding", k = 5, m = 8, ksub = 8, iters = 2,
          dims = 64, rerank = 50).count()
      }
    }
    spark.stop()
  }
}
