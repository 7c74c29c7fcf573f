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
