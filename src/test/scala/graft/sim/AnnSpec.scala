package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 2.0f), Seq(1.0f, 0.0f), Seq(-3.0f, 0.0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Ann.cosine(col("a"), col("b")), Ann.cosine(col("a"), col("c")),
      Ann.cosine(col("a"), col("d"))).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks nearest first, excludes self") {
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val top = Ann.bruteForceTopK(q, "qid", "qv", corpus, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(top.length == 2)
    assert(top(0).getAs[Long]("vec_id") == 1L) // closest
    assert(top.forall(_.getAs[Long]("vec_id") != 0L))
  }

  test("bruteForceTopK plan broadcasts the query side") {
    val q = corpus.limit(1).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val plan = Ann.bruteForceTopK(q, "qid", "qv", corpus, "vec_id", "embedding", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"))
  }

  test("lshBucket groups identical vectors identically; lshTopK finds same-bucket hits") {
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val r = Ann.lshTopK(q, "qid", "qv", corpus, "vec_id", "embedding", 5, bits = 2)
      .collect()
    // vec 1 (nearly identical direction) must share vec 0's bucket at 2 bits
    assert(r.map(_.getAs[Long]("vec_id")).contains(1L))
    assert(r.forall(_.getAs[Long]("vec_id") != 0L))
  }

  test("cosineNearDup finds the near-identical pair without all-pairs") {
    val nd = Ann.cosineNearDup(corpus, "vec_id", "embedding", 0.95, bits = 2)
    val pairs = nd.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    val plan = nd.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("cosineNearDupAuto: bit count follows the corpus via the autoBits rule") {
    // the auto variant must be exactly the explicit-bits variant at
    // autoBits(N, targetCell) — the capacity rule is the only difference
    val n = corpus.count()
    val bits = Ann.autoBits(n, targetCell = 2)
    assert((2L << bits) >= n && (bits == 0 || (2L << (bits - 1)) < n))
    val auto = Ann.cosineNearDupAuto(corpus, "vec_id", "embedding", 0.95,
      targetCell = 2).orderBy("id1", "id2").collect().toSeq
    val explicit = Ann.cosineNearDup(corpus, "vec_id", "embedding", 0.95,
      bits = bits).orderBy("id1", "id2").collect().toSeq
    assert(auto == explicit)
  }

  test("lshTopK recall on clustered data: same-cluster neighbors are found") {
    // 4 well-separated direction clusters in 8-d; LSH must keep most
    // same-cluster neighbors (they share hyperplane signs with the query).
    val rng = new scala.util.Random(7)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, -1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      Array(-1f, 0f, 0f, 1f, 0f, 0f, 0f, -1f))
    val vecs = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => v + (rng.nextFloat() - 0.5f) * 0.2f).toSeq, i % 4)
    }
    val corpus = vecs.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Ann.bruteForceTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5, bits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall brute=${brute.size} lsh=${lsh.size}")
    // and every LSH hit is a genuine same-cluster neighbor
    val cluster = vecs.map(v => v._1 -> v._3).toMap
    assert(lsh.forall { case (q, n) => cluster(q) == cluster(n) })
  }

  test("lshTopKMulti: multi-table union lifts recall@5 to >= 0.9 (vs brute ground truth)") {
    // Same clustered fixture family as the single-table test. One table of
    // 4 bits loses neighbors whose bucket differs from the query's; 6
    // independent tables must recover near-full recall (a neighbor is missed
    // only if it disagrees with the query in EVERY table).
    val rng = new scala.util.Random(11)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, -1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      Array(-1f, 0f, 0f, 1f, 0f, 0f, 0f, -1f))
    val vecs = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => v + (rng.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Ann.bruteForceTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Ann.lshTopKMulti(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5, bits = 4, tables = 6)
    val hits = multi.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect hits).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall brute=${brute.size} multi=${hits.size}")
    assert(!multi.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("ivfTopK: nprobe=2 probed-cell search recovers near-full recall vs brute") {
    val rng = new scala.util.Random(13)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, -1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      Array(-1f, 0f, 0f, 1f, 0f, 0f, 0f, -1f))
    val vecs = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => v + (rng.nextFloat() - 0.5f) * 0.2f).toSeq, i % 4)
    }
    val corpus = vecs.toDF("vec_id", "embedding", "label")
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Ann.bruteForceTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(queries, "qid", "qv", corpus, "vec_id", "embedding",
      "label", 5, nprobe = 2)
    val hits = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect hits).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall brute=${brute.size} ivf=${hits.size}")
    assert(!ivf.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("lshTopKMultiProbe: Hamming-1 probes lift single-table recall@5 to >= 0.95") {
    val rng = new scala.util.Random(11)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, -1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      Array(-1f, 0f, 0f, 1f, 0f, 0f, 0f, -1f))
    val vecs = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => v + (rng.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Ann.bruteForceTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = Ann.lshTopKMultiProbe(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5, bits = 4, probes = 3)
    val hits = mp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect hits).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall=$recall brute=${brute.size} mp=${hits.size}")
    assert(!mp.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // multi-probe must strictly dominate the plain single-table recall here
    val single = Ann.lshTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5, bits = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val singleRecall = (brute intersect single).size.toDouble / brute.size
    assert(recall >= singleRecall, s"probe recall $recall < single $singleRecall")
  }

  test("ivfTopKKmeans: learned quantizer reaches recall@5 >= 0.9 on UNLABELED data") {
    // Same clustered family, but no label column — the quantizer must
    // discover the cells itself (md5-seeded fixed-point Lloyd).
    val rng = new scala.util.Random(17)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, -1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      Array(-1f, 0f, 0f, 1f, 0f, 0f, 0f, -1f))
    val vecs = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(v => v + (rng.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val brute = Ann.bruteForceTopK(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopKKmeans(queries, "qid", "qv", corpus, "vec_id",
      "embedding", 5, centers = 6, iters = 3, nprobe = 3)
    val hits = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect hits).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall brute=${brute.size} ivf=${hits.size}")
    assert(!ivf.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("label-IVF assignment has no cross-cell near-ties on the shipped fixtures") {
    // ivfTopK's cell assignment compares UNROUNDED double cosines on both
    // engines; it is oracle-safe only while no vector's top-2 centroid
    // similarities are within cross-engine float drift. Assert a gap far
    // above ulp noise (1e-7) on every fixture scale the gates use.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val path = s"/root/testdata/$sf/embeddings.parquet"
      if (new java.io.File(path).exists) {
        val emb = spark.read.parquet(path)
        val cents = Ann.centroids(emb, "label", "embedding")
          .collect().map { r =>
            r.getSeq[Double](r.fieldIndex("centroid"))
              .map(v => math.rint(v * 1e6) / 1e6).toArray // 6-dp, as in ivfTopK
          }
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
          d / math.sqrt(na * nb)
        }
        val vecs = emb.select("embedding").collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        val minGap = vecs.map { v =>
          val sims = cents.map(c => cos(v, c)).sorted(Ordering[Double].reverse)
          sims(0) - sims(1)
        }.min
        assert(minGap > 1e-7, s"$sf: top-2 centroid similarity gap $minGap " +
          "is inside float-drift range — quantize the assignment similarity")
      }
    }
  }

  test("int8 quantization: codes bounded, error bounded by half a step, zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: scale 0, codes 0
      (3L, Seq(1e-4f, -3e-4f, 2e-4f, 1e-4f))).toDF("vec_id", "embedding")
    val r = df.select($"vec_id", Ann.int8Report($"embedding").as("r"))
      .select($"vec_id", $"r.codes", $"r.scale", $"r.mae")
      .orderBy("vec_id").collect()
    val codes1 = r(0).getSeq[Long](1)
    assert(codes1 == Seq(64L, -127L, 32L, 0L)) // 0.5*254 = 127/2 rounds to 64
    assert(codes1.forall(c => math.abs(c) <= 127))
    // per-component error is at most half a quantization step
    val step1 = 1.0 / r(0).getDouble(2)
    assert(r(0).getDouble(3) <= step1 / 2 + 1e-12)
    assert(r(1).getSeq[Long](1).forall(_ == 0L) && r(1).getDouble(2) == 0.0
      && r(1).getDouble(3) == 0.0)
    // tiny magnitudes still span the full code range (scale adapts)
    assert(r(2).getSeq[Long](1).max == 85L || r(2).getSeq[Long](1).contains(-127L))
  }

  test("k-means|| init: near-duplicate seeds cannot collapse two cells onto one cluster") {
    // Two tight clusters; the 8 smallest-md5 rows could all land in one
    // cluster under first-k-by-md5 init. Farthest-first over the 4k-wide
    // candidate pool must place initial centers in BOTH clusters, so after
    // zero Lloyd iterations the learned cells already separate them.
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq(base + i * 1e-4f, base - i * 1e-4f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Ann.kmeansCentroidsFixedPoint(df, "vec_id", "embedding", 2, 0)
    assert(cents.size == 2)
    // one center per sign-cluster — a collapsed init would put both in one
    val signs = cents.map(_._2.head.sign).toSet
    assert(signs == Set(1L, -1L), cents.map(_._2.toSeq).toString)
  }

  test("kmeansCentroidsFixedPoint is deterministic and drops empty cells") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(-1.0f, 0.0f)), (3L, Seq(-0.9f, -0.1f))).toDF("vec_id", "embedding")
    val a = Ann.kmeansCentroidsFixedPoint(df, "vec_id", "embedding", 2, 2)
    val b = Ann.kmeansCentroidsFixedPoint(df, "vec_id", "embedding", 2, 2)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.map(_._2.toSeq) == b.map(_._2.toSeq))
    assert(a.nonEmpty && a.size <= 2)
    // centroid components are on the 1e-6 integer grid of the data range
    assert(a.forall(_._2.forall(c => math.abs(c) <= 1100000L)))
  }

  test("fixed-point k-means envelope: Long-safe distance sums for the documented ranges") {
    // worst distance sum = dims * (2 * 1000 * floor(vmax*1000))^2 with both
    // vectors at opposite extremes on the 1e-6 centroid grid. Embedding
    // fixtures (|v| < 1, 64 dims) have ~2^26 headroom; |v| <= 100 at 64
    // dims and |v| <= 23 at 4096 dims stay inside Long; |v| ~ 1000 breaks
    // already at 3 dims — the operator is for normalized-ish embeddings.
    def worstSum(vmax: Double, dims: Int): BigInt = {
      val q = BigInt(math.floor(vmax * 1000).toLong)
      val diff = q * 1000 * 2
      diff * diff * dims
    }
    assert(worstSum(1.0, 64) < BigInt(Long.MaxValue), "unit vectors, 64 dims")
    assert(worstSum(100.0, 64) < BigInt(Long.MaxValue), "|v|<=100, 64 dims")
    assert(worstSum(23.0, 4096) < BigInt(Long.MaxValue), "|v|<=23, 4096 dims")
    assert(worstSum(1000.0, 3) > BigInt(Long.MaxValue), "|v|~1000 overflows")
  }

  test("lshBucketMd5 equals the exact integer projection computed on the driver") {
    // Re-derive the md5-basis bucket for one vector in plain Scala (same
    // integer math the oracle SQL mirrors) and compare with the expression.
    import java.security.MessageDigest
    def hex24(s: String): Long = {
      val h = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 6), 16)
    }
    val vec = Seq(0.25f, -0.5f, 0.125f, 0.75f)
    val expected = (0 until 4).map { p =>
      val proj = vec.zipWithIndex.map { case (v, i) =>
        math.floor(v.toDouble * 1e6).toLong * (hex24(s"${p}_$i") - 8388608L)
      }.sum
      if (proj >= 0) 1L << p else 0L
    }.sum
    val got = Seq(Tuple1(vec)).toDF("embedding")
      .select(Ann.lshBucketMd5(col("embedding"), 4, dims = 4)).head().getLong(0)
    assert(got == expected)
  }

  test("cellOfMd5 (JVM quantizer) bit-matches lshBucketMd5 over real embeddings") {
    // The streaming path assigns cells with the closure-captured plane
    // matrix instead of the literal-heavy Catalyst tree — every cell must
    // be identical or streaming/batch semdedup admission would diverge.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bits = 10
    val planes = Ann.md5PlaneMatrix(bits)
    val viaExpr = emb.select(col("vec_id"),
        Ann.lshBucketMd5(col("embedding"), bits, dims = 64).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJvm = emb.select(col("vec_id"), col("embedding").cast("array<float>"))
      .collect()
      .map(r => r.getLong(0) ->
        Ann.cellOfMd5(r.getSeq[Float](1).toArray, planes)).toMap
    assert(viaJvm.nonEmpty && viaJvm == viaExpr)
    // dims guard fires loudly on a mismatched vector, like the expression's
    intercept[IllegalArgumentException] {
      Ann.cellOfMd5(Array(1.0f, 2.0f), planes)
    }
  }

  test("centroids: per-label mean vectors with ordered components") {
    val df = Seq((0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(0.0f, 2.0f)))
      .toDF("label", "embedding")
    val c = Ann.centroids(df, "label", "embedding").orderBy("label").collect()
    assert(c(0).getSeq[Double](c(0).fieldIndex("centroid")).toList == List(2.0, 4.0))
    assert(c(1).getSeq[Double](c(1).fieldIndex("centroid")).toList == List(0.0, 2.0))
  }

  test("pqCodes: identical vectors quantize losslessly") {
    // every subvector equals its codebook centroid -> recon_err == 0
    val v = Seq(0.5f, -0.25f, 0.125f, 1.0f)
    val df = (1L to 6L).map((_, v)).toDF("vec_id", "embedding")
    val r = Ann.pqCodes(df, "vec_id", "embedding",
        m = 2, ksub = 2, iters = 1, dims = 4)
      .orderBy("vec_id").collect()
    assert(r.length == 6)
    r.foreach { x =>
      assert(x.getAs[Double]("recon_err") == 0.0)
      assert(x.getAs[Int]("code_0") >= 0 && x.getAs[Int]("code_0") < 2)
    }
  }

  test("pqCodes: separated clusters get distinct codes per subspace") {
    // subspace 0 separates ids 1-3 (x~0) from 4-6 (x~10); subspace 1 is
    // shared -> code_0 splits the corpus, code_1 is constant-ish
    val lo = Seq(0.0f, 0.0f, 5.0f, 5.0f)
    val hi = Seq(10.0f, 10.0f, 5.0f, 5.0f)
    val df = ((1L to 3L).map((_, lo)) ++ (4L to 6L).map((_, hi)))
      .toDF("vec_id", "embedding")
    val r = Ann.pqCodes(df, "vec_id", "embedding",
        m = 2, ksub = 2, iters = 2, dims = 4)
      .orderBy("vec_id").collect()
    val c0 = r.map(_.getAs[Int]("code_0")).toSeq
    assert(c0.take(3).distinct.size == 1 && c0.drop(3).distinct.size == 1)
    assert(c0.head != c0.last, "the two clusters must land in different cells")
    // reconstruction from each cluster's own centroid is exact here:
    // both clusters are internally identical, so Lloyd converges onto them
    r.foreach(x => assert(x.getAs[Double]("recon_err") == 0.0))
  }

  test("pqCodes: recon_err is the exact integer distance on the e-6 grid") {
    // one subspace, one centroid (ksub=2 but duplicates collapse after an
    // update), hand-checkable: corpus {0.0, 0.002} -> centroid at floor
    // mean; err = sum of squared e-6-grid gaps / 1e12
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.002f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Ann.pqCodes(df, "vec_id", "embedding",
        m = 1, ksub = 2, iters = 0, dims = 2)
      .orderBy("vec_id").collect()
    // iters=0: codebook = farthest-first init = the two distinct vectors
    // themselves (oversample covers the full corpus) -> lossless
    r.foreach(x => assert(x.getAs[Double]("recon_err") == 0.0))
    assert(r.map(_.getAs[Int]("code_0")).distinct.length == 2)
  }

  test("pqTopK: ADC ranks the query's own cluster first") {
    // three tight clusters far apart; every query's top-3 must be its
    // own cluster's other members (ADC distance 0 inside, huge across)
    def v(base: Float) = Seq(base, base, base, base)
    val df = (0 until 12).map { i =>
      (i.toLong, v((i / 4) * 100.0f))
    }.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val r = Ann.pqTopK(q, "qid", "qv", df, "vec_id", "embedding",
        k = 3, m = 2, ksub = 3, iters = 1, dims = 4)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L),
      "cluster-0 members (ids 1-3) must outrank every other candidate")
    assert(r.forall(_.getAs[Double]("adc") == 0.0),
      "in-cluster ADC distance is exactly zero for identical vectors")
  }

  test("pqTopKRerank: exact cosine rerank of the ADC shortlist") {
    // same cluster fixture, query from the nonzero cluster (a zero query
    // vector has undefined cosine); the rerank stage must surface the
    // query's identical-cluster members with cosine exactly 1.0
    def v(base: Float) = Seq(base, base, base, base)
    val df = (0 until 12).map { i =>
      (i.toLong, v((i / 4) * 100.0f))
    }.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 4L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val r = Ann.pqTopKRerank(q, "qid", "qv", df, "vec_id", "embedding",
        k = 3, m = 2, ksub = 3, iters = 1, dims = 4, rerank = 6)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq == Seq(5L, 6L, 7L),
      "cluster-1 members (ids 5-7) must win the exact rerank")
    assert(r.forall(_.getAs[Double]("cosine") == 1.0))
  }

  test("semDedup: within-cell near-dups pruned, min id survives, outliers kept") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0),    // cell 0 keeper
      (1L, Seq(1.0f, 0.01f), 0),   // ~parallel to 0 -> dropped
      (2L, Seq(0.0f, 1.0f), 1),    // cell 1 keeper
      (3L, Seq(0.01f, 1.0f), 1),   // dropped
      (4L, Seq(0.0f, 1.0f), 1),    // identical to 2 -> dropped
      (5L, Seq(0.7f, -0.714f), 0)) // cell 0 outlier (cos ~0.7 < 0.9) kept
      .toDF("vec_id", "embedding", "label")
    val r = Ann.semDedup(df, "vec_id", "embedding", "label", threshold = 0.9)
      .orderBy("vec_id").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((0L, "0"), (2L, "1"), (5L, "0")))
  }

  test("autoBits: smallest b with targetCell·2^b >= n, exact at powers of two") {
    assert(Ann.autoBits(0L, 64) == 0)
    assert(Ann.autoBits(1L, 64) == 0)
    assert(Ann.autoBits(64L, 64) == 0)
    assert(Ann.autoBits(65L, 64) == 1)
    assert(Ann.autoBits(128L, 64) == 1)
    assert(Ann.autoBits(500L, 64) == 3)  // 64·8 = 512 >= 500
    assert(Ann.autoBits(512L, 64) == 3)  // boundary stays at 3
    assert(Ann.autoBits(513L, 64) == 4)
    assert(Ann.autoBits(2000L, 64) == 5) // 64·32 = 2048 >= 2000
    assert(Ann.autoBits(Int.MaxValue.toLong, 1) == 31)
  }

  test("semDedupAuto: bits=0 degenerates to one cell, pure threshold prune") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),   // keeper
      (1L, Seq(1.0f, 0.01f)),  // ~parallel to 0 -> dropped
      (2L, Seq(0.0f, 1.0f)),   // orthogonal -> kept
      (3L, Seq(0.01f, 1.0f)))  // ~parallel to 2 -> dropped
      .toDF("vec_id", "embedding")
    // n=4 <= targetCell=64 -> bits 0, single cell, all pairs compared
    val r = Ann.semDedupAuto(df, "vec_id", "embedding", threshold = 0.9)
      .orderBy("vec_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((0L, 0L), (2L, 0L)))
  }

  test("semDedupAuto: bits>0 — identical copies collapse to min id, distinct directions survive") {
    // 4 direction groups × 10 identical copies: identical vectors always
    // share a bucket so each group collapses to its min id; orthogonal
    // directions have cosine 0 < threshold, so a shared bucket across
    // groups (possible at 2 sign-bits... bits here: 16·2^b >= 40 -> b=2)
    // never drops a group keeper.
    val dirs = Seq(
      Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f, 0.0f),
      Seq(0.0f, 0.0f, 1.0f, 0.0f), Seq(0.0f, 0.0f, 0.0f, 1.0f))
    val df = (for (g <- 0 until 4; j <- 0 until 10)
      yield ((g * 10 + j).toLong, dirs(g))).toDF("vec_id", "embedding")
    val out = Ann.semDedupAuto(df, "vec_id", "embedding", threshold = 0.9,
      targetCell = 16, dims = 4)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val r = out.orderBy("vec_id").collect().map(_.getLong(0))
    assert(r.toSeq == Seq(0L, 10L, 20L, 30L))
  }

  test("semDedupAutoIncremental: batch pruned against base survivors and batch mates") {
    val base = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, Seq(1.0f, 0.01f)),   // near-dup of base 0 -> dropped
      (11L, Seq(0.0f, 1.0f)),    // identical to base 1 -> dropped
      (12L, Seq(0.7f, -0.7f)),   // novel direction -> kept
      (13L, Seq(0.71f, -0.7f)),  // near-dup of batch mate 12 -> dropped
      (14L, Seq(-1.0f, 0.0f)))   // cosine -1 to base 0 -> kept
      .toDF("vec_id", "embedding")
    // bits=0 and a 5-row batch: both bucketings degenerate to one cell,
    // so the prune is purely the threshold rule
    val r = Ann.semDedupAutoIncremental(incoming, base, "vec_id",
        "embedding", threshold = 0.9, bits = 0)
      .orderBy("vec_id").collect().map(_.getLong(0))
    assert(r.toSeq == Seq(12L, 14L))
  }

  test("semDedupAutoIncremental: oversized batch gets finer within-batch cells, identical copies still collapse") {
    // base: 10 identical copies of dir 0 (index bits = autoBits(10,16) = 0);
    // batch: 30 vectors in 3 identical-copy groups — batchBits =
    // max(0, autoBits(30,16)) = 1, so the self-join runs on finer cells
    // than the frozen index. Identical vectors share every sign bit, so
    // each group still collapses to its min id; group 0 arrivals are
    // killed by the base survivor through the index-cell join.
    val dirs = Seq(
      Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f, 0.0f),
      Seq(0.0f, 0.0f, 1.0f, 0.0f))
    val base = (0 until 10).map(j => (j.toLong, dirs(0)))
      .toDF("vec_id", "embedding")
      .filter(col("vec_id") === 0L) // the deduped survivor set
    val incoming = (for (g <- 0 until 3; j <- 0 until 10)
      yield ((100 + g * 10 + j).toLong, dirs(g))).toDF("vec_id", "embedding")
    val r = Ann.semDedupAutoIncremental(incoming, base, "vec_id",
        "embedding", threshold = 0.9, bits = 0, targetCell = 16, dims = 4)
      .orderBy("vec_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    // survivors: min id of groups 1 and 2; every cell is the INDEX cell
    // (bits=0 -> 0) regardless of the finer batch bucketing
    assert(r.toSeq == Seq((110L, 0L), (120L, 0L)))
  }
}
