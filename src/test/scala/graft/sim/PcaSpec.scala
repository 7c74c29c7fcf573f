package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  test("jacobiEigen: hand-checked 2x2, sign convention on the tied component") {
    val (ev, q) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < eps && math.abs(ev(1) - 1.0) < eps)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(q(0)(0) - r) < eps && math.abs(q(0)(1) - r) < eps)
    // second eigenvector (1,-1)/sqrt2: |coords| tie -> index 0 positive
    assert(math.abs(q(1)(0) - r) < eps && math.abs(q(1)(1) + r) < eps)
  }

  test("jacobiEigen: diagonal matrix is a no-op, eigenvalues sorted desc") {
    val (ev, q) = Pca.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(ev.toSeq == Seq(5.0, 3.0, 1.0))
    assert(q(0).toSeq == Seq(0.0, 1.0, 0.0))
    assert(q(2).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("fit: rank-1 data recovers the generating direction and its variance") {
    // x_t = t * (0.6, 0.8) for t in -3..3 -> mean 0, top eigvec (0.6, 0.8),
    // lambda1 = var_pop(t) = 4, lambda2 = 0
    val rows = (-3 to 3).map(t => Seq(0.6 * t, 0.8 * t)).toDF("v")
    val m = Pca.fit(rows, "v")
    assert(math.abs(m.eigenvalues(0) - 4.0) < 1e-8)
    assert(math.abs(m.eigenvalues(1)) < 1e-8)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-8)
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-8)
    assert(m.mean.forall(x => math.abs(x) < 1e-12))
  }

  test("fit + project: per-component projection variance equals the eigenvalue") {
    // deterministic 3-dim cloud (no RNG — integer formulas)
    val rows = (0 until 40).map { i =>
      Seq((i % 7).toDouble, ((i * 3) % 5).toDouble, ((i * i) % 11).toDouble)
    }.toDF("v")
    val m = Pca.fit(rows, "v")
    val p = Pca.project(rows, "v", m, k = 3)
      .select(col("proj")).as[Seq[Double]].collect()
    val n = p.length.toDouble
    (0 until 3).foreach { j =>
      val xs = p.map(_(j))
      val mu = xs.sum / n
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - m.eigenvalues(j)) < 1e-8,
        s"component $j: var $v vs lambda ${m.eigenvalues(j)}")
      // projections are centered: E[q.(x-mu)] = 0
      assert(math.abs(mu) < 1e-8)
    }
  }

  test("certify: all invariant flags pass on float input, trace matches var_pop sum") {
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq(((i * 13) % 17).toFloat, ((i * 5) % 7).toFloat,
        ((i * i) % 23).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    val r = Pca.certify(rows, "embedding", k = 2).collect()(0)
    assert(r.getLong(0) == 50L && r.getInt(1) == 4)
    // var_pop trace recomputed independently
    val vs = rows.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(var_pop(col("x").cast("double")).as("v"))
      .agg(sum("v")).collect()(0).getDouble(0)
    assert(math.abs(r.getDouble(2) - vs) < 1e-4, s"${r.getDouble(2)} vs $vs")
    assert((3 to 6).forall(r.getLong(_) == 1L), r.toString)
  }

  test("shortlistTopK: shortlist covering the corpus equals brute force exactly") {
    val corpus = (0L until 30L).map { i =>
      (i, Seq(((i * 13) % 17).toDouble, ((i * 5) % 7).toDouble,
        ((i * i) % 23).toDouble, (i % 3).toDouble))
    }.toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val m = Pca.fit(corpus, "embedding")
    val brute = Ann.bruteForceTopK(q, "qid", "qv", corpus, "vec_id", "embedding", 4)
      .orderBy("qid", "rank").collect()
    val pca = Pca.shortlistTopK(q, "qid", "qv", corpus, "vec_id", "embedding",
        m, kdims = 4, shortlist = Int.MaxValue, k = 4)
      .orderBy("qid", "rank").collect()
    assert(brute.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq ==
      pca.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq)
  }

  test("shortlistTopK: pruned shortlist returns k exact-cosine-ranked rows per query") {
    val corpus = (0L until 40L).map { i =>
      (i, Seq((i % 11).toDouble, ((i * 3) % 13).toDouble,
        ((i * 7) % 5).toDouble))
    }.toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1) // vec 0 is the zero vector
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val m = Pca.fit(corpus, "embedding")
    val r = Pca.shortlistTopK(q, "qid", "qv", corpus, "vec_id", "embedding",
        m, kdims = 2, shortlist = 10, k = 3).orderBy("rank").collect()
    assert(r.length == 3 && r.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    // ranks are by full-dim cosine, descending
    val cos = r.map(_.getDouble(2))
    assert(cos.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("certify: recon identity is non-vacuous (k=1 leaves a real tail)") {
    val rows = (0 until 30).map { i =>
      Seq((i % 5).toDouble, ((i * 7) % 11).toDouble, ((i * 2) % 9).toDouble)
    }.toDF("v")
    val m = Pca.fit(rows, "v")
    assert(m.eigenvalues.drop(1).sum > 0.1) // the tail the flag certifies
    val r = Pca.certify(rows, "v", k = 1).collect()(0)
    assert(r.getLong(6) == 1L)
  }
}
