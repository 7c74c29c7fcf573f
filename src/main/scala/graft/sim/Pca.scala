package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * stage a 100 TB embedding pipeline runs before ANN indexing / clustering
  * (reduce 64→k dims so every downstream distance costs k multiplies, and
  * IVF/PQ cells train on decorrelated axes).
  *
  * Split of labor (the only shape that scales):
  *  - the CORPUS-sized work is two map-side-combinable `treeAggregate`
  *    passes — pass 1 accumulates (n, Σx, Σxxᵀ) = d + d(d+1)/2 doubles per
  *    partition (d=64 → ~17 KB partials, independent of corpus size);
  *    pass 2 (optional, certification) measures the realized reconstruction
  *    error with the fitted basis broadcast. Nothing corpus-sized ever
  *    reaches the driver and no shuffle moves vectors.
  *  - the DRIVER-sized work is the d×d eigendecomposition (cyclic Jacobi,
  *    deterministic — no RNG, fixed sweep order), O(d³) on 64×64: trivial,
  *    and independent of corpus size by construction.
  *
  * This mirrors the repo's k-means‖ rule (Ann.scala): driver work bounded
  * by model size, never by data size.
  */
object Pca {

  /** Fitted basis: population mean, eigenvalues of the population
    * covariance in descending order, and the matching orthonormal
    * eigenvectors (components(i) pairs with eigenvalues(i)). Sign
    * convention: each component's largest-|coordinate| entry is positive
    * (ties → lowest index), so the basis is unique and runs are
    * comparable. */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
                         components: Array[Array[Double]]) {
    def dims: Int = mean.length
  }

  /** Fit the full d-dim eigenbasis of `vecCol` (array<float|double>).
    * One treeAggregate over the corpus; covariance is the POPULATION one
    * (divide by n — matches `var_pop`), accumulated in double precision
    * with each float widened first. */
  def fit(df: DataFrame, vecCol: String): Model = {
    // null vectors and vectors with null ELEMENTS are both dropped —
    // either would NPE on unboxing in the seqOp
    val data = df.select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), x => x.isNull))
    val first = data.head(1)
    require(first.nonEmpty, "pca fit: empty input")
    val d = first(0).getSeq[Double](0).length
    val nSum = d + d * (d + 1) / 2
    // acc layout: [0] = n, [1..d] = Σx, then upper-triangle Σ x_i x_j
    val acc = data.rdd.treeAggregate(new Array[Double](1 + nSum))(
      seqOp = { (a, r: Row) =>
        val v = r.getSeq[Double](0)
        require(v.length == d, s"pca fit: ragged vector ${v.length} != $d")
        a(0) += 1.0
        var i = 0
        var t = 1 + d
        while (i < d) {
          val vi = v(i)
          a(1 + i) += vi
          var j = i
          while (j < d) { a(t) += vi * v(j); j += 1; t += 1 }
          i += 1
        }
        a
      },
      combOp = { (a, b) =>
        var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
      }, depth = 2)
    val n = acc(0)
    require(n > 0, "pca fit: empty input")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 1 + d
    while (i < d) {
      var j = i
      while (j < d) {
        val c = acc(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    Model(mean, evals, evecs)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweep the
    * strict upper triangle in row-major order, rotating away each
    * off-diagonal element, until the off-diagonal Frobenius mass falls
    * under `tol · max(1, ‖A‖_F)` (RELATIVE — an absolute cutoff would be
    * unreachable for large-trace covariances, whose off-diagonal mass
    * floors at ~machine-eps·‖A‖, silently burning all `maxSweeps`), the
    * mass stops decreasing (floor reached), or `maxSweeps`. Deterministic
    * — fixed sweep order, no pivoting by magnitude — so the fitted basis
    * is reproducible bit-for-bit for fixed input. Returns (eigenvalues
    * desc, row-major orthonormal eigenvectors under the sign convention
    * of [[Model]]). */
  private[sim] def jacobiEigen(m: Array[Array[Double]], tol: Double = 1e-12,
                               maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val q = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val frob = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    val scaledTol = tol * math.max(1.0, frob)
    var sweep = 0
    var off = offDiag(a)
    var prevOff = Double.PositiveInfinity
    while (off > scaledTol && off < prevOff && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var r = p + 1
        while (r < d) {
          val apr = a(p)(r)
          if (math.abs(apr) > 1e-300) {
            // classic symmetric Schur: tan via the stable root
            val theta = (a(r)(r) - a(p)(p)) / (2.0 * apr)
            val tan =
              math.signum(if (theta == 0.0) 1.0 else theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tan * tan + 1.0)
            val s = tan * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akr = a(k)(r)
              a(k)(p) = c * akp - s * akr
              a(k)(r) = s * akp + c * akr
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val ark = a(r)(k)
              a(p)(k) = c * apk - s * ark
              a(r)(k) = s * apk + c * ark
              val qkp = q(k)(p); val qkr = q(k)(r)
              q(k)(p) = c * qkp - s * qkr
              q(k)(r) = s * qkp + c * qkr
              k += 1
            }
          }
          r += 1
        }
        p += 1
      }
      prevOff = off
      off = offDiag(a)
      sweep += 1
    }
    // sort eigenpairs by eigenvalue descending (ties → original index),
    // transpose Q's columns into row vectors, apply the sign convention
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val v = Array.tabulate(d)(k => q(k)(i))
      var best = 0
      var k = 1
      while (k < d) {
        if (math.abs(v(k)) > math.abs(v(best))) best = k
        k += 1
      }
      if (v(best) < 0) { k = 0; while (k < d) { v(k) = -v(k); k += 1 } }
      v
    }.toArray
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Project each vector onto the top-`k` components: map-only, the model
    * rides as a broadcast-sized closure literal (k·d doubles). Output is
    * the input plus `outCol` = array<double> of length k. */
  def project(df: DataFrame, vecCol: String, model: Model, k: Int,
              outCol: String = "proj"): DataFrame = {
    require(k > 0 && k <= model.dims, s"need 0 < k <= ${model.dims}, got $k")
    val comps = model.components.take(k)
    val mean = model.mean
    val d = model.dims
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((mean, comps))
    val projUdf = udf { (v: Seq[Double]) =>
      // null vector → null projection (the fit-side filter's contract,
      // so a single bad row degrades to null instead of an NPE'd task)
      if (v == null) null
      else {
        val (mu, cs) = bc.value
        val c = new Array[Double](d)
        var i = 0; while (i < d) { c(i) = v(i) - mu(i); i += 1 }
        cs.map { q =>
          var s = 0.0
          var j = 0; while (j < d) { s += q(j) * c(j); j += 1 }
          s
        }
      }
    }
    // null ELEMENTS degrade to a null projection too (same posture as the
    // fit-side `!exists(v, isNull)` drop) — inside the UDF a null element
    // would NPE the task on Seq[Double] unboxing before the guard could see
    // it, so the check must live in the Column expression
    val vv = transform(col(vecCol), x => x.cast("double"))
    df.withColumn(outCol,
      when(vv.isNull || exists(vv, x => x.isNull),
        lit(null).cast("array<double>")).otherwise(projUdf(vv)))
  }

  /** PCA-reduced ANN: the "PCA + rerank" read path (shortlist in the
    * reduced space, exact rerank in the original space) — the standard
    * cheap-candidates trick when embeddings are too wide for brute
    * distances but the corpus is too small (or too churned) to justify a
    * trained IVF/PQ index. At 100 TB the reduced space is where the IVF
    * cells would live; here the shortlist is a broadcast-BNLJ scan like
    * [[Ann.bruteForceTopK]], so the plan properties carry: the corpus is
    * never reshuffled — two map-only projections, one broadcast scan, and
    * a shortlist-keyed (Q·shortlist rows, broadcastable) rerank join.
    *
    * Shortlist metric is cosine over the PROJECTED (centered) vectors;
    * the final ranking is exact full-dim cosine over shortlist members
    * only, so shortlist quality affects recall, never correctness of the
    * returned ordering. With shortlist ≥ corpus size this IS brute force
    * (spec-asserted). */
  def shortlistTopK(queries: DataFrame, qidCol: String, qvecCol: String,
                    corpus: DataFrame, idCol: String, vecCol: String,
                    model: Model, kdims: Int, shortlist: Int,
                    k: Int): DataFrame = {
    require(shortlist >= k, s"need shortlist >= k, got $shortlist < $k")
    // the reduced scan carries ONLY (qid, id, _rcos) into the shortlist
    // window — the full-dim vectors must not ride through the qid
    // exchange (Q copies of the corpus would); they are re-fetched below
    // by id for shortlist members only
    val pc = project(corpus, vecCol, model, kdims, "_pv")
      .select(col(idCol), col("_pv"))
    val pq = project(queries, qvecCol, model, kdims, "_pq")
      .select(col(qidCol), col("_pq"))
    // a zero projection (query at the mean, or orthogonal to the kept
    // basis) makes the reduced cosine NaN, which Spark sorts ABOVE every
    // real value — clamp to below-minimum so such rows never crowd the
    // shortlist; the exact rerank is unaffected either way
    val rawCos = Ann.cosine(col("_pq"), col("_pv"))
    val reduced = pc.crossJoin(broadcast(pq)) // Q×N, Q tiny: BNLJ scan
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("_rcos",
        when(isnan(rawCos), lit(-2.0)).otherwise(rawCos))
      .select(col(qidCol), col(idCol), col("_rcos"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_rcos").desc, col(idCol))
    val cand = reduced.withColumn("_r", row_number().over(ws))
      .filter(col("_r") <= shortlist)
      .select(col(qidCol), col(idCol))
    // rerank join: Q·shortlist rows — broadcast onto the corpus to fetch
    // full-dim vectors map-only, then the tiny query frame joins in.
    // The broadcast hint is withheld for degenerate shortlists (the
    // full-corpus certification twin) where Q·N ids would be the payload
    // — AQE picks the shape there.
    val candSide = if (shortlist <= 100000) broadcast(cand) else cand
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    corpus.select(col(idCol), col(vecCol))
      .join(candSide, Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol).as("_qv"))),
        Seq(qidCol))
      .withColumn("cosine", Ann.cosine(col("_qv"), col(vecCol)))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Certification report — ONE row of exact corpus facts plus literal-1
    * flags (the sketch-certification pattern: eigenvectors are not
    * cross-engine replayable, so the oracle-visible contract is the
    * invariants):
    *  - `n`, `dims` exact; `trace` = Σ per-dim var_pop (rounded 4 dp —
    *    the inline comment at the rounding explains why 4 — DuckDB-
    *    replayable);
    *  - `orth_ok`: max |QQᵀ − I| ≤ 1e-8 over the full basis;
    *  - `desc_ok`: eigenvalues non-increasing;
    *  - `trace_ok`: |Σλ − trace| ≤ 1e-6·max(1, trace) (rotation preserves
    *    the trace — ties the eigensolver to the replayable aggregate);
    *  - `recon_ok`: measured mean ‖x−μ‖² − ‖Q_k(x−μ)‖² equals Σ_{i>k} λᵢ
    *    within the same tolerance (the Pythagoras identity for an
    *    orthonormal basis — a second corpus pass certifying the basis
    *    against the data, not against itself). */
  def certify(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val model = fit(df, vecCol)
    val d = model.dims
    require(k > 0 && k <= d, s"need 0 < k <= $d, got $k")
    // pass 2: (n, Σ‖x−μ‖², Σ‖Q_k(x−μ)‖²). The trace is taken from THIS
    // pass (Σ‖x−μ‖²/n = Σ per-dim var_pop), not from the model's eigen-sum
    // — deriving it from the eigenvalues would make trace_ok circular.
    val bc = spark.sparkContext.broadcast((model.mean, model.components.take(k)))
    val data = df.select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), x => x.isNull))
    val acc = data.rdd.treeAggregate(new Array[Double](3))(
      seqOp = { (a, r: Row) =>
        val v = r.getSeq[Double](0)
        val (mu, cs) = bc.value
        val c = new Array[Double](d)
        var i = 0; while (i < d) { c(i) = v(i) - mu(i); i += 1 }
        var tot = 0.0
        i = 0; while (i < d) { tot += c(i) * c(i); i += 1 }
        var proj = 0.0
        var j = 0
        while (j < cs.length) {
          val q = cs(j)
          var s = 0.0
          i = 0; while (i < d) { s += q(i) * c(i); i += 1 }
          proj += s * s
          j += 1
        }
        a(0) += 1.0; a(1) += tot; a(2) += proj
        a
      },
      combOp = { (a, b) =>
        a(0) += b(0); a(1) += b(1); a(2) += b(2); a
      }, depth = 2)
    val n = acc(0)
    val traceMeasured = acc(1) / n
    val residMeasured = (acc(1) - acc(2)) / n
    val evalSum = model.eigenvalues.sum
    val tailSum = model.eigenvalues.drop(k).sum
    val tol = 1e-6 * math.max(1.0, traceMeasured)
    val orthMax = {
      var worst = 0.0
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) {
          var s = 0.0
          var t = 0
          while (t < d) { s += model.components(i)(t) * model.components(j)(t); t += 1 }
          val target = if (i == j) 1.0 else 0.0
          worst = math.max(worst, math.abs(s - target))
          j += 1
        }
        i += 1
      }
      worst
    }
    val descOk = model.eigenvalues.sliding(2).forall {
      case Array(a1, a2) => a1 >= a2 - 1e-12
      case _ => true
    }
    import spark.implicits._
    // HALF_UP — DuckDB round() semantics (rint would be half-even). 4 dp,
    // not the registry's usual 6: unlike the same-formula-both-sides
    // roundings elsewhere, the oracle recomputes the trace as Σ var_pop
    // with a DIFFERENT summation algorithm, so the cross-engine drift is
    // ~1e-10 relative rather than ulp-level — 4 dp keeps the half-up
    // boundary 4 orders of magnitude away from it.
    Seq((n.toLong, d,
      BigDecimal(traceMeasured)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      if (orthMax <= 1e-8) 1L else 0L,
      if (descOk) 1L else 0L,
      if (math.abs(evalSum - traceMeasured) <= tol) 1L else 0L,
      if (math.abs(residMeasured - tailSum) <= tol) 1L else 0L))
      .toDF("n", "dims", "trace", "orth_ok", "desc_ok", "trace_ok", "recon_ok")
  }
}
