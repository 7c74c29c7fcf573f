package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH bucketed variant as the 100 TB path.
  *
  * Scale design:
  *  - brute force is a broadcast nested-loop of Q query vectors against the
  *    corpus — linear in corpus size, parallel per partition, NO shuffle of
  *    the corpus; only the (Q × topK) result shuffles for ranking. Correct
  *    plan for small Q (the usual case).
  *  - LSH buckets both sides by hyperplane sign bits and equi-joins on the
  *    bucket key: candidate set shrinks ~2^bits-fold; never a cartesian join.
  *  - dot products use the `aggregate`/`zip_with` HOFs in double precision —
  *    codegen'd, no UDF.
  */
object Ann {

  /** Double-precision dot product of two array columns via HOFs. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. Uses the native codegen'd `graft_cosine` expression
    * when the session has GraftExtensions (one loop vs three interpreted
    * HOF folds); falls back to the pure-builtin composition otherwise. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession
      .filter(s => scala.util.Try(s.catalog.functionExists("graft_cosine"))
        .getOrElse(false))
      .map(_ => call_function("graft_cosine", a, b))
      .getOrElse(dot(a, b) / (norm(a) * norm(b)))

  /** Exact top-k cosine neighbors of each query vector.
    * `queries`: (qidCol, qvecCol) — must be small (it is broadcast);
    * `corpus`: (idCol, vecCol). Self-matches (qid == id) are excluded. */
  def bruteForceTopK(queries: DataFrame, qidCol: String, qvecCol: String,
                     corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries)) // Q×N, Q tiny: BNLJ scan
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(qvecCol), col(vecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: component h[i] of
    * plane p is a hash-derived value in [−0.5, 0.5). Seeded, reproducible,
    * no RNG state — so executors regenerate identical planes. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(lit(p), i), lit(1000003L)).cast("double") / 1000003.0) - 0.5

  /** Sign-bit LSH bucket key over `bits` random hyperplanes, using planes
    * `planeOffset .. planeOffset+bits-1` (the offset gives multi-table
    * variants independent plane sets from the same deterministic family). */
  def lshBucketPlanes(vec: Column, bits: Int, planeOffset: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bitCols = (0 until bits).map { p =>
      val proj = aggregate(zip_with(vec, dims,
        (v, i) => v.cast("double") * planeComponent(planeOffset + p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bitCols.reduce(_ + _)
  }

  /** Sign-bit LSH bucket key over `bits` random hyperplanes. */
  def lshBucket(vec: Column, bits: Int): Column = lshBucketPlanes(vec, bits, 0)

  /** md5-parity twin of [[lshBucket]]: plane component c(p,i) is a 24-bit
    * integer from the md5 hex of "p_i" (centered on 0), and the input vector
    * is quantized to floor(v·1e6) — the projection is an EXACT integer sum
    * (order-independent, no float rounding anywhere), so the bucket
    * assignment is bit-stable across engines and a DuckDB oracle can mirror
    * it. Products stay ≤ ~2^45 per term and ≤ ~2^51 per 64-dim sum — far
    * inside Long.
    *
    * The components are data-INDEPENDENT, so they are computed once on the
    * driver (JDK MessageDigest, same hex derivation the oracle SQL uses)
    * and shipped as literal arrays — zero digests at runtime, the plan is
    * pure integer zip_with/aggregate arithmetic. `dims` must equal the
    * vector length (zip_with would null-pad a mismatch). */
  def lshBucketMd5(vec: Column, bits: Int, dims: Int = 64): Column = {
    val bitCols = (0 until bits).map { p =>
      val planes = array((0 until dims).map(i =>
        lit(md5Hex24(s"${p}_$i") - 8388608L)): _*)
      val proj = aggregate(zip_with(vec, planes,
        (v, c) => floor(v.cast("double") * 1e6).cast("long") * c),
        lit(0L), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bitCols.reduce(_ + _)
  }

  /** First 6 hex chars of md5(s) as an integer — the driver-side mirror of
    * the oracle's `CAST('0x' || substr(md5(s), 1, 6) AS BIGINT)`. */
  private def md5Hex24(s: String): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 6), 16)
  }

  /** Johnson–Lindenstrauss-style random projection to `outDims` components
    * on the deterministic md5 plane family ("rp"-prefixed, independent of
    * the LSH planes): out[p] = Σᵢ ⌊vᵢ·10⁶⌋ · c(p,i) / (10⁶ · 2²³). The dot
    * products are exact integer sums over driver-precomputed literal
    * planes (zero digests at runtime) and the final division runs on
    * identical operands — bit-stable cross-engine with NO rounding, like
    * [[lshBucketMd5]]. The cheap dimensionality-reduction front of a
    * clustering / coarse-similarity pipeline. */
  def randomProjectionMd5(vec: Column, outDims: Int, dims: Int = 64): Column =
    array((0 until outDims).map { p =>
      val planes = array((0 until dims).map(i =>
        lit(md5Hex24(s"rp${p}_$i") - 8388608L)): _*)
      aggregate(zip_with(vec, planes,
        (v, c) => floor(v.cast("double") * 1e6).cast("long") * c),
        lit(0L), (acc, x) => acc + x).cast("double") / lit(1e6 * 8388608.0)
    }: _*)

  /** Approximate top-k: only corpus vectors in the SAME LSH bucket as the
    * query are scored — equi-join on the bucket key, no cartesian product.
    * Recall grows with fewer bits / multiple tables (see [[lshTopKMulti]]);
    * this single-table variant is the minimal scale shape. `bucketFn` picks
    * the hash basis (xxhash64-family default; [[lshBucketMd5]] for the
    * oracle twin). */
  def lshTopK(queries: DataFrame, qidCol: String, qvecCol: String,
              corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, bits: Int = 8,
              bucketFn: (Column, Int) => Column = lshBucket): DataFrame = {
    val qb = queries.withColumn("bucket", bucketFn(col(qvecCol), bits))
    val cb = corpus.withColumn("bucket", bucketFn(col(vecCol), bits))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(qvecCol), col(vecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Multi-table LSH top-k — the recall fix for the single-table variant: T
    * independent hyperplane tables, candidates unioned across tables, then
    * exact-scored and ranked. A query misses a true neighbor only if they
    * disagree in EVERY table (miss prob ≈ (1 − cos_angle-collision^bits)^T,
    * driven to ~0 by T), instead of in one.
    *
    * Scale shape: ONE corpus scan computes all T buckets (explode over the
    * per-table bucket array — not T passes), the candidate join is an
    * equi-join on (table, bucket) against broadcast query buckets, and only
    * the distinct (query, candidate) id pairs are re-joined for scoring —
    * vectors never ride through the union/distinct shuffle. */
  def lshTopKMulti(queries: DataFrame, qidCol: String, qvecCol: String,
                   corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, bits: Int = 8, tables: Int = 4): DataFrame = {
    def buckets(df: DataFrame, id: String, vc: String): DataFrame =
      df.select(col(id), explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            lshBucketPlanes(col(vc), bits, t * bits).as("bucket"))): _*))
          .as("_tb"))
        .select(col(id), col("_tb.t").as("t"), col("_tb.bucket").as("bucket"))
    val qb = buckets(queries, qidCol, qvecCol)
    val cb = buckets(corpus, idCol, vecCol)
    val cand = cb.join(broadcast(qb), Seq("t", "bucket"))
      .filter(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(idCol)).distinct()
    val scored = cand
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("cosine", cosine(col(qvecCol), col(vecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** IVF-style coarse quantization: per-label centroid table (posexplode +
    * two-level agg — one shuffle on (label, pos), then label). Serves both
    * as an IVF index build and as a per-class embedding summary. */
  def centroids(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(labelCol, "pos").agg(avg(col("v").cast("double")).as("mean_v"))
      .groupBy(labelCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean_v")))),
        s => s.getField("mean_v")).as("centroid"))

  /** The nearest cell for a vector given a (small, materialized) array of
    * (cell, cvec) structs: argmax by cosine with ascending-cell tiebreak.
    * Two passes, both map-only (no shuffle, no window): a `transform`
    * scoring each cell ONCE — inside an interpreted HOF fold a
    * multi-referenced expression is re-evaluated per reference, so scoring
    * inside the fold would cost 3 cosines per cell — then a fold comparing
    * the precomputed (sim, cell) structs with cheap field reads. Both are
    * order-independent, so the collect_list order feeding the array doesn't
    * matter. */
  private def nearestCell(vec: Column, cents: Column): Column = {
    val scored = transform(cents, c =>
      // both sides cast to the same DDL type: graft_cosine requires
      // exactly equal array types (element type AND containsNull)
      struct(cosine(vec.cast("array<double>"),
          c.getField("cvec").cast("array<double>")).as("sim"),
        c.getField("cell").as("cell")))
    aggregate(scored,
      struct(lit(-2.0).as("sim"), lit(null).cast("string").as("cell")),
      (acc, s) =>
        when(s.getField("sim") > acc.getField("sim") ||
            (s.getField("sim") === acc.getField("sim") &&
              s.getField("cell") < acc.getField("cell")),
          s).otherwise(acc)).getField("cell")
  }

  /** IVF top-k: the inverted-file two-stage ANN — the third search shape
    * next to brute force and LSH.
    *
    * Stage 0 (index): the coarse quantizer is the per-`labelCol` centroid
    * table ([[centroids]], 6-dp-rounded so the cells are cross-engine
    * stable; a k-means quantizer slots in identically). Every corpus row is
    * assigned to its nearest centroid — its inverted list.
    * Stage 1 (search): each query probes its `nprobe` nearest centroids and
    * exact-scores ONLY rows in those cells — the classic recall/cost knob.
    *
    * Scale shape: the centroid table is tiny and rides a broadcast into
    * BOTH assignment scans; corpus assignment is a map-only aggregate fold
    * (zero shuffle — not a window over corpus×cells); the search join is an
    * equi-join on the cell id against broadcast query probes. The corpus is
    * never all-paired and shuffles only on the final per-query ranking. */
  def ivfTopK(queries: DataFrame, qidCol: String, qvecCol: String,
              corpus: DataFrame, idCol: String, vecCol: String,
              labelCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    // localCheckpoint: the 1-row centroid table feeds BOTH the corpus
    // assignment and the query probes — without it each branch re-runs the
    // full centroid aggregation over the corpus (blocks are
    // reference-tracked and reclaimed when the frame is garbage)
    val cents = centroids(corpus, labelCol, vecCol)
      .select(col(labelCol).cast("string").as("cell"),
        transform(col("centroid"), c => round(c, 6)).as("cvec"))
      .agg(collect_list(struct(col("cell"), col("cvec"))).as("cents"))
      .localCheckpoint(true)
    val cells = corpus.crossJoin(broadcast(cents))
      .withColumn("_cell",
        nearestCell(col(vecCol).cast("array<double>"), col("cents")))
      .select(col(idCol), col(vecCol), col("_cell"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_sim").desc, col("_cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col(qidCol), col(qvecCol), explode(col("cents")).as("_c"))
      .withColumn("_sim",
        cosine(col(qvecCol).cast("array<double>"),
          col("_c.cvec").cast("array<double>")))
      .withColumn("_cell", col("_c.cell"))
      .withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("_cell"))
    val joined = cells.join(broadcast(probes), Seq("_cell"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(qvecCol), col(vecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }
  def cosineNearDup(corpus: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, bits: Int = 8,
                    bucketFn: (Column, Int) => Column = lshBucket): DataFrame = {
    val b = corpus.withColumn("bucket", bucketFn(col(vecCol), bits))
    val l = b.select(col(idCol).as("id1"), col(vecCol).as("v1"), col("bucket"))
    val r = b.select(col(idCol).as("id2"), col(vecCol).as("v2"), col("bucket"))
    l.join(r, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", cosine(col("v1"), col("v2")))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine").distinct()
  }
}
