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
  /** Symmetric int8 quantization of an embedding vector: scale =
    * 127 / max|v|, q_i = round(v_i · scale) ∈ [−127, 127] — the classic
    * 4× storage/bandwidth lever for 100 TB embedding tables (int8 + one
    * float scale per vector instead of 64 floats). All-zero vectors
    * quantize to zeros (scale 0 by convention, no division). Every step is
    * per-row with a FIXED fold order, so the quantized codes and the
    * reconstruction error are deterministic and cross-engine
    * oracle-checkable (round-half-away ties are the one theoretical
    * divergence and cannot occur on the fixture grid). */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = aggregate(vec, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = when(maxAbs > 0.0, lit(127.0) / maxAbs).otherwise(lit(0.0))
    transform(vec, v => round(v.cast("double") * scale).cast("long"))
  }

  /** Per-vector int8 reconstruction report: (codes, scale, mean abs error).
    * Dequantized value = q_i / scale; the error fold runs in array order on
    * both engines. Dispatches to the native single-pass kernel
    * (`graft_int8_report`, bit-parity spec-asserted) when the extension is
    * installed — the compositional form below is three interpreted HOF
    * folds per vector, which priced the row's MATERIALIZED output at 60×
    * its count-shaped price in the r15 divergence table (round-16
    * order #4).
    *
    * Dispatch contract (applies equally to [[cosine]] and
    * `nearestCellInt`, which use the same pattern): the kernel probe
    * reads `SparkSession.getActiveSession` at COLUMN-CONSTRUCTION time —
    * a `Column` carries no session, so the DataFrame that will analyze
    * the plan cannot be consulted here. In multi-session apps the
    * extension must therefore be installed (`spark.sql.extensions =
    * graft.expressions.GraftExtensions`) on every session that analyzes
    * plans built from this helper, or resolution of the native function
    * fails. `newSession()` clones — including
    * `StreamingConf.withStatePartitions` scopes — re-apply the builder's
    * extensions automatically, so the registry rides along
    * (spec-asserted in StreamingConfSpec); only a session built WITHOUT
    * the extension mixing with one built with it can mismatch, and the
    * worst cases are a loud unresolved-function error (active had it,
    * analyzer didn't) or a silent fallback to the bit-identical composed
    * plan (the reverse) — never a wrong answer. */
  def int8Report(vec: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession
      .filter(s => scala.util.Try(
        s.catalog.functionExists("graft_int8_report")).getOrElse(false))
      .map(_ => call_function("graft_int8_report", vec))
      .getOrElse(int8ReportComposed(vec))

  /** The compositional (built-in HOF) twin — the parity oracle the native
    * kernel is spec-checked against, and the fallback when the extension
    * is not installed. */
  def int8ReportComposed(vec: Column): Column = {
    val maxAbs = aggregate(vec, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = when(maxAbs > 0.0, lit(127.0) / maxAbs).otherwise(lit(0.0))
    val codes = transform(vec, v => round(v.cast("double") * scale).cast("long"))
    val errSum = aggregate(zip_with(vec, codes,
      (v, q) => abs(v.cast("double") -
        when(scale > 0.0, q.cast("double") / scale).otherwise(lit(0.0)))),
      lit(0.0d), (acc, e) => acc + e)
    struct(codes.as("codes"), scale.as("scale"),
      (errSum / size(vec)).as("mae"))
  }

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

  /** THE shared fixed-point md5-plane recipe — the bit-stability contract
    * with the DuckDB oracles lives here and only here: plane component
    * c(p,i) = hex24(md5("<prefix><p>_<i>")) − 2^23 (a 24-bit integer,
    * data-independent → computed once on the driver with JDK MessageDigest,
    * shipped as literal arrays, zero digests at runtime), input quantized
    * to floor(v·10⁶). Each output entry is the EXACT integer dot product —
    * order-independent, no float rounding anywhere. Products stay ≤ ~2^45
    * per term and ≤ ~2^51 per 64-dim sum — far inside Long. `dims` must
    * equal the vector length (zip_with would null-pad a mismatch). */
  private def md5PlaneDots(vec: Column, prefix: String, nPlanes: Int,
                           dims: Int): Column = {
    // hard guard: zip_with null-pads a length mismatch and the null dot
    // would silently become 0-bits downstream — fail loudly instead
    val guarded = when(assert_true(size(vec) === dims,
      lit(s"md5 plane family: vector length must equal dims=$dims")).isNull, vec)
    array((0 until nPlanes).map { p =>
      val planes = array((0 until dims).map(i =>
        lit(md5Hex24(s"$prefix${p}_$i") - 8388608L)): _*)
      aggregate(zip_with(guarded, planes,
        (v, c) => floor(v.cast("double") * 1e6).cast("long") * c),
        lit(0L), (acc, x) => acc + x)
    }: _*)
  }

  /** md5-parity twin of [[lshBucket]]: sign bits of the [[md5PlaneDots]]
    * integer projections — bucket assignment is bit-stable across engines
    * and a DuckDB oracle mirrors it. */
  def lshBucketMd5(vec: Column, bits: Int, dims: Int = 64): Column = {
    // the dots array is referenced ONCE (zip_with) — per-bit element_at
    // references would re-evaluate the whole projection array per bit
    val dots = md5PlaneDots(vec, "", bits, dims)
    val bitVals = zip_with(dots, sequence(lit(0), lit(bits - 1)),
      (d, p) => when(d >= 0, call_function("shiftleft", lit(1L), p))
        .otherwise(lit(0L)))
    aggregate(bitVals, lit(0L), (acc, v) => acc + v)
  }

  /** The md5 LSH plane family as a DRIVER-SIDE matrix (bits × dims longs —
    * a few KB): the same c(p,i) constants [[lshBucketMd5]] ships as plan
    * literals, for consumers that assign cells in JVM code instead of a
    * Catalyst expression. The streaming quantizer is the motivating case
    * (round-13 order #6): the bits×dims-literal HOF expression tree was
    * re-analyzed and interpreted per MICRO-BATCH, and the per-batch
    * planning + per-row lambda interpretation dominated the probe's
    * semdedup row by ~5× over the actual arithmetic — a closure-captured
    * matrix plus [[cellOfMd5]]'s tight loop is planned once and runs at
    * memory speed. */
  def md5PlaneMatrix(bits: Int, dims: Int = 64,
                     prefix: String = ""): Array[Array[Long]] =
    Array.tabulate(bits, dims)((p, i) => md5Hex24(s"$prefix${p}_$i") - 8388608L)

  /** Bit-identical JVM replica of [[lshBucketMd5]] over one float vector:
    * exact integer dot products (floor(v·10⁶) quantization, the matrix's
    * 24-bit plane components — products ≤ ~2^45/term, sums ≤ ~2^51, far
    * inside Long; integer addition is order-free so loop order cannot
    * matter), sign bits packed ascending. Parity with the Catalyst
    * expression is pinned by AnnSpec over real embeddings. */
  def cellOfMd5(vec: Array[Float], planes: Array[Array[Long]]): Long = {
    require(planes.isEmpty || planes(0).length == vec.length,
      s"md5 plane family: vector length ${vec.length} must equal dims ${planes(0).length}")
    var cell = 0L
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      var dot = 0L
      var i = 0
      while (i < row.length) {
        dot += math.floor(vec(i).toDouble * 1e6).toLong * row(i)
        i += 1
      }
      if (dot >= 0L) cell |= (1L << p)
      p += 1
    }
    cell
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
    * the LSH planes): out[p] = Σᵢ ⌊vᵢ·10⁶⌋ · c(p,i) / (10⁶ · 2²³) over
    * [[md5PlaneDots]] — the final division runs on identical operands, so
    * the result is bit-stable cross-engine with NO rounding. The cheap
    * dimensionality-reduction front of a clustering / coarse-similarity
    * pipeline. */
  def randomProjectionMd5(vec: Column, outDims: Int, dims: Int = 64): Column =
    transform(md5PlaneDots(vec, "rp", outDims, dims),
      s => s.cast("double") / lit(1e6 * 8388608.0))

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

  /** Multi-probe LSH top-k — recall without another corpus scan: the CORPUS
    * is bucketed once (same single-table layout as [[lshTopK]]), while each
    * QUERY probes its own bucket plus the `probes` Hamming-distance-1
    * neighbor buckets obtained by flipping its least-confident sign bits —
    * the bits whose |projection| is smallest, i.e. where the vector lies
    * closest to the hyperplane and a true neighbor most likely landed on
    * the other side (the classic multi-probe LSH heuristic).
    *
    * Scale shape: corpus-side work is IDENTICAL to single-table LSH (one
    * bucket per row — no explode, no second scan); only the tiny broadcast
    * query side fans out ×(probes+1). Probe buckets of one query are
    * pairwise distinct, so the equi-join introduces no duplicate candidate
    * pairs and needs no distinct. */
  def lshTopKMultiProbe(queries: DataFrame, qidCol: String, qvecCol: String,
                        corpus: DataFrame, idCol: String, vecCol: String,
                        k: Int, bits: Int = 8, probes: Int = 2): DataFrame = {
    require(probes >= 0 && probes <= bits, s"need 0 <= probes <= bits, got $probes/$bits")
    // per-plane projections — SAME expression composition as lshBucketPlanes
    // so the sign-bit bucket is bit-identical to the corpus side's
    def projArray(vec: Column): Column = {
      val dims = sequence(lit(0), size(vec) - 1)
      array((0 until bits).map { p =>
        aggregate(zip_with(vec, dims,
          (v, i) => v.cast("double") * planeComponent(p, i)),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }
    val qb = queries
      // materialized aliases: _projs is referenced by both the base bucket
      // and the flip ranking — inlining would re-evaluate the whole
      // projection array per reference (interpreted-HOF recompute trap)
      .withColumn("_projs", projArray(col(qvecCol)))
      .withColumn("_bucket",
        aggregate(zip_with(col("_projs"), sequence(lit(0), lit(bits - 1)),
          (d, p) => when(d >= 0, call_function("shiftleft", lit(1L), p))
            .otherwise(lit(0L))), lit(0L), (acc, v) => acc + v))
      .withColumn("_flips",
        transform(
          slice(array_sort(zip_with(col("_projs"),
            sequence(lit(0), lit(bits - 1)),
            (d, p) => struct(abs(d).as("a"), p.as("idx")))), 1, probes),
          s => col("_bucket")
            .bitwiseXOR(call_function("shiftleft", lit(1L), s.getField("idx")))))
      .select(col(qidCol), col(qvecCol),
        explode(concat(array(col("_bucket")), col("_flips"))).as("bucket"))
    val cb = corpus.withColumn("bucket", lshBucket(col(vecCol), bits))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(qvecCol), col(vecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** md5-parity twin of [[lshTopKMultiProbe]]: buckets, projections AND
    * probe selection all run on the exact-integer md5 plane family, so the
    * least-confident-bit ranking (smallest |dot|, tie → plane index) is
    * bit-stable cross-engine and the whole multi-probe search is
    * DuckDB-oracle-checkable. Same plan shape: corpus bucketed once,
    * broadcast query side fans out ×(probes+1). */
  def lshTopKMultiProbeMd5(queries: DataFrame, qidCol: String, qvecCol: String,
                           corpus: DataFrame, idCol: String, vecCol: String,
                           k: Int, bits: Int = 4, probes: Int = 2,
                           dims: Int = 64): DataFrame = {
    require(probes >= 0 && probes <= bits, s"need 0 <= probes <= bits, got $probes/$bits")
    val qb = queries
      .withColumn("_dots", md5PlaneDots(col(qvecCol), "", bits, dims))
      .withColumn("_bucket",
        aggregate(zip_with(col("_dots"), sequence(lit(0), lit(bits - 1)),
          (d, p) => when(d >= 0, call_function("shiftleft", lit(1L), p))
            .otherwise(lit(0L))), lit(0L), (acc, v) => acc + v))
      .withColumn("_flips",
        transform(
          slice(array_sort(zip_with(col("_dots"),
            sequence(lit(0), lit(bits - 1)),
            (d, p) => struct(abs(d).as("a"), p.as("idx")))), 1, probes),
          s => col("_bucket")
            .bitwiseXOR(call_function("shiftleft", lit(1L), s.getField("idx")))))
      .select(col(qidCol), col(qvecCol),
        explode(concat(array(col("_bucket")), col("_flips"))).as("bucket"))
    val cb = corpus.withColumn("bucket", lshBucketMd5(col(vecCol), bits, dims))
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

  /** IVF-style coarse quantization: per-label centroid table. Serves both
    * as an IVF index build and as a per-class embedding summary.
    *
    * Shape: per-dimension averages on a single groupBy(label) — NOT
    * posexplode → groupBy(label, pos). The map side folds each row
    * straight into its partition's labels×dims agg buffer, so the shuffle
    * carries partial averages instead of a dims× exploded copy of the
    * corpus (the difference between shuffling 64 B rows and labels·dims
    * doubles at 10⁹ vectors). Preferred form is the native
    * `graft_vec_avg` kernel (one buffer per group, constant-size codegen,
    * no dims probe); fallback is a WIDE aggregate of dims
    * `avg(element_at)` columns, whose dims come from the first non-empty
    * vector (one tiny job; embedding columns are uniform-width by
    * construction). Per-dim `avg` ignores null elements exactly as
    * posexplode skipped them. */
  def centroids(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val useKernel = scala.util.Try(
      corpus.sparkSession.catalog.functionExists("graft_vec_avg"))
      .getOrElse(false)
    if (useKernel)
      return corpus.groupBy(col(labelCol))
        .agg(call_function("graft_vec_avg",
          col(vecCol).cast("array<double>")).as("centroid"))
    val head = corpus.select(size(col(vecCol)).as("n")).filter(col("n") > 0).head(1)
    if (head.isEmpty)
      return corpus.select(col(labelCol),
        lit(null).cast("array<double>").as("centroid")).limit(0)
    val dims = head(0).getInt(0)
    val avgs = (0 until dims).map(i =>
      avg(element_at(col(vecCol), i + 1).cast("double")).as(s"_a$i"))
    corpus.groupBy(col(labelCol))
      .agg(avgs.head, avgs.tail: _*)
      .select(col(labelCol),
        array((0 until dims).map(i => col(s"_a$i")): _*).as("centroid"))
  }

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
    // reference-tracked and reclaimed when the frame is garbage).
    // Known trade-off: construction becomes eager and the checkpointed
    // centroid sub-plan is opaque to plan-only inspection (PlanGuardSpec /
    // PlanAudit see an ExistingRDD scan here) — accepted, as in
    // Score.anomalyStats; the cents pipeline itself is covered by
    // q_centroids' own plan and oracle.
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
  // ---- learned coarse quantizer: fixed-point Lloyd k-means ----

  /** ⌊v·10³⌋ integer view of a float vector — the k-means quantization
    * grid. All k-means arithmetic below is EXACT on integers, so cell
    * assignment has no float near-tie anywhere (the md5-parity playbook
    * applied to clustering: components ≤ ~2^11, squared distances over 64
    * dims ≤ ~2^50 — Long-safe). */
  private[sim] def quantize3(vec: Column): Column =
    transform(vec, v => floor(v.cast("double") * 1000).cast("long"))

  /** Integer squared L2 distance between a 10⁻³-grid vector (scaled ×1000)
    * and a 10⁻⁶-grid centroid literal. */
  private def intDist(q: Column, cvec: Array[Long]): Column =
    aggregate(zip_with(q, array(cvec.map(lit(_)).toSeq: _*),
      (a, b) => (a * lit(1000L) - b) * (a * lit(1000L) - b)),
      lit(0L), (acc, x) => acc + x)

  /** (distance, cell) struct per centroid — centroids are plan literals
    * (k·dims longs), so this is map-only with zero shuffle/broadcast. */
  private[sim] def cellScores(q: Column, cents: Seq[(Int, Array[Long])]): Column =
    array(cents.map { case (cell, arr) =>
      struct(intDist(q, arr).as("d"), lit(cell).as("cell")) }: _*)

  /** argmin cell: min distance wins, exact-integer ties break to the
    * smallest cell. Uses the native codegen'd `graft_nearest_cell` kernel
    * when the session has GraftExtensions (one loop; the HOF fold builds a
    * k-struct array per row interpreted, and its ~k·dims-literal tree is
    * codegen-compiled once per assignment pass); falls back to the
    * bit-identical `array_min(cellScores(...))` composition otherwise. */
  private[sim] def nearestCellInt(q: Column, cents: Seq[(Int, Array[Long])]): Column = {
    require(cents.nonEmpty, "nearestCellInt: empty centroid set (empty corpus?)")
    org.apache.spark.sql.SparkSession.getActiveSession
      .filter(s => scala.util.Try(s.catalog.functionExists("graft_nearest_cell"))
        .getOrElse(false))
      .map { _ =>
        val mat = array(cents.map { case (_, arr) =>
          array(arr.map(lit(_)).toSeq: _*) }: _*)
        val ids = array(cents.map { case (c, _) => lit(c) }: _*)
        call_function("graft_nearest_cell", q, mat, ids)
      }
      .getOrElse(array_min(cellScores(q, cents)).getField("cell"))
  }

  /** LEARNED IVF coarse quantizer: Lloyd's k-means on the fixed-point
    * integer grid with a k-means‖-style deterministic init and a FIXED
    * iteration count — fully deterministic, so the whole index build is
    * cross-engine oracle-expressible (the DuckDB twin replays identical
    * init selection and iterations).
    *
    * Init = md5-seeded oversample + farthest-first reduce: the
    * [[KmeansOversample]]·k corpus rows with smallest (md5(id), id) form
    * the candidate pool (one distributed top-m job — the "sample by a
    * deterministic hash" half of k-means‖), then Gonzalez farthest-first
    * selection on the driver picks k spread-out centers from the pool
    * (exact integer distances, ties to the earlier candidate — the
    * "reduce to k" half). Unlike first-k-by-md5, near-duplicate seeds
    * can't collapse two cells onto one cluster, which is the cell-balance
    * property that matters on skewed corpora at 100 TB. Driver work is
    * O(m²·dims) on m ≈ 4k rows — constant-sized, never O(corpus).
    *
    * Scale shape (the MLlib KMeans loop): per iteration ONE map-only
    * assignment pass over the corpus (centroids ride in the plan as
    * literals) and one (cell, pos) aggregation whose k×dims result is
    * collected to the driver — O(k·dims), never O(corpus), the classic
    * iterative-ML driver pattern. The quantized corpus is persisted across
    * the iters+1 passes. Cells that lose all members drop out — identically
    * on both engines.
    *
    * Centroids live on the 10⁻⁶ grid: the update is floorDiv(1000·Σq, m);
    * subtracting pmod first makes the numerator exactly divisible, so
    * trunc-vs-floor division differences between engines cannot appear. */
  def kmeansCentroidsFixedPoint(corpus: DataFrame, idCol: String,
                                vecCol: String, k: Int, iters: Int)
      : Seq[(Int, Array[Long])] = {
    val qv = corpus.select(col(idCol).as("_id"), quantize3(col(vecCol)).as("_q"))
    qv.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand: Array[Array[Long]] =
      qv.orderBy(md5(col("_id").cast("string").cast("binary")), col("_id"))
        .limit(KmeansOversample * k).select("_q").collect()
        .map(_.getSeq[Long](0).map(_ * 1000L).toArray)
    var cents: Seq[(Int, Array[Long])] =
      farthestFirst(cand, k).zipWithIndex.map { case (c, cell) => (cell, c) }
    val dims = cents.headOption.map(_._2.length).getOrElse(0)
    val useKernel = scala.util.Try(
      corpus.sparkSession.catalog.functionExists("graft_vec_sum_long"))
      .getOrElse(false)
    var it = 0
    while (it < iters) {
      // Vector-sum aggregate, not posexplode→groupBy(_cell, _pos): the map
      // side folds each row directly into its partition's k×dims agg
      // buffer, so the shuffle carries k×dims partials per partition
      // instead of a dims× exploded copy of the corpus — at 10⁹ vectors
      // that is the difference between shuffling 64 B rows and shuffling
      // k·dims longs. Preferred form is the native graft_vec_sum_long
      // kernel (ONE buffer per group, ObjectHashAggregate, constant-size
      // codegen); the builtin fallback is a WIDE aggregate of dims
      // sum(element_at) columns — same shuffle shape, but its generated
      // HashAggregate class grows with dims (~1 s first-run Janino at 64).
      // Integer sums are associative and exact, so every form is
      // bit-identical to the exploded shape and to the DuckDB replay.
      val assigned = qv.withColumn("_cell", nearestCellInt(col("_q"), cents))
      val upd =
        if (useKernel)
          assigned.groupBy("_cell")
            .agg(count(lit(1)).as("_m"),
              call_function("graft_vec_sum_long", col("_q")).as("_s"))
            .collect() // ≤ k rows of dims sums — driver-sized by construction
            .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
        else
          assigned.groupBy("_cell")
            .agg(count(lit(1)).as("_m"),
              (0 until dims).map(i =>
                sum(element_at(col("_q"), i + 1)).as(s"_s$i")): _*)
            .collect()
            .map(r => (r.getInt(0), r.getLong(1),
              (0 until dims).map(i => r.getLong(2 + i))))
      cents = upd.map { case (cell, m, sums) =>
        (cell, sums.map(s => Math.floorDiv(1000L * s, m)).toArray)
      }.toSeq.sortBy(_._1)
      it += 1
    }
    qv.unpersist(false)
    cents
  }

  /** Candidate-pool multiplier for the k-means‖ init oversample. */
  val KmeansOversample: Int = 4

  /** Deterministic Gonzalez farthest-first traversal over the candidate
    * pool: start from the first candidate (smallest (md5, id)), repeatedly
    * add the candidate with the LARGEST min-distance to the chosen set;
    * exact integer distances, ties break to the earlier candidate — the
    * identical argmax the DuckDB selection CTEs replay. */
  private def farthestFirst(cand: Array[Array[Long]], k: Int): Seq[Array[Long]] = {
    if (cand.isEmpty) return Seq.empty
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    // minD(j) = min distance from candidate j to the chosen set so far
    val minD = cand.map(d2(_, cand(0)))
    while (chosen.size < math.min(k, cand.length)) {
      var best = -1; var bestMd = -1L
      var j = 0
      while (j < cand.length) {
        if (!chosen.contains(j) && minD(j) > bestMd) { bestMd = minD(j); best = j }
        j += 1
      }
      chosen += best
      j = 0
      while (j < cand.length) {
        val d = d2(cand(j), cand(best))
        if (d < minD(j)) minD(j) = d
        j += 1
      }
    }
    chosen.toSeq.map(cand(_))
  }

  /** IVF top-k over the learned k-means quantizer — no labels needed
    * (the label-keyed [[ivfTopK]] stays as the fast path for pre-labeled
    * corpora). Same two-stage search: corpus rows are assigned to their
    * nearest centroid (map-only, exact integers), each query probes its
    * `nprobe` nearest cells, and only those cells' rows are exact-scored.
    * Both cell assignment and probe selection compare exact integer
    * distances, so there is no float near-tie anywhere in the index —
    * the fragility ADVICE flagged on the label variant's unrounded-cosine
    * assignment cannot occur here. */
  def ivfTopKKmeans(queries: DataFrame, qidCol: String, qvecCol: String,
                    corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, centers: Int = 8, iters: Int = 2,
                    nprobe: Int = 2): DataFrame = {
    val cents = kmeansCentroidsFixedPoint(corpus, idCol, vecCol, centers, iters)
    val cells = corpus
      .withColumn("_cell", nearestCellInt(quantize3(col(vecCol)), cents))
      .select(col(idCol), col(vecCol), col("_cell"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_s.d"), col("_s.cell"))
    val probes = queries
      .select(col(qidCol), col(qvecCol),
        explode(cellScores(quantize3(col(qvecCol)), cents)).as("_s"))
      .withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("_s.cell").as("_cell"))
    val joined = cells.join(broadcast(probes), Seq("_cell"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", cosine(col(qvecCol).cast("array<double>"),
        col(vecCol).cast("array<double>")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Product quantization (Jégou et al. 2011, the IVF-PQ compression
    * stage): the vector is split into `m` subspaces of dims/m components,
    * each subspace gets its own `ksub`-centroid codebook, and every vector
    * compresses to m small codes (m·log₂ksub bits — the lever that fits a
    * 10⁹-vector index in memory at 100 TB corpus scale).
    *
    * Codebooks train with the SAME deterministic fixed-point machinery as
    * [[kmeansCentroidsFixedPoint]] (md5-seeded oversample, Gonzalez
    * farthest-first init, exact-integer Lloyd iterations) so the whole
    * build — init selection, iterations, final code assignment, and the
    * reconstruction error — replays bit-for-bit in the DuckDB oracle.
    * One shared md5-ordered candidate collect seeds ALL m codebooks.
    *
    * Scale shape: per Lloyd iteration, ONE exploded (sub, subvector)
    * aggregate updates every codebook in a single shuffle whose payload is
    * m·ksub·(dims/m) = ksub·dims long partials per partition — identical
    * bytes to one full-width k-means pass, never m separate jobs. Final
    * coding is a map-only projection (codebooks are plan literals), so
    * the expensive corpus-sized stage has zero shuffle.
    *
    * Output: (id, code_0..code_{m-1}, recon_err) — recon_err is the exact
    * integer squared quantization error on the 10⁻⁶ grid divided once by
    * 1e12 (sums stay ≤ dims·(4e6)² ≈ 10¹⁵ « 2⁶³; the double cast is exact
    * below 2⁵³ for the sf volumes and IEEE-identical cross-engine). */
  def pqCodes(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, ksub: Int, iters: Int, dims: Int): DataFrame = {
    val cbooks = pqTrain(corpus, idCol, vecCol, m, ksub, iters, dims)
    pqCodesWith(corpus, idCol, vecCol, cbooks, dims)
  }

  /** Codebook training half of [[pqCodes]] — returns the m per-subspace
    * codebooks as (cell, centroid-on-the-10⁻⁶-grid) lists, driver-sized
    * (m·ksub·dims/m longs). Exposed so [[pqTopK]] can reuse the books for
    * asymmetric-distance search without re-deriving them. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, ksub: Int, iters: Int, dims: Int)
      : Array[Seq[(Int, Array[Long])]] = {
    require(m > 0 && dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    require(ksub > 1 && iters >= 0, s"need ksub > 1, iters >= 0")
    val d = dims / m
    val qv = corpus.select(col(idCol).as("_id"), quantize3(col(vecCol)).as("_q"))
    qv.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one md5-ordered oversample seeds every subspace's farthest-first init
    val cand: Array[Array[Long]] =
      qv.orderBy(md5(col("_id").cast("string").cast("binary")), col("_id"))
        .limit(KmeansOversample * ksub).select("_q").collect()
        .map(_.getSeq[Long](0).map(_ * 1000L).toArray)
    var cbooks: Array[Seq[(Int, Array[Long])]] = Array.tabulate(m) { j =>
      farthestFirst(cand.map(_.slice(j * d, j * d + d)), ksub)
        .zipWithIndex.map { case (c, cell) => (cell, c) }
    }
    def subq(j: Int): Column = slice(col("_q"), j * d + 1, d)
    val useKernel = scala.util.Try(
      corpus.sparkSession.catalog.functionExists("graft_vec_sum_long"))
      .getOrElse(false)
    var it = 0
    while (it < iters) {
      // all m subspaces in ONE aggregate: explode to (sub, subq, cell)
      // rows — m× the row count but 1/m the vector width, so the shuffle
      // carries the same bytes as one full-width pass
      val books = cbooks // stable reference for the closure-free plan build
      val exploded = qv.select(col("_id"), explode(array((0 until m).map { j =>
          struct(lit(j).as("sub"), subq(j).as("subq"))
        }: _*)).as("_e"))
        .select(col("_e.sub").as("_sub"), col("_e.subq").as("_sq"))
      val assigned = exploded.withColumn("_cell",
        (1 until m).foldLeft(when(col("_sub") === 0,
            nearestCellInt(col("_sq"), books(0)))) { (acc, j) =>
          acc.when(col("_sub") === j, nearestCellInt(col("_sq"), books(j)))
        })
      val upd =
        if (useKernel)
          assigned.groupBy("_sub", "_cell")
            .agg(count(lit(1)).as("_m"),
              call_function("graft_vec_sum_long", col("_sq")).as("_s"))
            .collect() // ≤ m·ksub rows of d sums — driver-sized by construction
            .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getSeq[Long](3)))
        else
          assigned.groupBy("_sub", "_cell")
            .agg(count(lit(1)).as("_m"),
              (0 until d).map(i =>
                sum(element_at(col("_sq"), i + 1)).as(s"_s$i")): _*)
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
              (0 until d).map(i => r.getLong(3 + i))))
      cbooks = Array.tabulate(m) { j =>
        upd.filter(_._1 == j).map { case (_, cell, cnt, sums) =>
          (cell, sums.map(s => Math.floorDiv(1000L * s, cnt)).toArray)
        }.toSeq.sortBy(_._1)
      }
      it += 1
    }
    qv.unpersist(false)
    cbooks
  }

  /** Coding half of [[pqCodes]]: map-only projection of every vector onto
    * its per-subspace nearest cell + the exact integer distance (the min
    * of the (d, cell) struct array — the same argmin the assignment uses,
    * so code and error always agree). Codebooks are plan literals; zero
    * shuffle at any corpus size. */
  def pqCodesWith(corpus: DataFrame, idCol: String, vecCol: String,
                  cbooks: Array[Seq[(Int, Array[Long])]], dims: Int): DataFrame = {
    val m = cbooks.length
    val d = dims / m
    def subq(j: Int): Column = slice(col("_q"), j * d + 1, d)
    val scored = (0 until m).map { j =>
      array_min(cellScores(subq(j), cbooks(j))).as(s"_b$j")
    }
    corpus.select(col(idCol).as("_id"), quantize3(col(vecCol)).as("_q"))
      .select(col("_id") +: scored: _*)
      .select(col("_id").as(idCol) +:
        (0 until m).map(j => col(s"_b$j.cell").as(s"code_$j")) :+
        ((0 until m).map(j => col(s"_b$j.d")).reduce(_ + _).cast("double")
          / lit(1e12)).as("recon_err"): _*)
  }

  /** PQ asymmetric-distance top-k (the search half of IVF-PQ): corpus
    * vectors are represented ONLY by their m codes; each query scores a
    * candidate as Σⱼ d²(query-subvector, codebookⱼ[codeⱼ]) — the ADC
    * approximation of squared L2, computed here as exact integers on the
    * fixed-point grid (a per-query LUT materializes the same m·ksub
    * distances; with codebooks as plan literals Catalyst folds the CASE
    * per code to exactly that lookup).
    *
    * Scale shape: coding is map-only; scoring is corpus-codes ×
    * broadcast(queries) with a per-query rank window — the same
    * broadcast-then-rank shape as [[bruteForceTopK]], but each candidate
    * costs m·dims/m = dims integer ops against the RECONSTRUCTED centroid
    * rather than reading the full original vector: at 10⁹ vectors the
    * scan input shrinks from dims floats to m bytes per row, which is the
    * entire point of PQ. Exact-integer distances make ranking ties
    * deterministic (tiebreak on id) and the whole search replayable in
    * the DuckDB oracle. */
  def pqTopK(queries: DataFrame, qidCol: String, qvecCol: String,
             corpus: DataFrame, idCol: String, vecCol: String, k: Int,
             m: Int, ksub: Int, iters: Int, dims: Int): DataFrame = {
    val cbooks = pqTrain(corpus, idCol, vecCol, m, ksub, iters, dims)
    val codes = pqCodesWith(corpus, idCol, vecCol, cbooks, dims)
      .drop("recon_err")
    adcTopKFromCodes(queries, qidCol, qvecCol, codes, idCol, cbooks, k, dims)
  }

  /** The ADC scan against an ALREADY-CODED corpus — the search primitive
    * a persisted PQ index calls ([[PqIndex.search]]): `codes` carries
    * (idCol, code_0..code_{m-1}) and never the vectors, `cbooks` are the
    * trained codebooks (plan literals). Split out of [[pqTopK]] so the
    * train+code build can happen once and the scan many times. */
  def adcTopKFromCodes(queries: DataFrame, qidCol: String, qvecCol: String,
                       codes: DataFrame, idCol: String,
                       cbooks: Array[Seq[(Int, Array[Long])]],
                       k: Int, dims: Int): DataFrame = {
    val m = cbooks.length
    val d = dims / m
    val q = queries.select(col(qidCol), quantize3(col(qvecCol)).as("_qq"))
    // ADC term for subspace j: distance from the query's j-th subvector to
    // the centroid the candidate's code names. CASE over cell ids (not
    // array position) — robust to codebooks with vanished cells.
    def adcTerm(j: Int): Column = {
      val qsub = slice(col("_qq"), j * d + 1, d)
      cbooks(j).tail.foldLeft(
        when(col(s"code_$j") === cbooks(j).head._1,
          intDist(qsub, cbooks(j).head._2))) { case (acc, (cell, cv)) =>
        acc.when(col(s"code_$j") === cell, intDist(qsub, cv))
      }
    }
    val scored = codes.crossJoin(broadcast(q))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("_adc", (0 until m).map(adcTerm).reduce(_ + _))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_adc").asc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol),
        (col("_adc").cast("double") / lit(1e12)).as("adc"), col("rank"))
  }

  /** PQ search with exact reranking — the production IVF-PQ read path:
    * the ADC scan ([[pqTopK]]) shortlists `rerank` candidates per query
    * from codes alone, then ONLY those candidates' full vectors are read
    * for an exact cosine rank. On a 10⁹-vector corpus the expensive scan
    * touches m bytes/row while the exact math touches `rerank` rows per
    * query — the two-tier cost model that makes PQ recall usable (ADC
    * alone ranks by a quantized distance; its top-k on weakly-clustered
    * data is noise-limited, which q_pq_recall certifies honestly).
    *
    * The candidate shortlist is broadcast back against the corpus (tiny
    * side broadcast, corpus never reshuffled). Ranking ties break on id;
    * the cosine itself is the same unrounded-double ordering the
    * brute-force/IVF oracles already certify on these fixtures. */
  def pqTopKRerank(queries: DataFrame, qidCol: String, qvecCol: String,
                   corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                   m: Int, ksub: Int, iters: Int, dims: Int,
                   rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must cover k=$k")
    val cand = pqTopK(queries, qidCol, qvecCol, corpus, idCol, vecCol,
        rerank, m, ksub, iters, dims)
      .select(col(qidCol), col(idCol))
    val joined = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol).as("_qv"))),
        Seq(qidCol))
      .withColumn("cosine", cosine(col("_qv").cast("array<double>"),
        col("_cv").cast("array<double>")))
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

  /** [[cosineNearDup]] in the OPERATING REGIME — the bucket count scales
    * with the corpus instead of being pinned by the caller (the same
    * [[autoBits]] capacity rule [[semDedupAuto]] uses, and for the same
    * reason: with b frozen the within-bucket pair join grows as N²/2^b —
    * the round-11 full-registry 100× run priced the frozen-4-bit row at
    * 229× for 100× data). One count() aggregate gives N; the smallest b
    * with targetCell·2^b ≥ N keeps expected bucket population ≤
    * targetCell at every corpus size, so candidate pairs grow as
    * ≈ N·targetCell/2 — linear in N by construction. Recall contract
    * unchanged from [[cosineNearDup]]: sign-LSH is approximate, a pair
    * split across a hyperplane is missed; more bits trade recall for
    * candidate volume exactly as more SemDeDup cells do. */
  def cosineNearDupAuto(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, targetCell: Int = 64,
                        bucketFn: (Column, Int) => Column = lshBucket)
      : DataFrame =
    cosineNearDup(corpus, idCol, vecCol, threshold,
      autoBits(corpus.count(), targetCell), bucketFn)

  /** SemDeDup — semantic deduplication over an embedding corpus (the
    * "cluster, then prune near-identical neighbors within each cluster"
    * recipe): every vector is assigned to its nearest coarse-quantizer
    * cell (the per-`labelCol` centroid table, as in [[ivfTopK]]), and a
    * vector is DROPPED when some smaller-id vector in the SAME cell has
    * cosine ≥ `threshold` with it. Smallest-id-wins is the deterministic
    * keeper rule (the published method keeps a per-group exemplar chosen
    * by centroid distance; any fixed rule gives the same dedup rate, and
    * min-id makes the result reproducible and oracle-checkable).
    * Returns the survivors as (id, cell).
    *
    * Scale shape — the whole point of the clustering step: the cosine
    * pair join is keyed on the cell, so candidate pairs are
    * Σ_cells n_c²/2, not N²/2 — with k balanced cells that is N²/2k, and
    * k grows with the corpus (a learned quantizer slots in via
    * [[kmeansCentroidsFixedPoint]] exactly as in [[ivfTopKKmeans]]).
    * Assignment is a map-only fold over a broadcast centroid table; the
    * assigned corpus is localCheckpoint'ed ONCE (reference-tracked, no
    * CacheManager pin) because it feeds both pair-join sides and the
    * survivor anti-join; the final anti-join is keyed on the id. No
    * stage touches all-pairs across cells. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               labelCol: String, threshold: Double): DataFrame = {
    val cents = centroids(corpus, labelCol, vecCol)
      .select(col(labelCol).cast("string").as("cell"),
        transform(col("centroid"), c => round(c, 6)).as("cvec"))
      .agg(collect_list(struct(col("cell"), col("cvec"))).as("cents"))
      .localCheckpoint(true)
    val cells = corpus.crossJoin(broadcast(cents))
      .withColumn("_cell",
        nearestCell(col(vecCol).cast("array<double>"), col("cents")))
      .select(col(idCol), col(vecCol), col("_cell"))
      .localCheckpoint(true)
    cells.join(dropWithinCells(cells, "_cell", idCol, vecCol, threshold),
        Seq(idCol), "left_anti")
      .select(col(idCol), col("_cell").as("cell"))
  }

  /** THE SemDeDup prune, shared by every variant: ids dropped because
    * some SMALLER-id vector in the same `cellCol` cell has cosine ≥
    * `threshold` — the non-transitive min-id rule every oracle replays.
    * One cell-keyed self-join, never all-pairs across cells. `cells`
    * should be materialized (localCheckpoint) by the caller: it feeds
    * both join sides here plus the caller's anti-join. */
  private def dropWithinCells(cells: DataFrame, cellCol: String,
                              idCol: String, vecCol: String,
                              threshold: Double): DataFrame = {
    val l = cells.select(col(cellCol), col(idCol).as("_id1"),
      col(vecCol).as("_v1"))
    val r = cells.select(col(cellCol), col(idCol).as("_id2"),
      col(vecCol).as("_v2"))
    l.join(r, Seq(cellCol))
      .filter(col("_id1") < col("_id2"))
      .filter(cosine(col("_v1").cast("array<double>"),
        col("_v2").cast("array<double>")) >= threshold)
      .select(col("_id2").as(idCol)).distinct()
  }

  /** Smallest b ≥ 0 with targetCell·2^b ≥ n — [[semDedupAuto]]'s cell-count
    * rule, pure integer arithmetic so the DuckDB oracle's replay
    * (min b over a generate_series with the same shift inequality) cannot
    * diverge on a float log2 near a power-of-two boundary. */
  def autoBits(n: Long, targetCell: Int): Int = {
    require(targetCell > 0, "targetCell must be positive")
    var b = 0
    while (b < 32 && (targetCell.toLong << b) < n) b += 1
    b
  }

  /** SemDeDup in the OPERATING REGIME — the quantizer scales with the
    * corpus instead of being pinned by a fixture column. [[semDedup]]'s
    * cell count is the label cardinality, so its within-cell pair join
    * grows as Σ n_c²/2 ≈ N²/2k with k frozen: correct, oracle-simple, and
    * deliberately super-linear (the measured q_semdedup sf1/sf4 rows).
    * This variant derives the cell count FROM the corpus: one count()
    * aggregate gives N, [[autoBits]] picks the smallest b with
    * targetCell·2^b ≥ N, and the coarse quantizer is the b-bit md5-plane
    * sign-LSH bucket ([[lshBucketMd5]] — data-independent, no training
    * pass, bit-stable cross-engine). Expected cell population stays
    * ≤ targetCell at every corpus size, so candidate pairs grow as
    * ≈ N·targetCell/2 — LINEAR in N by construction; doubling the corpus
    * adds one bucket bit instead of doubling every cell.
    *
    * Trade versus the learned quantizer: sign-LSH cells are only as
    * balanced as the embedding distribution (a mass of near-identical
    * vectors shares a bucket — exactly the duplicates this operator
    * exists to drop, so the skew is self-limiting: the prune empties the
    * hot cell), and recall is approximate — a near-dup pair split across
    * a hyperplane survives, same contract as [[cosineNearDup]]. For
    * balanced learned cells at a quantizer-refresh boundary, feed
    * [[kmeansCentroidsFixedPoint]] with k = 2^autoBits instead.
    *
    * Scale shape: count() is one aggregate job; bucket assignment is a
    * map-only projection (plane constants are plan literals); the pair
    * join, prune, and survivor anti-join are [[semDedup]]'s cell-keyed
    * shapes unchanged. Nothing touches all-pairs across cells and no
    * stage's cost law degrades as N grows — the property the fixed-k
    * variant gives up. */
  def semDedupAuto(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, targetCell: Int = 64,
                   dims: Int = 64): DataFrame =
    semDedupAutoWithBits(corpus, idCol, vecCol, threshold,
      autoBits(corpus.count(), targetCell), dims)

  /** [[semDedupAuto]] with the bit count supplied by the caller — for
    * when N is already known (a metastore rowcount, or a caller that
    * needs the same count for its own bits arithmetic, as
    * `q_semdedup_incremental` does) so the count() job is not re-run. */
  def semDedupAutoWithBits(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, bits: Int,
                           dims: Int = 64): DataFrame = {
    require(bits >= 0 && bits <= 32, "bits must be in 0..32")
    val bucket = if (bits == 0) lit(0L) else lshBucketMd5(col(vecCol), bits, dims)
    val cells = corpus.withColumn("_cell", bucket)
      .select(col(idCol), col(vecCol), col("_cell"))
      .localCheckpoint(true)
    cells.join(dropWithinCells(cells, "_cell", idCol, vecCol, threshold),
        Seq(idCol), "left_anti")
      .select(col(idCol), col("_cell").as("cell"))
  }

  /** Embedding-distribution drift vs a frozen reference batch — the
    * batch-health read an embedding pipeline runs before trusting a new
    * encoder version or crawl slice (the vector-space sibling of the
    * token-distribution `TextStats.referenceDrift`): per dimension, the
    * mean of the reference rows vs the mean of the current rows and
    * their delta. A systematic per-dim shift means the encoder or the
    * upstream corpus moved; noise-level deltas mean the batch is safe to
    * index against the existing quantizers.
    *
    * Exactness: inputs quantize to the ⌊v·10⁶⌋ integer grid, per-dim
    * sums and counts are exact BIGINTs, and each mean is ONE
    * correctly-rounded division (round 6) — bit-stable cross-engine.
    *
    * Scale shape: one (pos, value, side) explode → ONE map-side-
    * combinable groupBy(pos) with conditional sums — dims output rows,
    * never a corpus-keyed shuffle; both "sides" ride in the same
    * aggregate so the corpus scans once. */
  def embeddingDrift(corpus: DataFrame, vecCol: String,
                     refPred: Column, dims: Int = 64): DataFrame = {
    val q = quantize3transform(corpus, vecCol)
    q.select(refPred.cast("int").as("_ref"),
        posexplode(col("_q")).as(Seq("pos", "_v")))
      .groupBy("pos")
      .agg(
        sum(when(col("_ref") === 1, col("_v")).otherwise(lit(0L))).as("_sr"),
        sum(when(col("_ref") === 1, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("_ref") === 0, col("_v")).otherwise(lit(0L))).as("_sc"),
        sum(when(col("_ref") === 0, 1L).otherwise(0L)).as("n_cur"))
      .select(col("pos"),
        round(col("_sr").cast("double") / col("n_ref") / lit(1e6), 6)
          .as("mean_ref"),
        round(col("_sc").cast("double") / col("n_cur") / lit(1e6), 6)
          .as("mean_cur"),
        round(col("_sc").cast("double") / col("n_cur") / lit(1e6)
          - col("_sr").cast("double") / col("n_ref") / lit(1e6), 6)
          .as("delta"),
        col("n_ref"), col("n_cur"))
      .orderBy("pos")
  }

  /** ⌊v·10⁶⌋ per-component quantization as a (_q) projection — the
    * drift/mean grid (coarser 10³ grid stays with the k-means family). */
  private def quantize3transform(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(transform(col(vecCol),
      v => floor(v.cast("double") * 1e6).cast("long")).as("_q"),
      col("*"))

  /** Incremental SemDeDup — the re-crawl shape ([[graft.dedup.Dedup]]'s
    * `exactDedupIncremental`, lifted to embeddings): a new batch is
    * deduped against an EXISTING deduped corpus without ever re-scoring
    * the base. `baseSurvivors` is the materialized survivor set of the
    * base corpus (in production: the bucketed index table persisted at
    * build time — the bucket recompute here is a scan-cheap projection,
    * kept so the API stays storage-free); `bits` is the quantizer the
    * base index was built with ([[autoBits]] of the BASE count — frozen
    * at build, as any incremental index must be: re-deriving bits from
    * base+batch would silently re-bucket the base every batch).
    *
    * An incoming vector is dropped when (a) some base survivor in its
    * INDEX cell has cosine ≥ threshold, or (b) some smaller-id incoming
    * vector in its BATCH cell does — (b) is [[semDedup]]'s
    * non-transitive min-id rule unchanged, and (a)∪(b) keeps the prune
    * one-pass. Returns the incoming survivors as (id, cell) with `cell`
    * the index cell (what an insert into the base index would key on).
    *
    * TWO bucketings, one projection: the vs-base join keys on the
    * frozen `bits`, but the within-batch self-join gets its own
    * `batchBits = max(bits, autoBits(batch count))` — a batch much
    * larger than the base would otherwise pile ~batch/2^bits vectors
    * into each frozen cell and the self-join would go quadratic in the
    * batch (measured at 10× batch: 10.6× wall before this split, the
    * N²/k law sneaking back in through the frozen index; the fix is the
    * same capacity rule the base index was built with, applied to the
    * batch). Because each md5-plane sign bit is independent, the bucket
    * at `bits` is the low-bits mask of the bucket at `batchBits` — so
    * ONE projection at `batchBits` yields both cells and the masked
    * base cell stays bit-identical to the index's own bucketing.
    *
    * Scale shape: vs-base candidates ≈ batch × (base survivors per
    * index cell, ≤ targetCell when the index used [[autoBits]]);
    * within-batch candidates ≈ batch × targetCell by the capacity
    * rule — both linear in the BATCH, independent of base size beyond
    * the per-cell survivor population. The base never re-shuffles
    * against itself. */
  def semDedupAutoIncremental(incoming: DataFrame, baseSurvivors: DataFrame,
                              idCol: String, vecCol: String,
                              threshold: Double, bits: Int,
                              targetCell: Int = 64,
                              dims: Int = 64): DataFrame = {
    require(bits >= 0 && bits <= 32, "bits must be in 0..32")
    val batchBits = math.max(bits, autoBits(incoming.count(), targetCell))
    val mask = (1L << bits) - 1
    val bucket =
      if (batchBits == 0) lit(0L) else lshBucketMd5(col(vecCol), batchBits, dims)
    val icells = incoming.withColumn("_bcell", bucket)
      .withColumn("_cell", col("_bcell").bitwiseAND(lit(mask)))
      .select(col(idCol), col(vecCol), col("_cell"), col("_bcell"))
      .localCheckpoint(true)
    val baseBucket =
      if (bits == 0) lit(0L) else lshBucketMd5(col(vecCol), bits, dims)
    val bcells = baseSurvivors.withColumn("_cell", baseBucket)
      .select(col("_cell"), col(vecCol).as("_bv"))
    val dropBase = icells.join(bcells, Seq("_cell"))
      .filter(cosine(col(vecCol).cast("array<double>"),
        col("_bv").cast("array<double>")) >= threshold)
      .select(col(idCol)).distinct()
    val dropWithin = dropWithinCells(icells, "_bcell", idCol, vecCol, threshold)
    icells.join(dropBase.unionByName(dropWithin).distinct(),
        Seq(idCol), "left_anti")
      .select(col(idCol), col("_cell").as("cell"))
  }
}
