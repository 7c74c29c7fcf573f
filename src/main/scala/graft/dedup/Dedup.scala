package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH banded
  * near-dup, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the whole point of these shapes):
  *  - exact dedup = one hash-groupBy shuffle on the fingerprint — the
  *    minimum possible.
  *  - near-dup candidate generation NEVER does all-pairs: LSH bands bucket
  *    the corpus so the only join is an equi-join on (band, band_hash) —
  *    quadratic only within a bucket, and bucket sizes are bounded by
  *    collision probability, not corpus size.
  *  - Jaccard verification runs only on LSH candidates, not the corpus.
  */
object Dedup {

  /** Word k-shingles of normalized text (k consecutive tokens joined).
    *
    * Implementation note: built as k−1 `zip_with` steps over shifted
    * slices, NOT as a `transform` over positions whose lambda slices the
    * token array — a free-variable column inside a HOF lambda is re-evaluated
    * per element (HOFs are interpreted, no subexpression reuse), which made
    * the naive version O(n) regex-splits per row (~40× slower in practice).
    * Here every lambda touches only its element arguments. `zip_with` pads
    * the shorter side with nulls, so the k−1 trailing partial shingles
    * become null and are filtered. */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(normTokens(text), k)

  /** Normalized word tokens (lowercase, collapsed whitespace). */
  def normTokens(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Same, over a pre-materialized token array column (preferred in hot
    * paths: alias the tokens in their own projection first so the split
    * isn't re-evaluated per reference). */
  def shinglesFromTokens(toks: Column, k: Int): Column = {
    val grams = (1 until k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), greatest(size(toks) - j, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(filter(grams, g => g.isNotNull)))
  }

  /** MinHash signature: for each of `numHashes` seeded xxhash64 functions,
    * the minimum hash over the shingle set. One array column; no shuffle. */
  def minhashSignature(shingleCol: Column, numHashes: Int = 128): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(seed))))
    }: _*)

  /** Per-shingle (a, b) hash pairs from ONE md5 each: a = first 12 hex
    * chars, b = next 12 (48-bit ints). MATERIALIZE the result under its own
    * alias before [[minhashSignatureMd5]] — the signature references it
    * `numHashes` times and an inlined expression would recompute the digests
    * per hash function. */
  def md5HashPairs(shingleCol: Column): Column =
    transform(shingleCol, s => {
      val m = md5(s.cast("binary"))
      struct(conv(substring(m, 1, 12), 16, 10).cast("long").as("a"),
             conv(substring(m, 13, 12), 16, 10).cast("long").as("b"))
    })

  /** MinHash signature on an md5 basis: the classic Carter–Wegman family
    * h_j(x) = a(x) + j·b(x) over the per-shingle md5-derived 48-bit pair —
    * ONE digest per shingle for all `numHashes` functions, and every value
    * an exact integer (a + j·b < 2^54, inside Long and BIGINT), so a DuckDB
    * oracle reproduces the signature bit-for-bit. The verification twin of
    * the xxhash64 kernel, not the production default.
    * `pairCol` must be a materialized [[md5HashPairs]] column. */
  def minhashSignatureMd5(pairCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(pairCol,
        p => p.getField("a") + lit(j.toLong) * p.getField("b")))
    }: _*)

  /** LSH banding: (doc, band_id, band_hash) rows — `bands` bands of
    * `rowsPerBand` signature entries each, hashed to one bucket key. Docs
    * sharing any (band_id, band_hash) are near-dup candidates.
    * `bandHash` maps the "_"-joined band entries to the bucket key
    * (xxhash64 for production speed; md5 for the oracle-checkable twin). */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int,
               bandHash: Column => Column = xxhash64(_)): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        bandHash(concat_ws("_",
          (0 until rowsPerBand).map(r =>
            element_at(col(sigCol), b * rowsPerBand + r + 1)): _*))
          .as("band_hash"))
    }
    df.select(col(idCol), explode(array(bandRows: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))
  }

  /** Candidate pairs via the banded equi-join (id1 < id2, distinct).
    * Plan check: this is a shuffle hash/sort-merge join on
    * (band_id, band_hash) — NO cartesian product anywhere.
    *
    * The band table is materialized before the self-join: Spark evaluates
    * each side of a self-join independently, which would run the whole
    * tokenize→shingle→minhash pipeline twice. The materialized band table is
    * tiny ((id, band, hash) rows) relative to the corpus, so this is the
    * right trade at any scale. localCheckpoint (eager, reference-tracked —
    * blocks reclaimed when the frame is garbage) rather than persist: a
    * persist here would pin a CacheManager entry no caller of this one-shot
    * helper could ever drop (the Windows.scala rule). */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val bands = bandsDf.localCheckpoint(true)
    val a = bands.select(col(idCol).as("id1"), col("band_id"), col("band_hash"))
    val b = bands.select(col(idCol).as("id2"), col("band_id"), col("band_hash"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** End-to-end MinHash-LSH near-dup candidates over a text column.
    *
    * The shingle array is materialized in its own projection before the
    * signature: the signature expression references it `numHashes` times,
    * and keeping it as a multi-referenced alias stops Catalyst's
    * CollapseProject from re-inlining (= recomputing) the tokenize+shingle
    * work once per hash function — a ~30× difference in practice. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 128,
                        bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val withTk = df.select(col(idCol), normTokens(col(textCol)).as("_tk"))
    // Prefer the native codegen'd kernel (graft.expressions.MinHashSignature,
    // registered via GraftExtensions) — one loop per row vs numHashes
    // interpreted HOF passes. Falls back to the pure-builtin composition in
    // sessions without the extension. NOTE: the two paths use different
    // (both valid) hash families — signatures/bands persisted by one are
    // NOT comparable with the other; pick one path per corpus.
    val sigs =
      if (df.sparkSession.catalog.functionExists("graft_minhash64"))
        withTk.select(col(idCol),
          call_function("graft_minhash64", col("_tk"), lit(k), lit(numHashes))
            .as("sig"))
      else {
        val withSh = withTk.select(col(idCol),
          shinglesFromTokens(col("_tk"), k).as("_sh"))
        withSh.select(col(idCol),
          minhashSignature(col("_sh"), numHashes).as("sig"))
      }
    candidatePairs(lshBands(sigs, idCol, "sig", bands, numHashes / bands), idCol)
  }

  /** [[minhashCandidates]] on the md5-parity basis end-to-end (md5 minwise
    * signatures + md5 band buckets): identical plan shape — banded equi-join,
    * never all-pairs — with every hash cross-engine reproducible, so the
    * ENTIRE candidate set is DuckDB-oracle-checkable. */
  def minhashCandidatesMd5(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 3, numHashes: Int = 32,
                           bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val withTk = df.select(col(idCol), normTokens(col(textCol)).as("_tk"))
    // Unlike the xxhash64 pair of paths (different hash families), the md5
    // kernel is BIT-IDENTICAL to the HOF composition — both derive
    // min(a + j·b) from the same per-shingle digest — so the fast path does
    // not weaken the DuckDB oracle check.
    val sigs =
      if (df.sparkSession.catalog.functionExists("graft_minhash_md5"))
        withTk.select(col(idCol),
          call_function("graft_minhash_md5", col("_tk"), lit(k), lit(numHashes))
            .as("sig"))
      else {
        val withSh = withTk.select(col(idCol),
          shinglesFromTokens(col("_tk"), k).as("_sh"))
        // one md5 per shingle, materialized; the 32 signature mins are pure
        // integer arithmetic over the pair array
        val withHp = withSh.select(col(idCol), md5HashPairs(col("_sh")).as("_hp"))
        withHp.select(col(idCol),
          minhashSignatureMd5(col("_hp"), numHashes).as("sig"))
      }
    // band key = first 15 md5 hex chars as a LONG (60 bits): 8-byte join
    // key instead of a 32-char string — cheaper shuffle/compare, same
    // cross-engine reproducibility
    candidatePairs(lshBands(sigs, idCol, "sig", bands, numHashes / bands,
      c => conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")),
      idCol)
  }

  /** POSITIONAL k-gram shingles: element i = tokens i..i+k−1 joined, for
    * every start position (trailing k−1 entries null — filter after the
    * posexplode). Unlike [[shinglesFromTokens]] this keeps positions and
    * repeats: the input to span assembly, where WHERE a match sits matters. */
  def positionalShingles(toks: Column, k: Int): Column =
    (1 until k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), greatest(size(toks) - j, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }

  /** Duplicated-SPAN detection — substring-level dedup/contamination (the
    * exact-substring pass of modern LLM data pipelines, cf. "Deduplicating
    * Training Data Makes Language Models Better"): for each document pair,
    * the longest maximal run of RARE-ANCHORED shared shingles, found
    * WITHOUT any suffix array or all-pairs scan.
    *
    * Precision caveat: a verbatim shared span whose INTERIOR contains a
    * hot shingle (df > `maxDf`) is reported as the islands on either side
    * of it — `max_span_tokens` is therefore a LOWER BOUND on the true
    * longest-shared-run and `n_spans` an upper bound on distinct spans.
    * The bound is exact whenever every interior shingle of the span is
    * rare, which is the operating regime the anchoring targets (hot
    * shingles are boilerplate; spans made of them are ignored on purpose).
    *
    *  1. explode positional k-gram shingles per doc;
    *  2. RARE-SHINGLE ANCHORING: keep shingles appearing in ≤ `maxDf`
    *     docs — stop-phrase shingles ("of the and …") would otherwise
    *     fan the pair join quadratically on hot keys. Any shared span of
    *     ≥ k tokens that contains at least one rare shingle is found;
    *     spans made ENTIRELY of ubiquitous shingles are boilerplate by
    *     definition — exactly what substring dedup wants to ignore.
    *  3. equi-join anchored shingles across docs (id1 < id2) — matches
    *     land on the (pos1 − pos2) diagonal;
    *  4. gaps-and-islands per (pair, diagonal): consecutive positions
    *     collapse to one span of `run + k − 1` tokens.
    *
    * Output: (id1, id2, max_span_tokens, n_spans) for pairs with a span
    * ≥ `minSpan` tokens. All arithmetic is integer-exact — the DuckDB twin
    * replays it verbatim.
    *
    * Scale shape: shingle explode is per-row (no shuffle); the df filter
    * and pair join are shingle-keyed equi-joins (hash-distributed, never
    * all-pairs); span assembly is one window + aggregate partitioned by
    * (id1, id2, diag) — naturally parallel, no single-partition stage. The
    * anchored shingle table is materialized across its self-join via
    * `checkpoint` (same trade — and same no-unpersistable-persist rule —
    * as [[candidatePairs]]). The default is localCheckpoint (eager,
    * reference-tracked, zero serialization format cost) — right up to the
    * point where the shingle rows are a corpus-token-sized table: block-
    * manager blocks are UNCOMPRESSED, and the 1000× rung measured tens of
    * GB of them racing the scan for one disk (SCALE.md r12: rep-2 ENOSPC
    * at 59 GB free). Big-corpus callers pass a COMPRESSED checkpoint
    * (zstd parquet — the repeated shingle strings dictionary-encode away;
    * graft.Queries's q_dup_spans row gates on source size) — same
    * materialize-once semantics, ~10× fewer checkpoint bytes, and on a
    * cluster it lands on the shuffle/scratch volume per node instead of
    * one machine's only disk. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, maxDf: Int = 5, minSpan: Int = 5,
                      checkpoint: DataFrame => DataFrame =
                        _.localCheckpoint(true)): DataFrame = {
    val anchored = checkpoint(anchoredShingles(docs, idCol, textCol, k, maxDf))
    spanAssembly(spanPairRows(anchored), k, minSpan)
  }

  /** Stages 1+2 of [[duplicatedSpans]]: positional shingles, rare-anchored. */
  private def anchoredShingles(docs: DataFrame, idCol: String,
                               textCol: String, k: Int, maxDf: Int): DataFrame = {
    val sh = docs
      .select(col(idCol).as("_id"), normTokens(col(textCol)).as("_tk"))
      .select(col("_id"),
        posexplode(positionalShingles(col("_tk"), k)).as(Seq("pos", "shingle")))
      .filter(col("shingle").isNotNull)
    val rare = sh.groupBy("shingle")
      .agg(countDistinct(col("_id")).as("_df"))
      .filter(col("_df") <= maxDf).select("shingle")
    sh.join(rare, Seq("shingle"))
  }

  /** Stage 3 of [[duplicatedSpans]]: the anchored-shingle self-join —
    * (id1, pos1, id2, pos2, _diag) match rows, one per shared shingle
    * occurrence pair. */
  private def spanPairRows(anchored: DataFrame): DataFrame =
    anchored
      .select(col("shingle"), col("_id").as("id1"), col("pos").as("pos1"))
      .join(anchored.select(col("shingle"), col("_id").as("id2"), col("pos").as("pos2")),
        Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("pos1"), col("id2"), col("pos2"),
        (col("pos1") - col("pos2")).as("_diag"))

  /** Stage 4 of [[duplicatedSpans]]: gaps-and-islands span assembly over
    * the pair-match rows. */
  private def spanAssembly(pairs: DataFrame, k: Int, minSpan: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id1", "id2", "_diag").orderBy("pos1")
    pairs
      .withColumn("_isl", col("pos1") - row_number().over(w))
      .groupBy("id1", "id2", "_diag", "_isl")
      .agg((count(lit(1)) + (k - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .groupBy("id1", "id2")
      .agg(max("span_tokens").as("max_span_tokens"),
        count(lit(1)).as("n_spans"))
  }

  /** [[duplicatedSpans]] with the self-join CHUNKED over
    * `pmod(xxhash64(shingle), chunks)` ranges, each chunk's pair-match
    * rows materialized through `chunkSink` before the next chunk starts
    * (round-14 order #5): the join is an equi-join on the shingle key, so
    * hash-slicing the key space partitions the pair set EXACTLY — every
    * match row comes from one shingle, hence one chunk; the union is the
    * full pair set, bit-identical input to the same span assembly.
    * (Span GROUPS do cross chunks — consecutive positions have different
    * shingles — which is why chunking stops at the pair rows and
    * assembly runs over the union.)
    *
    * What this buys: the full self-join's shuffle spill for a
    * corpus-token-sized shingle table lands on scratch ALL AT ONCE — the
    * single-node 1000× rung measured 14.8× wall for 10× data mostly in
    * that spill race. Driver-sequential chunks cap peak join scratch at
    * ~1/chunks (each chunk's sort/shuffle blocks are freed before the
    * next starts), trading one extra scan of the checkpointed anchored
    * table per chunk. Same cap applies per node on a cluster. Worth it
    * only when the join spills; below spill scale the extra scans are
    * pure overhead — measured either way in SCALE.md (ScaleProbe first,
    * promote on ≥1.5× at sf100 with sf0.1 in-noise). */
  def duplicatedSpansChunked(docs: DataFrame, idCol: String, textCol: String,
                             k: Int = 3, maxDf: Int = 5, minSpan: Int = 5,
                             chunks: Int,
                             checkpoint: DataFrame => DataFrame,
                             chunkSink: (DataFrame, Int) => DataFrame): DataFrame = {
    require(chunks >= 1, s"chunks=$chunks")
    val anchored = checkpoint(anchoredShingles(docs, idCol, textCol, k, maxDf))
    val slices = (0 until chunks).map { c =>
      chunkSink(spanPairRows(
        anchored.filter(pmod(xxhash64(col("shingle")), lit(chunks)) === c)), c)
    }
    spanAssembly(slices.reduce(_.union(_)), k, minSpan)
  }

  /** Exact n-gram Jaccard for (id1, id2) candidate pairs — joins the shingle
    * sets back in (broadcast-friendly: candidates are small) and computes
    * |∩| / |∪| with array HOFs. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, k: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    // Kernel dispatch (session contract like ExactPercentiles.pctl, checked
    // on the DataFrame's OWN session): with graft_sorted_inter_size
    // registered, each doc's shingle set is sorted ONCE (sort_array,
    // before the join fans it into many pairs) and the per-pair
    // intersection count becomes a zero-allocation sorted merge instead
    // of array_intersect's per-pair hash-set build + throwaway result
    // array — which the jaccard filter's join-condition pushdown
    // evaluates TWICE per pair. Counting distinct common values is
    // order-invariant, so the pre-sort is transparent; parity with
    // size(array_intersect(..)) on arbitrary arrays (dups, nulls,
    // unicode) is spec-pinned in SortedIntersectSizeSpec, and the
    // unregistered-session fallback stays on the built-in composition —
    // bit-identical either way.
    // k ≥ 2 only (both the kernel and the checkpoint below): the wins
    // amortize the k−1 zip_with shingle passes and the per-pair
    // array_intersect over MULTI-TOKEN shingles; at k = 1 the shingle
    // set is one cheap array_distinct and the r19 count-sink probes
    // measured no offsetting win for either lever — the k = 1 rows
    // (the four q_neardup_* registry rows) keep their r18-adjudicated
    // plan byte-for-byte.
    val useKernel = k >= 2 && scala.util.Try(docs.sparkSession.catalog
      .functionExists("graft_sorted_inter_size")).getOrElse(false)
    val shExpr = shinglesFromTokens(col("_tk"), k)
    // localCheckpoint: the shingle table feeds BOTH join branches (sh1
    // and sh2 aliases), and Catalyst re-executes shared subtrees — the
    // round-19 decomposition probe (JaccardProbe) measured the double
    // tokenize+shingle build as the row's dominant term (~2×0.45 s of a
    // 2.0 s noop at sf0.1), not the intersect. Materializing once is the
    // house pattern (eager, reference-tracked, reclaimed when the frame
    // is garbage — prefixSumPartitioned / duplicatedSpans precedent);
    // rows = one small (id, shingles) row per doc, never corpus-token
    // sized. Re-probed this round after the r18 deferral, per the
    // verdict's order #3.
    val shPlain = docs.select(col(idCol), normTokens(col(textCol)).as("_tk"))
      .select(col(idCol),
        (if (useKernel) sort_array(shExpr) else shExpr).as("sh"))
    // k ≥ 2 only: the double-build the checkpoint avoids is the k−1
    // zip_with shingle passes; at k = 1 shinglesFromTokens is a single
    // array_distinct over the tokens, cheaper than the checkpoint's own
    // eager materialization job (measured on the k=1 neardup rows:
    // count-sink +0.1–0.2 s from the job, no offsetting win)
    val sh = if (k >= 2) shPlain.localCheckpoint(true) else shPlain
    val interExpr =
      if (useKernel)
        call_function("graft_sorted_inter_size", col("sh1"), col("sh2"))
      else size(array_intersect(col("sh1"), col("sh2")))
    pairs
      .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", interExpr)
      // |A ∪ B| = |A| + |B| − |A ∩ B| exactly: shingle arrays are DISTINCT
      // by construction (shinglesFromTokens array_distincts; the short-doc
      // branch is a singleton), so the arithmetic form is bit-identical to
      // size(array_union(...)) — including nulls (size(null) = null
      // propagates through both forms) — while skipping the union array's
      // per-pair materialization, the single most expensive expression in
      // the verify stage (guide §4: cheaper identical expression over
      // building a throwaway array). Inclusion–exclusion parity is pinned
      // by DedupSpec's jaccardVerify fixtures (identical/near/disjoint
      // docs) and the six oracle rows built on this verify.
      .withColumn("uni",
        size(col("sh1")) + size(col("sh2")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash-64 of the token multiset: sign-sum of per-token hash bits.
    * Near-dups have small Hamming distance between fingerprints. Pure
    * expression tree (transform over 64 bit positions + HOF fold).
    * NOTE: the 64 bit-position folds each reference `hashes`; when applying
    * per-row at volume, materialize the token-hash array first (see
    * [[simhashFromHashes]]) so it isn't recomputed 64×. */
  def simhash(text: Column): Column =
    simhashFromHashes(tokenHashes(text))

  /** Per-token xxhash64 array — materialize this under an alias before
    * calling [[simhashFromHashes]] in hot paths. */
  def tokenHashes(text: Column): Column =
    transform(graft.text.TextStats.tokens(lower(text)), t => xxhash64(t))

  def simhashFromHashes(hashes: Column): Column = {
    // For each bit position: +1 if set else -1, summed over tokens; the
    // fingerprint sets the bit when the sum is positive.
    // shiftright/shiftleft DSL overloads take a literal Int shift; inside a
    // HOF lambda the shift is a Column, so go through call_function (the SQL
    // expressions accept arbitrary child expressions).
    val bits = transform(sequence(lit(0), lit(63)), bit =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(
          call_function("shiftright", h, bit).bitwiseAND(lit(1L)) === 1, 1L)
          .otherwise(-1L)) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bits, sequence(lit(0), lit(63)),
      (b, i) => call_function("shiftleft", b, i)), lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash-32 on an md5-parity basis: token hash bit j = parity of hex
    * char j of md5(token). Functionally identical to [[simhash]] but built
    * ONLY from cross-engine-stable primitives (md5/ascii/substring), so a
    * SQL oracle can verify the sign-sum fingerprint math bit-for-bit.
    * `md5s` must be a materialized array<string> of per-token md5 hex.
    *
    * This is the pure-builtin FALLBACK path; sessions with GraftExtensions
    * use the bit-identical `graft_simhash_md5` codegen kernel instead (one
    * token-array pass vs 32 interpreted filter passes — and a measured
    * warning to future editors: a "single-pass" rewrite with an
    * `aggregate`/`zip_with` HOF accumulator is 3–5× SLOWER than these
    * filter passes, because interpreted lambdas allocate a fresh
    * nBits-array per token; only the native kernel actually wins). */
  def simhash32Md5(md5s: Column): Column = {
    val n = size(md5s)
    val bits = (0 until 32).map { j =>
      // count of tokens with an odd hex char at position j
      val ones = size(filter(md5s,
        m => pmod(ascii(substring(m, j + 1, 1)), lit(2)) === 1))
      // bit set when strictly more than half the tokens vote 1
      when(ones * 2 > n, lit(1L) * lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash-64 on the same md5 basis as [[simhash32Md5]] — the
    * wider-fingerprint lever SCALE.md documents for large distinct-hash
    * cardinalities: doubling fingerprint bits lets Hamming bands double in
    * width at the same band count, dividing random band collisions by
    * another 2^w. Bit j votes on ascii bit (j % 2) of hex char (j / 2) of
    * each token's md5 (32 hex chars × 2 low ascii bits = 64 votes),
    * majority-set — every primitive (md5/ascii/substring/÷2) replays
    * bit-for-bit in a SQL oracle. */
  def simhash64Md5(md5s: Column): Column = {
    val n = size(md5s)
    val bits = (0 until 64).map { j =>
      val c = j / 2
      val b = j % 2
      val ones = size(filter(md5s, m =>
        pmod(shiftright(ascii(substring(m, c + 1, 1)), b), lit(2)) === 1))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Per-token md5 array for [[simhash32Md5]] / [[simhash64Md5]] —
    * materialize under an alias. */
  def tokenMd5s(text: Column): Column =
    transform(graft.text.TextStats.tokens(lower(text)), t => md5(t.cast("binary")))

  /** Exact dedup: keep the smallest `idCol` per normalized-text fingerprint.
    * One map-side-combinable min_by groupBy — the minimal shuffle shape. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = graft.text.TextStats.fingerprintMd5(col(textCol))
    df.withColumn("fp", fp)
      .groupBy("fp").agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
  }

  /** Exact-dedup SURVIVORS: the full original rows of the kept document per
    * fingerprint group (what a training pipeline actually feeds downstream).
    * A semi-join against the per-group min id — no row data moves through
    * the aggregate. */
  def exactDedupSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactDedup(df, idCol, textCol).select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Incremental exact dedup — the nightly-ingest shape: a NEW batch is
    * deduplicated against an already-curated BASE corpus (drop any new
    * doc whose normalized fingerprint the base already holds) and then
    * within itself (keep-first). The base is NEVER rescanned beyond one
    * fingerprint projection, and the corpus-sized side shuffles only on
    * the fingerprint key — at 100 TB the base fingerprint table is the
    * thing you keep materialized between ingests, so the recurring cost
    * is one anti-join of batch-sized against base-fingerprint-sized.
    * Returns the surviving NEW rows. */
  def exactDedupIncremental(newDf: DataFrame, idCol: String, textCol: String,
                            base: DataFrame, baseTextCol: String): DataFrame = {
    val baseFp = base
      .select(graft.text.TextStats.fingerprintMd5(col(baseTextCol)).as("_fp"))
      .distinct()
    // the fingerprint is computed ONCE per batch row and reused for both
    // the base anti-join and the within-batch keep-first (re-deriving it
    // via exactDedupSurvivors would pay the normalize+digest scan twice)
    val fresh = newDf
      .withColumn("_fp", graft.text.TextStats.fingerprintMd5(col(textCol)))
      .join(baseFp, Seq("_fp"), "left_anti")
    val keep = fresh.groupBy("_fp").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    fresh.drop("_fp").join(keep, Seq(idCol), "left_semi")
  }

  /** Exact-dedup survivors by QUALITY: keep the row maximizing `scoreCol`
    * per fingerprint group (ties → smallest `idCol`) — the retention
    * policy real pipelines use (keep the best-quality duplicate, not the
    * first-seen). One ranked window partitioned by the fingerprint: the
    * shuffle is keyed on the fingerprint, groups are duplicate-set-sized
    * (tiny), and no second pass over the corpus is needed. */
  def exactDedupSurvivorsByQuality(df: DataFrame, idCol: String,
                                   textCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_fp").orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("_fp", graft.text.TextStats.fingerprintMd5(col(textCol)))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_fp", "_rk")
  }

  /** Near-dup CLUSTERS from candidate/verified pairs: connected components,
    * labeled by the smallest member id. Returns (id, cluster) for every id
    * appearing in `pairs` (singletons are implicitly their own cluster).
    *
    * Distributed label propagation: iterate "my label = min(my label, my
    * neighbors' labels)" to fixpoint. Each round is one groupBy over the
    * edge list — no driver materialization, so the edge set can be
    * arbitrarily large; rounds needed = graph diameter (near-dup clusters
    * are small and dense, so a handful). */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 25,
                      driverThreshold: Long = 1000000L): DataFrame = {
    // The candidate-pair graph is tiny relative to the corpus (bounded by
    // LSH collision rates), so below `driverThreshold` edges a driver
    // union-find (2 Spark jobs total) beats ~log(diameter) iterative
    // shuffle rounds. The distributed propagation below remains the path
    // for genuinely huge edge sets.
    val persisted = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = persisted.count()
    // fast path needs integral ids (string/hash ids go distributed, where
    // min-label works on any orderable type)
    val integralIds = Seq("id1", "id2").forall(c => persisted.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    if (nPairs <= driverThreshold && integralIds) {
      val spark = persisted.sparkSession
      import spark.implicits._
      val edges = persisted.select(col("id1").cast("long"), col("id2").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      persisted.unpersist()
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      return parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "cluster")
    }
    // the distributed path runs eagerly (per-round counts), so keep the
    // persist from the edge-count probe above alive through the call
    // (its edge build scans `pairs` once) and release it after
    val result = nearDupClustersDistributed(persisted, maxIters)
    persisted.unpersist()
    result
  }

  /** The scale path: distributed min-label propagation with pointer
    * jumping — O(log diameter) rounds, edge set never driver-materialized. */
  def nearDupClustersDistributed(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // Undirected edge list, both directions + self-loops (keeps every id),
    // built in ONE scan of `pairs` via explode — the former 4-way
    // union referenced the (possibly expensive, possibly unpersisted)
    // pair-construction subtree four times, quadrupling e.g. a
    // jaccardVerify upstream when the caller hadn't persisted it.
    val edges = pairs
      .select(explode(array(
        struct(col("id1").as("src"), col("id2").as("dst")),
        struct(col("id2").as("src"), col("id1").as("dst")),
        struct(col("id1").as("src"), col("id1").as("dst")),
        struct(col("id2").as("src"), col("id2").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      // 1) min label over neighborhood (incl. own current label). The
      //    self-loop row (dst == src) carries x's OWN previous label, so
      //    the same aggregate also emits it as `old` — the convergence
      //    check below then needs no extra join against `labels`.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("nc"),
          min(when(col("dst") === col("src"), col("cluster"))).as("old"))
      // 2) pointer jump — label(x) := label(label(x)) — so chains collapse
      //    in O(log diameter) rounds, not O(diameter)
      val next = viaNeighbors.alias("a")
        .join(labels.select(col("id").as("pid"), col("cluster").as("pc")),
          col("a.nc") === col("pid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.nc"), coalesce(col("pc"), col("a.nc"))).as("cluster"),
          col("a.old").as("old"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ONE action per round: this count both materializes `next` into the
      // cache and reads the convergence signal off the carried `old`
      // column (labels only ever decrease, so new < old ⟺ changed).
      changed = next.filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next
      i += 1
    }
    // cost attribution for operators/benches built on this loop: rounds ≈
    // ceil(log2(component diameter)) + 1 settle round, each round ~2
    // shuffle stages — at small SF the row's cost IS this fixed round
    // count times per-job overhead, amortized away at real data volume
    System.err.println(
      if (changed > 0)
        s"[graft] nearDupClustersDistributed: stopped at maxIters=$maxIters " +
          s"after $i rounds without converging"
      else s"[graft] nearDupClustersDistributed: converged in $i rounds")
    edges.unpersist()
    // hand back a localCheckpoint and release the SQL-cache entry: cached
    // DataFrames live in the CacheManager until explicitly unpersisted, but
    // localCheckpoint blocks are reference-tracked and reclaimed by the
    // ContextCleaner once the returned frame is garbage — no leak per call.
    // (drop the loop-internal `old` convergence column if any round ran)
    val result = labels.select("id", "cluster").localCheckpoint(eager = true)
    labels.unpersist()
    result
  }

  /** Cluster-dedup survivors: keep the smallest id of each near-dup cluster
    * plus every document not in any candidate pair. */
  def nearDupSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = nearDupClusters(pairs)
    val losers = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Near-dup retention by QUALITY: keep the best-`score` member of each
    * near-dup cluster (ties → min id) instead of [[nearDupSurvivors]]'s
    * min-id representative — what production pipelines actually retain
    * (the longest / highest-quality variant of a duplicated page, not
    * whichever crawled first). Docs outside every cluster survive
    * unconditionally.
    *
    * Scale shape: the cluster table is edge-bounded (LSH collision rate),
    * joined once onto the corpus; the per-cluster argmax is ONE
    * struct-max aggregate (max(score), then max(−id) = min id — no
    * ranked window over the corpus), and survivors come back via a
    * left-semi join on the id. */
  def nearDupSurvivorsByQuality(df: DataFrame, idCol: String,
                                pairs: DataFrame, score: Column): DataFrame = {
    val clusters = nearDupClusters(pairs)
    val withCl = df
      .join(clusters, df(idCol) === clusters("id"), "left")
      .withColumn("_cl", coalesce(col("cluster"), col(idCol)))
    val best = withCl.groupBy(col("_cl"))
      .agg(max(struct(score.as("_s"), (-col(idCol)).as("_negid"))).as("_b"))
      .select((-col("_b._negid")).as(idCol))
    df.join(best, Seq(idCol), "left_semi")
  }

  /** Sub-document SEGMENT dedup — the CCNet/RefinedWeb "line dedup" curation
    * stage (remove lines repeated across pages: navigation chrome, cookie
    * banners, license blurbs) adapted to newline-free corpora: each document
    * is cut into consecutive NON-overlapping `segTokens`-token segments (the
    * "lines"; the final partial segment is kept), each segment is md5-
    * fingerprinted, and a segment occurring in ≥ `minDf` DISTINCT documents
    * is removed from EVERY document carrying it (line dedup keeps no copy —
    * unlike document-level dedup, a repeated line is boilerplate evidence,
    * not content to preserve once). Output: one row per tokenizable doc —
    * the REWRITTEN text (surviving segments rejoined in order) plus audit
    * counts (`n_segs`, `n_dup_segs`, `tokens_removed`).
    *
    * Complements the rest of the family: [[exactDedup]] drops whole
    * duplicate documents, [[duplicatedSpans]] REPORTS repeated spans between
    * rare-anchored pairs, [[graft.text.TextStats.boilerplate]] SCORES hot
    * k-gram coverage — this is the operator that actually rewrites the
    * corpus. Whitespace-only documents have no segments and are absent from
    * the output (mirrored by the oracle).
    *
    * Scale shape: the segment explode is per-row (corpus-linear, ~1/seg of
    * token count); the document-frequency count is ONE segment-keyed
    * aggregate (map-side combinable); the hot table (≤ positions/minDf rows,
    * usually far fewer) joins back onto the segments by fingerprint — left
    * to AQE, which broadcasts when the filtered aggregate lands small; the
    * rewrite is ONE id-keyed aggregate whose per-group state is document-
    * sized (the same bound as any per-doc reassembly). No all-pairs shape
    * anywhere; everything keys on fingerprints or ids. */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   segTokens: Int = 4, minDf: Int = 2): DataFrame = {
    require(segTokens > 0 && minDf > 1,
      s"need segTokens > 0 and minDf > 1, got segTokens=$segTokens minDf=$minDf")
    val sg = segmentTable(docs, idCol, textCol, segTokens)
    val hot = sg.groupBy("_f")
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col("_f"), lit(1L).as("_hot"))
    rewriteSegments(sg.join(hot, Seq("_f"), "left"), idCol)
  }

  /** The positional-segment table behind [[segmentDedup]]: one row per
    * non-overlapping `segTokens`-token segment — (id, _i position, _seg
    * text, _ntok length, _f md5 fingerprint). The empty token a
    * whitespace-only text collapses to is filtered (the TextStats.tokens
    * contract), so blank docs contribute zero rows. */
  private def segmentTable(docs: DataFrame, idCol: String, textCol: String,
                           segTokens: Int): DataFrame = {
    val tk = docs.select(col(idCol),
        filter(normTokens(col(textCol)), t => t =!= lit("")).as("_tk"))
      .filter(size(col("_tk")) > 0)
    val lastSeg = ceil(size(col("_tk")).cast("double") / segTokens)
      .cast("long") - 1L
    val piece = slice(col("_tk"), (col("_i") * segTokens + 1).cast("int"),
      lit(segTokens))
    tk.withColumn("_i", explode(sequence(lit(0L), lastSeg)))
      .select(col(idCol), col("_i"),
        concat_ws(" ", piece).as("_seg"), size(piece).as("_ntok"))
      .withColumn("_f", md5(col("_seg")))
  }

  /** Per-doc rewrite from a flagged segment table (`_hot` = 1 on removable
    * rows, null otherwise): audit counts + surviving segments rejoined in
    * position order. Per-group state is document-sized. */
  private def rewriteSegments(flagged: DataFrame, idCol: String): DataFrame =
    flagged.groupBy(idCol)
      .agg(
        count(lit(1)).as("n_segs"),
        coalesce(sum(col("_hot")), lit(0L)).as("n_dup_segs"),
        coalesce(sum(when(col("_hot").isNotNull, col("_ntok"))), lit(0L))
          .as("tokens_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("_hot").isNull, struct(col("_i"), col("_seg"))))),
          x => x("_seg"))).as("cleaned"))

  /** Incremental [[segmentDedup]] — the nightly-ingest shape (the
    * [[exactDedupIncremental]] pattern one grain finer): the base corpus
    * keeps a materialized per-segment distinct-doc-frequency table; a NEW
    * batch is segmented, its fingerprints join the base table (batch-sized
    * join — the recurring cost), and a segment is hot iff base df + batch
    * df reaches `minDf`. Only batch documents are rewritten. An id on
    * BOTH sides is a re-ingest: its base copy is excluded from the base
    * df (the batch version supersedes it), so overlapping ids cannot
    * double-count a genuinely unique segment into hotness.
    *
    * EQUIVALENCE: the output is exactly `segmentDedup((base ∖ batch ids)
    * ∪ batch)` restricted to batch ids (distinct-doc counts add across
    * the now-disjoint id sets) — spec-asserted, so the incremental path
    * can never drift from the batch semantics. Here the base df table is
    * derived in-query; a production pipeline materializes it once per
    * ingest epoch (keyed by fingerprint WITH contributing ids, so
    * supersession is a decrement) and the recurring cost is one
    * fingerprint-keyed join per batch. */
  def segmentDedupIncremental(newDf: DataFrame, idCol: String, textCol: String,
                              base: DataFrame, baseIdCol: String,
                              baseTextCol: String, segTokens: Int = 4,
                              minDf: Int = 2): DataFrame = {
    require(segTokens > 0 && minDf > 1,
      s"need segTokens > 0 and minDf > 1, got segTokens=$segTokens minDf=$minDf")
    val batchIds = newDf.select(col(idCol).as(baseIdCol)).distinct()
    val baseDf = segmentTable(
        base.join(batchIds, Seq(baseIdCol), "left_anti"),
        baseIdCol, baseTextCol, segTokens)
      .groupBy("_f").agg(countDistinct(col(baseIdCol)).as("_bdf"))
    val sg = segmentTable(newDf, idCol, textCol, segTokens)
    val hot = sg.groupBy("_f")
      .agg(countDistinct(col(idCol)).as("_ndf"))
      .join(baseDf, Seq("_f"), "left")
      .filter(col("_ndf") + coalesce(col("_bdf"), lit(0L)) >= minDf)
      .select(col("_f"), lit(1L).as("_hot"))
    rewriteSegments(sg.join(hot, Seq("_f"), "left"), idCol)
  }
}
