package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Align, Fill, Score, Windows}
import graft.operators.Scalers

/** The verification surface: every oracle-checkable operator registered as a
  * named query over the driver testdata, with matching DuckDB SQL.
  *
  * Conventions that make the hash-compare stable cross-engine:
  *  - every column name matches between the Spark result and the oracle SQL;
  *  - every query ends with a deterministic ORDER BY mirrored in the SQL;
  *  - computed doubles are rounded (6 dp for unit-scale values, 2 dp for
  *    money sums) because Spark and DuckDB sum in different orders (ulp
  *    drift); pass-through and pure-integer values are left exact;
  *  - `events.ts` (ns parquet) is keyed as integer microseconds `ts_us` —
  *    identical to DuckDB's ns→µs truncation of the same file;
  *  - float formulas that feed ordering/bucketing use the identical
  *    operation order on both sides (see Score.histogramBucket).
  */
object Queries {

  private val Types = Tables.EventTypes // click, error, purchase, signup, view
  private val L = 20 // reference sequence_length (config.yaml:97)

  /** Kernel-or-fallback SimHash dispatch: `graft_simhash_md5` is
    * bit-identical to the Dedup HOF fallbacks (one codegen'd token-array
    * pass vs nBits interpreted filter passes), so the fast path never
    * weakens the oracle check — the same contract as the MinHash kernels. */
  private def simhashMd5Col(s: SparkSession, m: Column, bits: Int): Column =
    if (s.catalog.functionExists("graft_simhash_md5"))
      call_function("graft_simhash_md5", m, lit(bits))
    else if (bits == 32) graft.dedup.Dedup.simhash32Md5(m)
    else graft.dedup.Dedup.simhash64Md5(m)

  /** Temp directory deleted on JVM exit. The staged-pipeline / index-append
    * rows hand parquet artifacts to a LAZY result frame, so eager deletion
    * would race the consumer — but never deleting leaks a corpus-sized
    * directory per invocation into /tmp (bench reps + oracle runs + specs
    * add up until the filesystem fills mid-certification). A shutdown hook
    * bounds the leak to one JVM session. */
  private[graft] def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    ScratchDirs.track(p)
    p.toString
  }

  /** ONE static shutdown hook over a concurrent list of scratch roots:
    * registering a hook per scratchDir() call leaked a Thread object per
    * invocation into the JVM's hook set (bench reps + PlanGuard registry
    * sweeps call query builders hundreds of times per session), and until
    * exit each hook pinned a corpus-sized /tmp directory path. Eager
    * deletion is still wrong (the staged/append rows hand artifacts to a
    * LAZY result frame), so the contract stays delete-on-exit — but state
    * is now one hook + one path per live dir, and dirs deleted mid-session
    * by ops like rebuild drop out via the exists() guard. */
  private object ScratchDirs {
    private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(p => graft.util.Fs.deleteRecursively(p.toFile))
    }))
    def track(p: java.nio.file.Path): Unit = { dirs.add(p); () }
  }

  /** The decode-once media index for this dataset's synthetic mediaAssets
    * (dim 16 — the registry's feature arity): build-if-absent, cached in
    * the JVM temp dir keyed by the documents.parquet identity, so the
    * FIRST media query in any JVM (bench child, Verify, a spec) pays the
    * single indexRow decode pass and every other one reads parquet. See
    * MediaIndex.cachedFor for the cross-process install protocol. */
  private def mediaIndexPath(s: SparkSession, d: String): String =
    graft.multimodal.MediaIndex.cachedFor(s, d)(
      graft.multimodal.Multimodal.mediaAssets(Tables.documents(s, d), "doc_id"))

  /** Checkpoint strategy for [[graft.dedup.Dedup.duplicatedSpans]]'s
    * anchored-shingle self-join, gated on SOURCE size: under the
    * threshold, localCheckpoint (zero format cost — the sf0.1 cert row's
    * steady path, unchanged); over it, a zstd-parquet scratch round-trip —
    * the shingle table is corpus-token-sized and block-manager checkpoint
    * blocks are UNCOMPRESSED, which is what ran the 1000× rung out of
    * disk (SCALE.md r12). 64 MB of documents.parquet ≈ half a billion
    * shingle rows downstream — far past where compression wins. */
  private[graft] def shingleCheckpoint(s: SparkSession, d: String)
      : DataFrame => DataFrame = {
    val src = new java.io.File(d, "documents.parquet")
    val bytes: Long =
      if (src.isFile) src.length
      else Option(src.listFiles()).getOrElse(Array.empty)
        .map(_.length()).sum
    if (bytes < (64L << 20)) _.localCheckpoint(true)
    else df => {
      val path = scratchDir("graft_shingle_ckpt")
      df.write.mode("overwrite")
        .option("compression", "zstd")
        // writer memory, not output size, is the binding constraint: 32
        // concurrent tasks each buffer a full row group + dictionary
        // pages, and the default 128 MB groups + dictionary-encoding of
        // high-cardinality shingle strings OOM'd an 8g driver-executor at
        // 1000×. Anchored shingles appear ≤ maxDf times each, so a
        // dictionary can't pay for itself — zstd alone carries the
        // compression; 32 MB groups cap the per-task buffer.
        .option("parquet.block.size", (32L << 20).toString)
        .option("parquet.enable.dictionary", "false")
        .parquet(path)
      s.read.parquet(path)
    }
  }

  private val MediaCertBudget = 5000L
  // one count JOB per corpus per JVM, not per row-build per rep: the
  // metadata-only count still costs ~0.2–0.3 s of job overhead, and the
  // first r13 cert showed every gated row paying it in every rep. Keyed
  // on the canonical dataset dir — bench/verify corpora are immutable
  // for a JVM's lifetime (regenerating one mid-JVM is not a supported
  // measurement posture).
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Sample modulus for [[mediaCertDocs]]: the budget ceiling, bumped past
    * any multiple of 3 — the corpus generator assigns modality as
    * `doc_id % 3`, so a K ≡ 0 (mod 3) slice contains exactly ONE modality
    * (round-14 ADVICE, high: at sf10 n=510k gave K=102, every sampled doc
    * an image — q_mm_adpcm certified ZERO audio assets and q_mm_probe
    * never touched the WAV/Y4M parsers at builder scale). With
    * gcd(K, 3) = 1 the multiples of K cycle through every residue mod 3,
    * so each modality keeps ≈ budget/3 coverage at ANY corpus size. */
  private[graft] def mediaCertK(n: Long): Long = {
    var k = (n + MediaCertBudget - 1) / MediaCertBudget
    while (k % 3 == 0) k += 1
    k
  }

  /** SF-gated deterministic doc sample for the per-asset CODEC-
    * CERTIFICATION rows (q_mm_jpeg / q_mm_adpcm / q_mm_probe): at
    * ≤ [[MediaCertBudget]] docs (every driver corpus — oracle sf0.01 =
    * 500 docs, cert base sf0.1 = 5000) K = 1 and the rows certify the
    * FULL corpus, so the static DuckDB oracles replay unchanged; above it
    * (builder scale corpora — ld1 51k, sf10 510k) they certify the
    * deterministic `doc_id % K == 0` slice sized back to the budget, with
    * K kept coprime to the 3-way modality cycle ([[mediaCertK]]) so every
    * codec keeps nonzero coverage. Per-asset codec certification is
    * population-independent — each asset's encode→decode round-trip is
    * checked in isolation, so a fixed-budget deterministic sample asserts
    * the same per-asset law at 1/K the decode wall (round-13 order #5:
    * these three rows were 106.9 s of the 112.7 s sf10 media family,
    * re-certifying 510k assets one by one per bench rep). The sampled
    * FORMULA itself stays oracle-certified at EVERY sf by the static-K
    * `q_mm_*_sampled` rows below. The count is parquet metadata-only (no
    * filter, no data scan). */
  private def mediaCertDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docCountCache.computeIfAbsent(
      new java.io.File(d).getCanonicalPath, _ => docs.count()).longValue
    val k = mediaCertK(n)
    // Pure-arithmetic coverage guard (no extra job): doc_ids come in
    // dense runs (0..base-1 per scale copy, shifted by copy·10⁷ —
    // MakeScale) far longer than 3k, and modality = doc_id % 3; with
    // gcd(k,3)=1 any dense run holding ≥ 3 multiples of k covers all
    // three residues — every modality certified non-vacuously. Fires
    // only if the formula regresses (k divisible by 3) or the budget
    // outgrows the corpus.
    require(k <= 1L || (k % 3 != 0 && n >= 3 * k),
      s"media-cert sample would drop a modality: n=$n k=$k")
    if (k <= 1L) docs else docs.filter(pmod(col("doc_id"), lit(k)) === 0)
  }

  /** Same dispatch for the xxhash64 production basis: `graft_simhash64`
    * (one codegen'd pass) over the HOF fallback, whose 64-wide
    * transform-of-aggregate tree costs ~8 s of ANALYSIS+codegen per
    * construction regardless of data size (measured; SimHashFromHashes
    * scaladoc). Bit-parity pinned by SimHashMd5Spec. */
  private def simhashXxCol(s: SparkSession, h: Column): Column =
    if (s.catalog.functionExists("graft_simhash64"))
      call_function("graft_simhash64", h)
    else graft.dedup.Dedup.simhashFromHashes(h)

  // --- shared Spark-side building blocks ---

  /** Long-form per-minute series: (ts_min, event_type, v) with v = rounded
    * minute average per type. */
  private def minuteLong(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("ts_us div 60000000").as("ts_min"), col("event_type"))
      .agg(round(avg("value"), 6).as("v"))

  /** Wide per-minute table: one row per minute, one column per event type.
    * Pivoted DIRECTLY from events in one shuffle — `avg` per (minute, type)
    * inside the pivot equals the pre-aggregated two-shuffle form, so the
    * intermediate minuteLong grouping is fused away. */
  private def minuteWide(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("ts_us div 60000000").as("ts_min"))
      .pivot("event_type", Types)
      .agg(round(avg("value"), 6))

  /** Long-form 10-minute series, the J2 grain (see q_pivot_inner_j2). */
  private def tenMinLong(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("ts_us div 600000000").as("ts_bkt"), col("event_type"))
      .agg(round(avg("value"), 6).as("v"))

  /** Single-series (click) minute values with 0-based row number `rn`. */
  private def clickSeries(s: SparkSession, dir: String): DataFrame =
    minuteLong(s, dir).filter(col("event_type") === "click")
      .select("ts_min", "v")

  /** events as an integer milli-unit sample table (event_type, ts_us,
    * event_id, v) — the shared fixture for the PromQL function family
    * (exact long values; see Rates' numeric-determinism contract). */
  private def milliEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_type"), col("ts_us"),
      col("event_id"), expr("cast(round(value * 1000) as long)").as("v"))

  // --- shared oracle-side SQL building blocks ---

  /** events with integer-µs key (DuckDB truncates ns→µs identically). */
  private val EvSql =
    "SELECT event_id, user_id, event_type, value, props, epoch_us(ts) AS ts_us FROM events"

  /** Oracle mirror of [[milliEvents]] (exact milli-unit integers). */
  private val MilliEvSql =
    "SELECT event_type, epoch_us(ts) AS ts_us, event_id, CAST(round(value * 1000) AS BIGINT) AS v FROM events"

  // q_ewma parameters — shared by the Spark plan and the generated oracle
  // text so both engines multiply the SAME double weight literals
  private val EwmaAlpha = 0.3
  private val EwmaK = 40

  // q_holt_winters smoothing/trend factors (Prometheus sf/tf)
  private val HwSf = 0.3
  private val HwTf = 0.1

  /** Generated q_holt_winters oracle: DuckDB replays the Prometheus
    * double-smoothing recurrence as a RECURSIVE CTE (one step per rank),
    * with sf/tf AND their Scala-computed complements embedded via
    * Double.toString — every fp op in the identical order as the
    * mapPartitions fold, so hundreds of chained steps stay bit-equal. */
  private def holtWintersOracleSql: String = {
    val sf = HwSf.toString; val omSf = (1.0 - HwSf).toString
    val tf = HwTf.toString; val omTf = (1.0 - HwTf).toString
    val sRec = s"$sf * m.v + $omSf * (hw.s + hw.b)"
    s"""WITH RECURSIVE m AS (
       |  SELECT event_type, ts_bkt, v, CAST(row_number() OVER (
       |      PARTITION BY event_type ORDER BY ts_bkt) AS BIGINT) AS rn
       |  FROM (SELECT ts_us // 3600000000 AS ts_bkt, event_type,
       |      CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*) / 1000.0
       |        AS v FROM ($MilliEvSql) GROUP BY 1, 2)),
       |hw AS (
       |  SELECT event_type, ts_bkt, rn, v, s,
       |    $tf * (s - x0) + $omTf * b0 AS b
       |  FROM (SELECT m2.event_type, m2.ts_bkt, m2.rn, m2.v, m1.v AS x0,
       |      (m2.v - m1.v) AS b0,
       |      $sf * m2.v + $omSf * (m1.v + (m2.v - m1.v)) AS s
       |    FROM m m2 JOIN m m1 ON m1.event_type = m2.event_type
       |      AND m1.rn = 1 WHERE m2.rn = 2)
       |  UNION ALL
       |  SELECT m.event_type, m.ts_bkt, m.rn, m.v,
       |    $sRec AS s,
       |    $tf * (($sRec) - hw.s) + $omTf * hw.b AS b
       |  FROM hw JOIN m ON m.event_type = hw.event_type
       |    AND m.rn = hw.rn + 1)
       |SELECT event_type, ts_bkt, v, CAST(NULL AS DOUBLE) AS hw_level,
       |  CAST(NULL AS DOUBLE) AS hw_trend
       |FROM m WHERE rn = 1
       |UNION ALL
       |SELECT event_type, ts_bkt, v, round(s, 6) AS hw_level,
       |  round(b, 6) AS hw_trend FROM hw
       |ORDER BY event_type, ts_bkt""".stripMargin
  }

  /** Generated q_ewma oracle: the bounded-lag closed form with weight
    * literals emitted via Double.toString (shortest round-trip repr —
    * DuckDB parses back the identical double). Term order and association
    * mirror Rates.ewma's left-fold exactly. */
  private def ewmaOracleSql: String = {
    val ws = graft.operators.Rates.ewmaWeights(EwmaAlpha, EwmaK)
    val lagDefs = (1 until EwmaK)
      .map(j => s"lag(v, $j) OVER w AS l$j").mkString(",\n    ")
    def src(j: Int) = if (j == 0) "v" else s"l$j"
    val numer = ws.zipWithIndex.map { case (wt, j) =>
      s"CASE WHEN ${src(j)} IS NOT NULL THEN ${src(j)} * $wt ELSE 0.0 END"
    }.mkString(" + ")
    val denom = ws.zipWithIndex.map { case (wt, j) =>
      s"CASE WHEN ${src(j)} IS NOT NULL THEN $wt ELSE 0.0 END"
    }.mkString(" + ")
    s"""WITH ev AS ($MilliEvSql),
       |l AS (SELECT event_type, ts_us, event_id, v,
       |    $lagDefs
       |  FROM ev WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id))
       |SELECT event_type, ts_us, event_id, v,
       |  round(($numer) / ($denom) / 1000.0, 6) AS ewma_val
       |FROM l ORDER BY event_id""".stripMargin
  }

  private val MinuteLongSql =
    s"""SELECT ts_us // 60000000 AS ts_min, event_type, round(avg(value),6) AS v
       |FROM ($EvSql) GROUP BY 1, 2""".stripMargin

  private def filterAvg(t: String) =
    s"""round(avg(value) FILTER (WHERE event_type = '$t'), 6) AS "$t""""

  private val MinuteWideSql =
    s"""SELECT ts_us // 60000000 AS ts_min,
       |  ${Types.map(filterAvg).mkString(",\n  ")}
       |FROM ($EvSql) GROUP BY 1""".stripMargin

  private val ClickSeriesSql =
    s"SELECT ts_min, v FROM ($MinuteLongSql) WHERE event_type = 'click'"

  /** Exact brute-force ANN replay — shared VERBATIM by q_ann_brute and
    * q_ann_pca_exact (the full-shortlist PCA path degenerates to brute
    * force, and sharing one string keeps the twins unsplittable). */
  private val annBruteSql =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    round(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id) AS rank
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
       |SELECT qid, vec_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM scored WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** Segment-dedup replay (tokenize → `segTokens`-token segments → md5
    * df ≥ `minDf` → ordered surviving rejoin), parameterized by the final
    * batch filter — q_segment_dedup uses the empty filter, the incremental
    * twin restricts to odd ids — and by the SAME (segTokens, minDf) the
    * Spark registry entries pass, so a parameter tweak on one side cannot
    * silently desynchronize the oracle. One string, so the replays cannot
    * diverge. */
  private def segmentDedupSql(where: String, segTokens: Int = 4,
                              minDf: Int = 2) =
    s"""WITH tk AS (SELECT doc_id,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |      y -> y <> '') AS t
       |  FROM documents),
       |st AS (SELECT doc_id, t, CAST(ceil(len(t) / $segTokens.0) AS BIGINT) AS nseg
       |  FROM tk WHERE len(t) > 0),
       |ex AS (SELECT doc_id, t, unnest(range(0, nseg)) AS i FROM st),
       |sg AS (SELECT doc_id, i,
       |    array_to_string(list_slice(t, i*$segTokens + 1, i*$segTokens + $segTokens), ' ') AS seg,
       |    len(list_slice(t, i*$segTokens + 1, i*$segTokens + $segTokens)) AS ntok
       |  FROM ex),
       |fp AS (SELECT doc_id, i, seg, ntok, md5(seg) AS f FROM sg),
       |hot AS (SELECT f FROM (
       |    SELECT f, count(DISTINCT doc_id) AS df FROM fp GROUP BY 1)
       |  WHERE df >= $minDf),
       |kd AS (SELECT doc_id, i, seg, ntok,
       |    CASE WHEN f IN (SELECT f FROM hot) THEN 1 ELSE 0 END AS h
       |  FROM fp)
       |SELECT doc_id,
       |  count(*) AS n_segs,
       |  CAST(sum(h) AS BIGINT) AS n_dup_segs,
       |  CAST(coalesce(sum(CASE WHEN h = 1 THEN ntok END), 0) AS BIGINT)
       |    AS tokens_removed,
       |  coalesce(string_agg(CASE WHEN h = 0 THEN seg END, ' ' ORDER BY i), '')
       |    AS cleaned
       |FROM kd $where
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ffill-then-bfill of one column by ts_min (mirrors Fill.ffillBfill).
  private def fillSql(c: String) =
    s"""round(coalesce(
       |  last_value("$c" IGNORE NULLS) OVER (ORDER BY ts_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |  first_value("$c" IGNORE NULLS) OVER (ORDER BY ts_min ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS "$c"""".stripMargin

  // ==========================================================================
  // Query registry
  // ==========================================================================

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- alignment / ingest family (J1, J2, W3, P4, P6, S2-ish) ---

    "q_pivot_outer_j1" -> ((s, d) =>
      minuteWide(s, d).orderBy("ts_min")),

    // 10-minute grain (not per-minute): at per-minute grain no bucket has all
    // 5 event types at sf<=0.1, so the inner-align intersection — and hence
    // the oracle — would verify the empty set. 10 minutes keeps the operator
    // (pivotAlignInner) and makes the intersection non-empty at sf0.01+.
    "q_pivot_inner_j2" -> ((s, d) =>
      Align.pivotAlignInner(tenMinLong(s, d), "ts_bkt", "event_type", "v",
        Types, agg = Some(avg)).orderBy("ts_bkt")),

    "q_pivot_keepfirst_j1" -> ((s, d) =>
      Align.pivotAlignOuter(Tables.events(s, d), "ts_us", "event_type",
        "value", Types, tiebreakCol = "event_id").orderBy("ts_us")),

    "q_totalize_p6" -> ((s, d) =>
      Align.totalize(minuteWide(s, d), Types :+ "refund").orderBy("ts_min")),

    "q_dedup_keepfirst_w3" -> ((s, d) =>
      Windows.dedupKeepFirst(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq("ts_us", "event_id"))
        .select("event_id", "user_id", "event_type", "ts_us", "value")
        .orderBy("user_id", "event_type")),

    "q_calendar_p4" -> ((s, d) =>
      graft.ingest.PromIngest.withCalendar(Tables.events(s, d), "ts")
        .select("event_id", "ts_us", "day_of_week", "hour_of_day")
        .orderBy("event_id")),

    "q_json_s2" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))
        .orderBy("event_id")),

    "q_cast_coerce_p2" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          // try_cast = pandas to_numeric(errors='coerce'): bad → null.
          // (plain cast throws under Spark 4's default ANSI mode)
          when(col("event_id") % 10 === 0, lit("bad"))
            .otherwise(col("value").cast("string")).try_cast("double").as("coerced"))
        .orderBy("event_id")),

    "q_epoch_ts_p3" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          timestamp_seconds(expr("ts_us div 1000000"))
            .cast("timestamp_ntz").as("ts_sec"))
        .orderBy("event_id")),

    // --- fills (A1, A2, W1, A5) ---

    "q_fill_mean_a1" -> ((s, d) => {
      val filled = Fill.fillMean(minuteWide(s, d), Types)
      filled.select(col("ts_min") +: Types.map(c => round(col(c), 6).as(c)): _*)
        .orderBy("ts_min")
    }),

    "q_fill_median_a2" -> ((s, d) => {
      val filled = Fill.fillMedian(minuteWide(s, d), Types)
      filled.select(col("ts_min") +: Types.map(c => round(col(c), 6).as(c)): _*)
        .orderBy("ts_min")
    }),

    "q_ffill_bfill_w1" -> ((s, d) => {
      val filled = Fill.ffillBfill(minuteWide(s, d), "ts_min", Types)
      filled.select(col("ts_min") +: Types.map(c => round(col(c), 6).as(c)): _*)
        .orderBy("ts_min")
    }),

    "q_ffill_bucketed_w1" -> ((s, d) => {
      // W1 for ONE long series at 100 TB: range-bucketed fill with
      // boundary-value carry — no global window anywhere in the plan
      // (PlanGuard's allow-list is NOT extended for this query). Same
      // result, and the same oracle SQL, as the global q_ffill_bfill_w1.
      val filled = Fill.ffillBfillBucketed(minuteWide(s, d), "ts_min", Types)
      filled.select(col("ts_min") +: Types.map(c => round(col(c), 6).as(c)): _*)
        .orderBy("ts_min")
    }),

    "q_ffill_partitioned_w1" -> ((s, d) =>
      // The 100TB-shape fill: one analytic window PER SERIES (partitionBy
      // event_type) instead of a global single-task window. Nulls come from
      // the full minute×type grid (absent series-minutes). Same helper the
      // flagship runs — this query is its oracle.
      Fill.ffillBfillPerSeries(minuteLong(s, d), "ts_min", "event_type", "v", Types)
        .select(col("ts_min"), col("event_type"), round(col("v"), 6).as("v"))
        .orderBy("ts_min", "event_type")),

    "q_nan_report_a5" -> ((s, d) => {
      val w = minuteWide(s, d)
      w.agg(count(lit(1)).as("n_rows"),
        Types.map(c =>
          sum(col(c).isNull.cast("long")).as(s"${c}_nulls")): _*)
    }),

    // --- scalers (A3, A4, M5) ---

    "q_scale_minmax_a3" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic data, so
      // the ORDER BY covers every output column for a deterministic row set.
      Scalers.fitMinMax(li, cols).transform(li)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    }),

    "q_scale_standard_a4" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_quantity", "l_extendedprice")
      val t = Scalers.fitStandard(li, cols).transform(li)
      t.select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("l_quantity"),
          round(col("l_extendedprice"), 6).as("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    "q_scale_robust" -> ((s, d) => {
      // sklearn RobustScaler parity: (x - median) / IQR, exact quantiles
      // (interpolation matches numpy's default on both engines).
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_quantity", "l_extendedprice")
      val t = Scalers.fitRobust(li, cols).transform(li)
      t.select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("l_quantity"),
          round(col("l_extendedprice"), 6).as("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
    }),

    "q_winsorize" -> ((s, d) =>
      // Per-group tail clipping to the [p05, p95] exact quantiles —
      // two doubles per group broadcast back, no fact-table shuffle.
      Scalers.winsorize(
          Tables.events(s, d).select("event_type", "event_id", "value"),
          Seq("event_type"), "value", pLo = 0.05, pHi = 0.95)
        .select(col("event_type"), col("event_id"),
          round(col("value"), 6).as("value"))
        .orderBy("event_id")),

    "q_scale_inverse_m5" -> ((s, d) => {
      // M5's other direction: inverse(transform(x)) ≡ x — the oracle is
      // simply the rounded original columns, so any drift in either the
      // forward or the inverse affine breaks the hash.
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_quantity", "l_extendedprice")
      val sc = Scalers.fitMinMax(li, cols)
      sc.inverse(sc.transform(li))
        .select(col("l_orderkey") +: col("l_linenumber") +:
          cols.map(c => round(col(c), 6).as(c)): _*)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    "q_scale_transform_m5" -> ((s, d) => {
      // M5: params FROZEN on a subset (orders before 1999), applied to all.
      val li = Tables.lineitem(s, d)
      val fitOn = li.filter(col("l_shipdate") < lit("1999-01-01"))
      Scalers.fitMinMax(fitOn, Seq("l_quantity")).transform(li)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // --- windows (W2 global + partitioned, W5, W6, W7) ---

    "q_window_w2" -> ((s, d) =>
      Windows.slidingWindows(clickSeries(s, d), Seq("ts_min"), Seq("v"), L)
        .select(col("window_id").cast("long").as("window_id"),
          posexplode(col("window")).as(Seq("pos", "row")))
        .select(col("window_id"), col("pos"), col("row.v").as("v"))
        .orderBy("window_id", "pos")),

    "q_window_w2_partitioned" -> ((s, d) =>
      // Same result as q_window_w2, produced by the 100TB-safe
      // boundary-replicated bucketed plan (bucketSize 64 forces many buckets
      // even at sf0.01, so the overlap path is genuinely exercised).
      Windows.slidingWindowsPartitioned(clickSeries(s, d), Seq("ts_min"),
          Seq("v"), L, bucketSize = 64)
        .select(col("window_id").cast("long").as("window_id"),
          posexplode(col("window")).as(Seq("pos", "row")))
        .select(col("window_id"), col("pos"), col("row.v").as("v"))
        .orderBy("window_id", "pos")),

    "q_tail_w5" -> ((s, d) =>
      Windows.tail(Tables.events(s, d), Seq("ts_us", "event_id"), L)
        .select("event_id", "ts_us", "value")),

    "q_stepalign_w6" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(Windows.stepAlign(col("ts_us"), 120000000L).as("step_us"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("step_us")),

    // --- scoring (A6, A7, A8, A9, A10, P8, F3, F4) ---

    "q_window_mse_a6" -> ((s, d) => {
      // MSE of each sliding window against its own mean-value "reconstruction"
      // (a deterministic X̂ the oracle can mirror) = var_pop per window.
      // Cross-engine exactness: v is 6-dp-rounded, so vi = round(v·1e6) is an
      // EXACT integer; the integer sums Σvi and Σvi² are order-independent
      // and identical in both engines, and the final float formula
      // (n·avg identity) runs the same IEEE ops on identical inputs —
      // bit-equal results. (Naively comparing against DuckDB's var_pop
      // fails: its Welford accumulation differs from a two-pass mean by
      // ~1e-9 relative, which crosses 1e-6 rounding boundaries at
      // mse ≈ 1e3.)
      // Quantization scale 1e4 (not 1e6): Σvi² over L=20 must stay inside
      // Long — at 1e4 the overflow threshold is |v| ≈ 6.8e7 (vs ≈679 at
      // 1e6, only 1.3× above this data's observed max).
      val wins = Windows.slidingWindows(clickSeries(s, d), Seq("ts_min"), Seq("v"), L)
      val vi = (r: Column) => round(r.getField("v") * 1e4).cast("long")
      val s1 = aggregate(col("window"), lit(0L), (acc, r) => acc + vi(r))
      val s2 = aggregate(col("window"), lit(0L), (acc, r) => acc + vi(r) * vi(r))
      val mse = (s2.cast("double") -
        s1.cast("double") * s1.cast("double") / lit(L.toDouble)) /
        lit(L.toDouble) / lit(1e8)
      // NO final round: the value is already bit-identical cross-engine
      // (identical integer inputs, identical float ops) — and rounding
      // would REINTRODUCE mismatches, because these fixed-point values land
      // on exact decimal halves where Spark's BigDecimal HALF_UP and
      // DuckDB's multiply-then-std::round disagree.
      wins.select(col("window_id").cast("long").as("window_id"), mse.as("mse"))
        .orderBy("window_id")
    }),

    "q_window_mse_a6_partitioned" -> ((s, d) => {
      // The A6 MSE over the 100TB-safe bucketed window plan (boundary-
      // replicated buckets, no single-partition WindowExec) — proves the
      // bit-exact fixed-point scheme survives the partitioned execution.
      // bucketSize 64 forces many buckets even at sf0.01.
      val wins = Windows.slidingWindowsPartitioned(clickSeries(s, d),
        Seq("ts_min"), Seq("v"), L, bucketSize = 64)
      val vi = (r: Column) => round(r.getField("v") * 1e4).cast("long")
      val s1 = aggregate(col("window"), lit(0L), (acc, r) => acc + vi(r))
      val s2 = aggregate(col("window"), lit(0L), (acc, r) => acc + vi(r) * vi(r))
      val mse = (s2.cast("double") -
        s1.cast("double") * s1.cast("double") / lit(L.toDouble)) /
        lit(L.toDouble) / lit(1e8)
      wins.select(col("window_id").cast("long").as("window_id"), mse.as("mse"))
        .orderBy("window_id")
    }),

    "q_per_feature_mse_a8" -> ((s, d) => {
      // Per-feature MSE vs the feature's own mean (deterministic X̂).
      val long = minuteLong(s, d)
      val withMean = long.withColumn("xhat",
        avg(col("v")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")))
      Score.perFeatureMse(withMean, "event_type", "v", "xhat")
        .select(col("event_type"), round(col("feature_mse"), 6).as("feature_mse"))
        .orderBy("event_type")
    }),

    "q_hist_a7" -> ((s, d) =>
      Score.histogram(Tables.events(s, d), "value", 50)
        .orderBy("bucket")),

    "q_hist_quantile" -> ((s, d) => {
      // PromQL histogram_quantile over the A7 histogram: interpolated
      // p50/p90/p99 from bucket counts — the quantile read that works on
      // pre-aggregated data (exact percentile needs raw values).
      val ev = Tables.events(s, d)
      val r = ev.agg(min(col("value")).cast("double"),
        max(col("value")).cast("double")).head()
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      // bounds computed once and shared with the bucketing (histogramWith)
      Score.histogramQuantile(Score.histogramWith(ev, "value", lo, hi, 50),
          lo, hi, 50, Seq(0.5, 0.9, 0.99))
        .orderBy("q")
    }),

    "q_threshold_p8" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("value"),
          Score.classify(col("value"), 150.0).as("is_anomaly"))
        .orderBy("event_id")),

    "q_anomaly_stats_a9" -> ((s, d) =>
      Score.anomalyStats(Tables.events(s, d), "value", 150.0)
        .orderBy("is_anomaly")),

    "q_running_anomaly_a10" -> ((s, d) =>
      Score.runningAnomalyCount(Tables.events(s, d),
          Seq("ts_us", "event_id"), "value", 150.0)
        .select("event_id", "anomaly_total")
        .orderBy("event_id")),

    "q_running_anomaly_a10_partitioned" -> ((s, d) =>
      // Same prefix sum, produced by the 100TB-safe plan: range-partition +
      // per-partition prefix sums + broadcast cumulative offsets — no
      // single-partition WindowExec anywhere.
      Score.runningAnomalyCountPartitioned(Tables.events(s, d),
          Seq("ts_us", "event_id"), "value", 150.0)
        .select("event_id", "anomaly_total")
        .orderBy("event_id")),

    "q_detect_quality" -> ((s, d) =>
      // End-to-end behavioral detection QUALITY (round-10 verdict item 5):
      // deterministic spikes planted in the events-derived series, scored
      // by the FROZEN TRAINED LSTM artifact; the oracle replays the
      // series/window/ground-truth arithmetic and asserts PERFECT
      // detection — recall = precision = 1.0 — so any model or scoring
      // regression fails the hash compare. See graft.model.DetectQuality.
      graft.model.DetectQuality.qualityReport(s, d)),

    // --- set ops (U1/U2) ---

    "q_union_u1" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_id") % 2 === 0)
      val b = ev.filter(col("event_id") % 2 === 1)
      a.unionByName(b)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_v"))
        .orderBy("event_type")
    }),

    // --- relational workhorses on TPC-H-ish tables ---

    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_join_broadcast" -> ((s, d) =>
      // Star join: fact orders against broadcast dims (customer→nation→region)
      // — the dims are broadcast explicitly, so the plan has zero shuffles of
      // the fact side beyond the final groupBy.
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("cnt"))
        .orderBy("r_name", "n_name")),

    "q_join_shuffle" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")),

    "q_salted_agg" -> ((s, d) =>
      // Skew-safe two-stage aggregation — must equal the plain groupBy
      // (the oracle IS the unsalted form), demonstrating hot-key salting
      // without changing results.
      graft.operators.Skew.saltedAggregate(Tables.events(s, d),
          Seq("event_type"),
          Map("cnt" -> ("value", "count"), "min_v" -> ("value", "min"),
            "max_v" -> ("value", "max"), "sum_v" -> ("value", "sum")),
          saltFactor = 8)
        .select(col("event_type"), col("cnt"), col("min_v"), col("max_v"),
          round(col("sum_v"), 4).as("sum_v"))
        .orderBy("event_type")),

    "q_join_skewed" -> ((s, d) => {
      // Deliberately skewed join, statically salted: ~90% of lineitem rows
      // are remapped onto ONE hot order key (the minimum — a bounded
      // one-row lookup), then joined to orders via Skew.saltedJoin, which
      // spreads the hot key over 16 salt sub-keys instead of one sort-merge
      // task. merge hint keeps the dim off the broadcast path so the query
      // exercises the actual skewed-shuffle shape it mitigates. The result
      // is salt-invariant (SkewSpec asserts equality with the unsalted
      // join; AqeSkewSpec demonstrates the AQE runtime alternative).
      val orders = Tables.orders(s, d)
      val hot = orders.agg(min(col("o_orderkey")).cast("long"))
        .collect()(0).getLong(0) // driver-sized by construction: one row
      val fact = Tables.lineitem(s, d)
        .withColumn("jk",
          when(pmod(col("l_suppkey"), lit(10)) < 9, lit(hot))
            .otherwise(col("l_orderkey").cast("long")))
      val dim = orders
        .select(col("o_orderkey").cast("long").as("jk"),
          col("o_orderstatus"))
        .hint("merge")
      graft.operators.Skew.saltedJoin(fact, dim, Seq("jk"), saltFactor = 16)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderstatus")
    }),

    "q3_shipping" -> ((s, d) =>
      // Q3-style 3-way join with a pushed filter: market segment revenue
      // for recent orders. Filter reaches the orders scan; dims broadcast.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("1999-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")),

    "q5_local_supplier" -> ((s, d) =>
      // TPC-H Q5 shape: customer-orders-lineitem-supplier joined where the
      // customer and supplier share a nation, rolled up to nation revenue.
      // The two fact tables shuffle-join on l_orderkey / keys; every dim
      // (customer, supplier, nation, region) broadcasts — the fact side
      // never shuffles for a dimension.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1998-01-01") &&
              col("o_orderdate") < lit("1999-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        // Exact-cent revenue: prices are integer cents and discounts integer
        // percents (verified ≤1e-9 off), so Σ cents·(100−disc%) is an
        // order-independent integer — bit-identical cross-engine with NO
        // final round (a rounded float sum here landed a group on a 2-dp
        // half boundary where the engines' round modes disagree).
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("n_name")),

    "q6_forecast_revenue" -> ((s, d) =>
      // TPC-H Q6 shape: tight scan-side conjunctive filter + single global
      // aggregate. All three predicates reach the parquet scan as
      // PushedFilters; the post-scan plan is one partial+final agg pair.
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01") &&
          col("l_shipdate") < lit("1999-01-01") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        // exact-cent integer sum, as q5: order-independent and boundary-free
        // (a rounded float sum can land on a 2-dp half where engines differ)
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 100).cast("long"))
            .cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("cnt"))),

    "q_rank_in_group" -> ((s, d) =>
      // Grouped top-k via ranked window — partitioned by the group key, so
      // the plan is a hash-partitioned WindowExec (never single-task).
      // ORDER BY covers all outputs: o_totalprice ties are real.
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rk")),

    "q_asof_join" -> ((s, d) => {
      // As-of join: every view event picks up the latest click-minute
      // average at or before its timestamp within its user shard — two
      // series on different clocks aligned in ONE keyed shuffle (union +
      // partitioned window), no range explosion. DuckDB's native ASOF
      // LEFT JOIN is the independent oracle.
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), pmod(col("user_id"), lit(16)).as("bucket"),
          col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(pmod(col("user_id"), lit(16)).as("bucket"),
          expr("(ts_us div 60000000) * 60000000").as("rts"))
        .agg(round(avg("value"), 6).as("v_click"))
      graft.operators.Asof.joinAsOf(views, clicks, Seq("bucket"),
          "ts_us", "rts", Seq("v_click"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, d) => {
      // direction="forward" as-of (pandas merge_asof parity): every view
      // picks up the EARLIEST click-minute average at or after its
      // timestamp — the negated-timestamp trick reuses the identical
      // single-shuffle union-window plan. DuckDB's native forward ASOF
      // (r.rts >= l.ts) is the independent oracle.
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), pmod(col("user_id"), lit(16)).as("bucket"),
          col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(pmod(col("user_id"), lit(16)).as("bucket"),
          expr("(ts_us div 60000000) * 60000000").as("rts"))
        .agg(round(avg("value"), 6).as("v_click"))
      graft.operators.Asof.joinAsOf(views, clicks, Seq("bucket"),
          "ts_us", "rts", Seq("v_click"), direction = "forward")
        .orderBy("event_id")
    }),

    "q_asof_tolerance" -> ((s, d) => {
      // Backward as-of with a 5-minute tolerance: a match farther than the
      // bound keeps the left row with a NULL payload (pandas tolerance
      // semantics). The oracle replays the bound as a CASE over DuckDB's
      // native ASOF match.
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), pmod(col("user_id"), lit(16)).as("bucket"),
          col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(pmod(col("user_id"), lit(16)).as("bucket"),
          expr("(ts_us div 60000000) * 60000000").as("rts"))
        .agg(round(avg("value"), 6).as("v_click"))
      graft.operators.Asof.joinAsOf(views, clicks, Seq("bucket"),
          "ts_us", "rts", Seq("v_click"),
          tolerance = Some(300000000L))
        .orderBy("event_id")
    }),

    "q_range_join" -> ((s, d) => {
      // Interval containment via the bucketed equi-join (never a
      // nested-loop): 30-minute windows opened by purchases, error events
      // as points; every qualifying pair meets in exactly one bucket.
      // min/max instead of sum keeps the aggregate order-independent
      // (float-sum order differs cross-engine).
      val ev = Tables.events(s, d)
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("ts_us").as("win_start"),
          (col("ts_us") + lit(1800000000L)).as("win_end"))
      val points = ev.filter(col("event_type") === "error")
        .select(col("ts_us").as("err_ts"), col("value").as("err_v"))
      graft.operators.RangeJoin.joinRange(points, intervals,
          "err_ts", "win_start", "win_end", bucketWidth = 1800000000L)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_errors"),
          round(min("err_v"), 6).as("min_v"),
          round(max("err_v"), 6).as("max_v"))
        .orderBy("win_id")
    }),

    "q_interval_join" -> ((s, d) => {
      // Batch-auditable twin of the stream-stream interval join: each
      // purchase pairs with the same user's clicks within ±10 minutes,
      // through StreamingJoins.intervalJoinBatch — the IDENTICAL predicate
      // the watermarked streaming join evaluates (shared condition
      // builder), planned as a user-keyed equi-join with the range refine
      // in the condition. delta_us rides on the cross-engine-stable µs
      // longs; the predicate itself runs on the µs-derived timestamps.
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("ts_us").as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"), col("ts_us").as("c_us"))
      graft.streaming.StreamingJoins.intervalJoinBatch(p, c,
          "p_user", "c_user", "p_ts", "c_ts",
          beforeSec = 600, afterSec = 600)
        .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
          (col("c_us") - col("p_us")).as("delta_us"))
        .orderBy("p_id", "c_id")
    }),

    "q_sketch_bounds" -> ((s, d) => {
      // The approximate aggregates a 100 TB user reaches for first —
      // HLL++ distinct counts (approx_count_distinct) and the quantile
      // sketch (percentile_approx) — certified against their exact twins
      // INSIDE the query. Sketch values aren't cross-engine replayable, so
      // the oracle-visible contract is the ERROR BOUND, emitted as 0/1
      // flags the DuckDB twin states as literal 1: a sketch drifting
      // outside its bound flips the flag and fails the round's hash
      // compare like any other wrong answer. The quantile check is the
      // ties-robust rank-window form: the count of values strictly below /
      // at-or-below the sketch's p50 must bracket N/2 within tolerance
      // (a value-distance check would break on tied or gappy data).
      val docs = Tables.documents(s, d)
      // ONE row, materialized eagerly (localCheckpoint, the one-shot
      // rule): both consumers below reference it, and without the
      // checkpoint each reference re-runs the exact-distinct + sketch
      // aggregation over the full corpus (three scans instead of one)
      val agg = docs.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("text")).as("exact_distinct"),
        approx_count_distinct(col("text"), 0.02).as("approx_distinct"),
        expr("percentile_approx(n_chars, 0.5, 10000)").as("p50_approx"))
        .localCheckpoint(true)
      val rk = docs.crossJoin(broadcast(agg.select(col("p50_approx"))))
        .agg(
          sum(when(col("n_chars") < col("p50_approx"), 1L).otherwise(0L))
            .as("rk_lt"),
          sum(when(col("n_chars") <= col("p50_approx"), 1L).otherwise(0L))
            .as("rk_le"))
      agg.crossJoin(broadcast(rk)).select(
        col("n_rows"), col("exact_distinct"),
        when(abs(col("approx_distinct") - col("exact_distinct"))
            .cast("double") / col("exact_distinct") < 0.05, 1L).otherwise(0L)
          .as("hll_ok"),
        when(col("rk_lt") <= col("n_rows").cast("double") / 2 +
            greatest(lit(2.0), col("n_rows") * lit(0.01)) &&
          col("rk_le") >= col("n_rows").cast("double") / 2 -
            greatest(lit(2.0), col("n_rows") * lit(0.01)), 1L).otherwise(0L)
          .as("p50_rank_ok"))
    }),

    "q_cms_bounds" -> ((s, d) => {
      // Count-min sketch certification (the other workhorse sketch next
      // to HLL/quantile in q_sketch_bounds): ONE distributed CMS build
      // over all corpus tokens (eps=1e-3, delta=0.01, fixed seed —
      // deterministic for fixed data), then the top-20 exact tokens are
      // probed driver-side (20 lookups against a 2000×7-counter sketch
      // — bounded by construction). Sketch counters aren't cross-engine
      // replayable, so the oracle-visible contract is the two CMS
      // guarantees as literal-1 flags riding next to the exact counts:
      // estimates never under-count, and stay within eps·N above truth
      // (3× headroom on the probabilistic bound, as in q_bloom_bounds:
      // the guarantee is per-probe 1−2^-depth, and a regenerated corpus
      // resamples the data against the fixed seed — width 2000 × depth 7
      // at eps=1e-3, δ=0.01).
      val docs = Tables.documents(s, d)
      val toks = docs.select(
        explode(graft.text.TextStats.tokens(lower(col("text")))).as("token"))
      // Checkpoint only the AGGREGATED (token, count) table — O(vocab), not
      // O(corpus tokens) — and derive both the top-20 and N from it; the
      // sketch re-derives the explode, which is scan-cheap and streamed
      // straight into the CMS without materialization.
      val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val top = counts.orderBy(col("c").desc, col("token")).limit(20).collect()
      val n = counts.agg(coalesce(sum("c"), lit(0L))).collect()(0).getLong(0)
      val cms = toks.stat.countMinSketch("token", 0.001, 0.99, 42)
      val bound = 3L * math.ceil(0.001 * n).toLong
      val rows = top.toSeq.map { r =>
        val t = r.getString(0); val c = r.getLong(1)
        val est = cms.estimateCount(t)
        (t, c, if (est >= c) 1L else 0L,
          if (est <= c + bound) 1L else 0L)
      }
      import s.implicits._
      rows.toDF("token", "c_exact", "ge_ok", "eps_ok").orderBy("token")
    }),

    "q_bloom_bounds" -> ((s, d) => {
      // Bloom-filter certification (the pre-join filter the oversized-
      // benchmark contamination tier rides on): membership must have NO
      // false negatives, and the false-positive rate on a provably
      // DISJOINT probe set (odd-doc fingerprints anti-joined against the
      // member set, so cross-parity duplicate texts can't masquerade as
      // false positives) stays within 3× the configured 1% fpp —
      // deterministic for fixed data, with headroom so the flag is
      // stable across SFs. Driver work is three bounded counts.
      val docs = Tables.documents(s, d)
      val fps = docs.select(col("doc_id"),
        graft.text.TextStats.fingerprintMd5(col("text")).as("f"))
      val members = fps.filter(col("doc_id") % 2 === 0)
        .select("f").distinct().localCheckpoint(true)
      val probes = fps.filter(col("doc_id") % 2 === 1)
        .select("f").distinct()
        .join(members, Seq("f"), "left_anti").localCheckpoint(true)
      val nm = members.count()
      val bloom = members.stat.bloomFilter("f", math.max(1024L, nm), 0.01)
      val bc = s.sparkContext.broadcast(bloom)
      val hit = udf((x: String) => x != null && bc.value.mightContainString(x))
      val falseNeg = members.filter(!hit(col("f"))).count()
      val nProbes = probes.count()
      val falsePos = probes.filter(hit(col("f"))).count()
      import s.implicits._
      Seq((nm, nProbes,
        if (falseNeg == 0L) 1L else 0L,
        // 3× the 1% fpp PLUS an absolute +3 slack: at small probe counts
        // (tiny SFs, unlucky regenerated corpus) a single false positive
        // would otherwise flip the flag when nProbes < 34.
        if (falsePos.toDouble <= 0.03 * nProbes + 3) 1L else 0L))
        .toDF("n_members", "n_probes", "no_false_neg", "fp_ok")
    }),

    "q_semi_anti" -> ((s, d) => {
      // LEFT SEMI / LEFT ANTI surface: customers with vs without 1998+
      // orders. Semi/anti joins never duplicate or widen the left side —
      // the planner's existence-join fast path (no row explosion on
      // many-order customers, unlike inner-join-then-distinct).
      val c = Tables.customer(s, d)
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-01-01"))
      val semi = c.join(recent, col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select(lit("with_order").as("grp"), col("c_acctbal"))
      val anti = c.join(recent, col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(lit("no_order").as("grp"), col("c_acctbal"))
      semi.unionByName(anti)
        .groupBy("grp")
        .agg(count(lit(1)).as("cnt"),
          // exact-cent mean: integer sum -> two deterministic double ops
          // (a float avg would be accumulation-order-dependent)
          round(sum(expr("cast(round(c_acctbal * 100) as long)"))
            .cast("double") / 100.0 / count(lit(1)), 4).as("avg_bal"))
        .orderBy("grp")
    }),

    "q_cube" -> ((s, d) =>
      // Full grouping-sets lattice: all four (flag, status) subtotal
      // levels in one Expand + aggregate pass.
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy(coalesce(col("l_returnflag"), lit("~")),
          coalesce(col("l_linestatus"), lit("~")))),

    "q_percent_rank" -> ((s, d) => {
      // Rank-family windows: percent_rank + cume_dist + dense_rank per
      // priority group over order totals — deterministic because the
      // functions depend only on the ORDER BY key values, not tie order.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy("o_totalprice")
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          dense_rank().over(w).cast("long").as("drank"))
        .orderBy("o_orderkey")
    }),

    "q_rollup" -> ((s, d) =>
      // Grouping-sets surface: ROLLUP subtotals + grand total in one pass
      // (Catalyst expands to a single Expand + aggregate — no N scans).
      // '~' sorts after every flag/status value, so subtotal NULL rows
      // order identically cross-engine without NULLS FIRST/LAST gymnastics.
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy(coalesce(col("l_returnflag"), lit("~")),
          coalesce(col("l_linestatus"), lit("~")))),

    "q_moving_range" -> ((s, d) => {
      // RANGE-frame moving aggregate: trailing 10-minute event count and
      // integer value sum per type — the time-window form ROWS frames
      // can't express (ties at one timestamp all join the frame, so the
      // result is deterministic under any tie order).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("ts_us"))
        .rangeBetween(-600000000L, 0L)
      Tables.events(s, d)
        .select(col("event_type"), col("ts_us"), col("event_id"),
          expr("cast(round(value * 1000) as long)").as("v"))
        .withColumn("cnt_10m", count(lit(1)).over(w))
        .withColumn("sum_10m", sum("v").over(w))
        .select("event_type", "ts_us", "event_id", "cnt_10m", "sum_10m")
        .orderBy("event_id")
    }),

    "q_setops" -> ((s, d) => {
      // INTERSECT / EXCEPT set semantics over (lang, source) profiles of
      // the even- vs odd-id halves of the corpus; per-op counts always
      // emit (0 included) so the shape is stable.
      val docs = Tables.documents(s, d)
      val e = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select("lang", "source")
      val o = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select("lang", "source")
      def cnt(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.agg(count(lit(1)).as("cnt")).select(lit(tag).as("op"), col("cnt"))
      cnt(e.intersect(o), "intersect")
        .unionByName(cnt(e.except(o), "except_even"))
        .unionByName(cnt(o.except(e), "except_odd"))
        .orderBy("op")
    }),

    "q_counter_rate" -> ((s, d) => {
      // Prometheus-semantics counter increase/rate with RESET handling (the
      // monotonic-counter rule: a drop means the counter restarted, so the
      // post-reset value is the increase). The fixture counter is a running
      // integer sum folded mod 1e5 — deterministic resets both engines
      // replay exactly. One keyed window + one keyed aggregate.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us", "event_id")
      val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window.currentRow)
      milliEvents(s, d)
        .withColumn("ctr", pmod(sum("v").over(wRun), lit(100000L)))
        .withColumn("prev", lag("ctr", 1).over(w))
        .withColumn("inc", when(col("prev").isNull, lit(0L))
          .when(col("ctr") < col("prev"), col("ctr"))
          .otherwise(col("ctr") - col("prev")))
        .groupBy("event_type")
        .agg(sum("inc").as("increase"),
          (max("ts_us") - min("ts_us")).as("span_us"),
          round(sum("inc") * lit(1000000.0) / (max("ts_us") - min("ts_us")), 6)
            .as("rate_per_sec"))
        .orderBy("event_type")
    }),

    "q_over_time" -> ((s, d) =>
      // PromQL *_over_time family: trailing 15-minute RANGE frame per
      // series key — count/sum/avg/stddev/min/max from exact integer frame
      // sums (Rates.overTime's determinism contract). One keyed window.
      graft.operators.Rates.overTime(milliEvents(s, d), Seq("event_type"),
          "ts_us", "v", rangeUs = 900000000L)
        .select("event_type", "ts_us", "event_id", "cnt_ot", "sum_ot",
          "avg_ot", "std_ot", "min_ot", "max_ot")
        .orderBy("event_id")),

    "q_zscore" -> ((s, d) =>
      // Rolling z-score anomaly detection — the classic PromQL recipe
      // ((v - avg_over_time) / stddev_over_time, flag |z| > 3) and the
      // statistical sibling of the reference's MSE-threshold detector
      // (realtime_detector.py thresholds a reconstruction error the same
      // way). Composes Rates.overTime (30-min trailing frame, exact
      // integer sums); z is one fixed double expression over the
      // 6-dp-rounded avg_ot/std_ot, identical text both engines. One
      // keyed window — single shuffle.
      graft.operators.Rates.overTime(milliEvents(s, d), Seq("event_type"),
          "ts_us", "v", rangeUs = 1800000000L)
        .selectExpr("event_type", "ts_us", "event_id", "v", "cnt_ot",
          "CASE WHEN cnt_ot < 2 OR std_ot = 0.0 THEN NULL " +
            "ELSE round((CAST(v AS DOUBLE) / 1000.0 - avg_ot) / std_ot, 6) " +
            "END AS z")
        .selectExpr("event_type", "ts_us", "event_id", "v", "cnt_ot", "z",
          "CASE WHEN z IS NULL THEN CAST(0 AS BIGINT) " +
            "WHEN abs(z) > 3.0 THEN CAST(1 AS BIGINT) " +
            "ELSE CAST(0 AS BIGINT) END AS anom")
        .orderBy("event_id")),

    "q_group_mad" -> ((s, d) => {
      // Per-(series, day) median absolute deviation — the robust spread
      // estimate behind RobustScaler-style anomaly scoring (outliers move
      // MAD far less than they move stddev). Two keyed aggregates over the
      // same (event_type, day) key plus a broadcast of the tiny per-group
      // median table back onto the scan; Spark `percentile` ≡ DuckDB
      // `quantile_cont` interpolation, so both medians are hash-exact.
      val day = milliEvents(s, d)
        .withColumn("day_bkt", expr("ts_us div 86400000000"))
        .select("event_type", "day_bkt", "v")
      // graft_percentile = bit-identical primitive-buffer kernel
      // (ExactPercentileSpec; guide §4 — the built-in's boxed update path)
      import graft.expressions.ExactPercentiles.pctl
      import org.apache.spark.sql.types.DoubleType
      val med = day.groupBy("event_type", "day_bkt")
        .agg(pctl(day, col("v"), lit(0.5), day.schema("v").dataType).as("med"),
          count(lit(1)).as("n"))
      day.join(broadcast(med), Seq("event_type", "day_bkt"))
        .withColumn("adev", expr("abs(CAST(v AS DOUBLE) - med)"))
        .groupBy("event_type", "day_bkt")
        .agg(max("n").as("n"),
          round(max("med") / 1000.0, 6).as("med"),
          round(pctl(day, col("adev"), lit(0.5), DoubleType) / 1000.0, 6)
            .as("mad"))
        .orderBy("event_type", "day_bkt")
    }),

    "q_count_values" -> ((s, d) =>
      // PromQL count_values(): the value distribution as a label — how
      // many samples of each deci-rounded value per series. One keyed
      // aggregate; cardinality is bounded by the value range, not the
      // sample count, so the result stays small at any corpus size.
      Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("cast(round(value * 10) as long)").as("vd"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type", "vd")),

    "q_shard_assign" -> ((s, d) =>
      // Deterministic training-shard layout: every doc gets a (shard, pos)
      // slot as a pure function of its id (md5 basis — reproducible in
      // DuckDB), replacing orderBy(rand()) shuffles that change on every
      // run. One hash exchange + a keyed rank window (Sampling.shardAssign).
      graft.text.Sampling.shardAssign(
          Tables.documents(s, d).select("doc_id", "lang"), "doc_id", 32)
        .select("doc_id", "lang", "shard", "pos")
        .orderBy("doc_id")),

    "q_deriv_predict" -> ((s, d) =>
      // PromQL deriv() + predict_linear(): per-series least-squares slope
      // (per hour, for 6-dp signal) and the extrapolated value 1 h past the
      // last sample — textbook sums over exact integers, identical final
      // double expression both engines (Rates.derivPredict).
      graft.operators.Rates.derivPredict(milliEvents(s, d),
          Seq("event_type"), "ts_us", "v", horizonSec = 3600L)
        .orderBy("event_type")),

    "q_resets_changes" -> ((s, d) => {
      // PromQL resets() + changes() over the same deterministic mod-1e5
      // counter fixture as q_counter_rate: counter drops and value changes
      // per series, integer-exact.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val ctr = milliEvents(s, d)
        .withColumn("ctr", pmod(sum("v").over(w), lit(100000L)))
      graft.operators.Rates.resetsChanges(ctr, Seq("event_type"),
          Seq("ts_us", "event_id"), "ctr")
        .orderBy("event_type")
    }),

    "q_rate_window" -> ((s, d) => {
      // The true PromQL rate(v[15m]) shape (reference config.yaml:17):
      // reset-aware increase over a trailing RANGE frame + per-second
      // rate over the frame's actual sample span, at every sample.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val ctr = milliEvents(s, d)
        .withColumn("ctr", pmod(sum("v").over(w), lit(100000L)))
        .drop("v")
      graft.operators.Rates.rateWindow(ctr, Seq("event_type"), "ts_us",
          "ctr", tieCol = "event_id", rangeUs = 900000000L)
        .orderBy("event_id")
    }),

    "q_delta_irate" -> ((s, d) =>
      // PromQL delta()/idelta()/irate(): gauge endpoints per series — last
      // minus first, last minus penultimate, and the last-two-samples
      // per-second rate. One keyed window + one keyed aggregate.
      graft.operators.Rates.deltaIrate(milliEvents(s, d), Seq("event_type"),
          "ts_us", "v", tieCol = "event_id")
        .orderBy("event_type")),

    "q_ewma" -> ((s, d) =>
      // EWMA smoothing (holt_winters' smoothing half / pandas ewm
      // adjust=True) in the bounded-lag closed form: alpha=0.3, k=40 lags
      // (dropped tail weight 0.7^40 ~ 6e-7, below the 6-dp floor).
      // Since round 19 the plan is Rates.ewmaSliding — the q_quantile_ot
      // promotion pattern: same keyed exchange + in-partition sort the
      // WindowExec plan paid, then ONE mapPartitions ring pass instead of
      // 40 interpreted lag reads per row. Bit-parity with Rates.ewma
      // (identical fold order, engine-evaluated division/round) is
      // spec-pinned in RatesSpec; weight literals still shared with the
      // oracle text via Rates.ewmaWeights.
      graft.operators.Rates.ewmaSliding(milliEvents(s, d), Seq("event_type"),
          Seq("ts_us", "event_id"), "v", alpha = EwmaAlpha, k = EwmaK)
        .select("event_type", "ts_us", "event_id", "v", "ewma_val")
        .orderBy("event_id")),

    "q_holt_winters" -> ((s, d) =>
      // PromQL holt_winters (level+trend smoothing), the Prometheus
      // recurrence exactly, as a single-shuffle streaming fold — the
      // scalable per-key-recurrence shape (Rates.holtWinters). Hourly
      // grain: the DuckDB oracle replays the recurrence one rank per
      // iteration, and its recursive join cost grows with depth×rows —
      // hourly (~680 steps at sf0.01) runs the oracle in ~5 s where the
      // 10-min grain took 13 s. The bucket value v is the UNROUNDED
      // exact-integer-sum average (milli sums; one fixed double division
      // chain): a round(avg(value), 6) here hit a 6-dp midpoint at sf0.1
      // where the two engines' round() implementations split, and the
      // recurrence then cascaded the 1-ulp input difference.
      graft.operators.Rates.holtWinters(
          milliEvents(s, d)
            .groupBy(expr("ts_us div 3600000000").as("ts_bkt"),
              col("event_type"))
            .agg((sum("v").cast("double") / count(lit(1)) / 1000.0)
              .as("v")),
          "event_type", "ts_bkt", "v", sf = HwSf, tf = HwTf)
        .select(col("event_type"), col("ts_bkt"), col("v"),
          round(col("hw_level"), 6).as("hw_level"),
          round(col("hw_trend"), 6).as("hw_trend"))
        .orderBy("event_type", "ts_bkt")),

    "q_quantile_ot" -> ((s, d) => {
      // PromQL quantile_over_time: exact trailing-50-sample median per
      // series (ROWS frame over a total order; integer inputs make the
      // midpoint interpolation bit-identical cross-engine).
      // Plan (promoted round 17): Rates.quantileOverTimeSliding — one
      // keyed exchange + ONE pass with a frame-bounded order-statistics
      // ring, replacing percentile().over(rows frame) which re-sorted the
      // 50-row frame per output row (the row's 33× count-vs-noop
      // divergence). Bit-parity with the window plan is spec-pinned
      // (RatesSpec frames 1–50, p .25/.5/.9, null shapes); measured
      // 3.9× at sf0.1 / 8.9× at 10× under the noop sink
      // (bench/r16/QUANTILE_SLIDING_{sf01,ld1}_r16.json).
      graft.operators.Rates.quantileOverTimeSliding(milliEvents(s, d),
          "event_type", Seq("ts_us", "event_id"), "v",
          frameRows = 50, p = 0.5)
        .withColumn("med_ot", round(col("q_ot") / 1000.0, 6))
        .select("event_type", "ts_us", "event_id", "med_ot")
        .orderBy("event_id")
    }),

    "q_vector_ratio" -> ((s, d) => {
      // PromQL binary-op vector matching (`v / on(bkt) group_left sum`):
      // each series' share of its bucket's total. The many-to-one match
      // plans as ONE keyed aggregate + ONE bucket window — no join
      // (the PromQL semantic, the efficient plan).
      val w = org.apache.spark.sql.expressions.Window.partitionBy("bkt")
      milliEvents(s, d)
        .groupBy(expr("ts_us div 600000000").as("bkt"), col("event_type"))
        .agg(sum("v").as("sum_v"))
        .withColumn("share",
          round(col("sum_v") * lit(1.0) / sum("sum_v").over(w), 6))
        .orderBy("bkt", "event_type")
    }),

    "q_offset_compare" -> ((s, d) => {
      // PromQL offset modifier (`v - v offset 1h`): hourly per-series
      // averages self-joined on the TIME-shifted key (hour − 1) — gaps
      // yield NULL deltas, exactly PromQL's no-sample-at-offset rule
      // (a row-wise lag would silently compare across gaps).
      // UNROUNDED outputs, deliberately: every op below is a fixed IEEE
      // expression over exact integer sums, so both engines produce
      // bit-identical doubles — while round(x, 6) maps them through
      // DIFFERENT implementations (decimal-string HALF_UP vs fp multiply)
      // that split when a low-denominator quotient lands on a 6-dp
      // midpoint (observed at sf0.1: delta of exactly 0.5196875)
      val hourly = milliEvents(s, d)
        .groupBy(expr("ts_us div 3600000000").as("hr"), col("event_type"))
        .agg(sum("v").as("sv"), count(lit(1)).as("cn"))
        .withColumn("avg_v", col("sv").cast("double") / col("cn"))
      val prev = hourly.select((col("hr") + 1).as("hr"), col("event_type"),
        col("avg_v").as("prev_avg"))
      hourly.join(prev, Seq("hr", "event_type"), "left")
        .select(col("hr"), col("event_type"),
          (col("avg_v") / 1000.0).as("avg_v"),
          ((col("avg_v") - col("prev_avg")) / 1000.0).as("delta_1h"))
        .orderBy("hr", "event_type")
    }),

    "q_absent_gaps" -> ((s, d) => {
      // PromQL absent() analog: the missing-bucket RUNS inside each
      // series' own extent — distinct (series, bucket) collapse, then
      // gaps-and-islands on one keyed window (lag diff > 1 ⇒ a gap run
      // of bkt − prev − 1 buckets starting at prev + 1). Integer-exact.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("bkt")
      Tables.events(s, d)
        .select(col("event_type"), expr("ts_us div 600000000").as("bkt"))
        .distinct()
        .withColumn("prev", lag("bkt", 1).over(w))
        .filter(col("prev").isNotNull && col("bkt") - col("prev") > 1)
        .select(col("event_type"), (col("prev") + 1).as("gap_start"),
          (col("bkt") - col("prev") - 1).as("gap_len"))
        .orderBy("event_type", "gap_start")
    }),

    "q_topk_series" -> ((s, d) => {
      // PromQL topk(2, sum by (type) (...)) per 1-hour bucket: keyed
      // aggregate + rank window, deterministic tiebreak on the label.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("hour_bkt").orderBy(col("sum_v").desc,
          col("event_type"))
      milliEvents(s, d)
        .groupBy(expr("ts_us div 3600000000").as("hour_bkt"),
          col("event_type"))
        .agg(sum("v").as("sum_v"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .orderBy("hour_bkt", "rk")
    }),

    "q_label_ops" -> ((s, d) =>
      // PromQL label_replace / label_join: anchored-regex label rewrite,
      // label concatenation, and capture-group extraction — pure
      // projections (codegen'd; zero shuffle at any scale).
      Tables.events(s, d).select(col("event_id"), col("event_type"),
          regexp_replace(col("event_type"), "^(click|view)$",
            "interaction").as("kind"),
          concat_ws("/", lit("events"), col("event_type")).as("series"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).as("k_raw"))
        .orderBy("event_id")),

    "q_source_cap" -> ((s, d) => {
      // Curation per-domain cap: keep the top-3 documents per source by
      // size (quality proxy), deterministic tiebreak — the standard
      // "no domain dominates the corpus" pipeline stage.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .select("doc_id", "source", "n_chars")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("source", "rk")
    }),

    "q_sessionize" -> ((s, d) =>
      // Gap-based sessionization (30-min inactivity) per user — ONE keyed
      // window for the gaps-and-islands assignment, one keyed aggregate.
      // Boundary semantics match native session_window ([start, last+gap)),
      // asserted in SessionsSpec.
      graft.operators.Sessions.sessionize(
          Tables.events(s, d).select("user_id", "ts_us"),
          Seq("user_id"), "ts_us", gap = 1800000000L)
        .orderBy("user_id", "session_idx")),

    // --- LLM-data-pipeline: dedup / text / similarity ---

    "q_tfidf_topk" -> ((s, d) =>
      // Top-5 salient terms per document by smoothed raw-IDF TF-IDF.
      graft.text.TextStats.tfIdfTopK(Tables.documents(s, d), "doc_id",
          "text", k = 5, checkpoint = shingleCheckpoint(s, d))
        .orderBy("doc_id", "rk")),

    "q_doc_chunks" -> ((s, d) =>
      // Context-window packing: 32-token chunks every 16 tokens, tail kept.
      // Pure tokenize+explode — zero shuffle; fully deterministic.
      graft.text.TextStats.chunkTokens(Tables.documents(s, d), "doc_id",
          "text", chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_no")),

    "q_curation_pipeline" -> ((s, d) => {
      // The operators COMPOSED as one curation run — dedup (keep best
      // duplicate) → repetition gate → deterministic 50% sample → context
      // chunking → per-language chunk/token budget. One oracle checks the
      // whole chain end-to-end, not just each stage in isolation.
      val docs = Tables.documents(s, d)
      val kept = graft.dedup.Dedup.exactDedupSurvivorsByQuality(
        docs, "doc_id", "text", "n_chars")
      val fluent = graft.text.TextStats.repetitionSignals(docs, "doc_id", "text")
        .filter(col("distinct_ratio") >= 0.5).select("doc_id")
      val sampled = graft.text.Sampling.sampleByHash(
        kept.join(fluent, Seq("doc_id"), "left_semi"), "doc_id", 0.5)
      graft.text.TextStats.chunkTokens(sampled, "doc_id", "text", 32, 16)
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang")
    }),

    "q_curation_staged" -> ((s, d) => {
      // The STAGED twin of q_curation_pipeline: real curation runs
      // checkpoint between stages (dedup → quality+sample → chunk) and
      // re-read, because each stage artifact is a deliverable (audited,
      // re-consumed by several downstream jobs) and because a 100 TB DAG
      // must be resumable mid-pipeline. Each stage here WRITES parquet
      // and the next stage reads THAT — the single-plan twin shares the
      // oracle string verbatim, so Catalyst-fused and checkpointed
      // execution are proven result-identical. Stage filters are per-row
      // (dedup keeper, repetition gate, hash sample), so computing them
      // on the stage artifact equals computing them on the full corpus
      // restricted to it. Lang rides through the stages — no re-join
      // against the source at the end (the staged plan never re-reads
      // stage-0 data, the property that makes stages independently
      // schedulable).
      graft.text.Curation.stagedPipeline(s, d,
        scratchDir("graft_curation")).report
    }),

    "q_len_percentiles" -> ((s, d) => {
      // Length-distribution profile per language — the curation dashboard
      // staple. EXACT linear-interpolation percentiles (Spark `percentile`
      // ≡ DuckDB `quantile_cont`), not approx sketches, so the result is
      // oracle-checkable; ONE map-side-combinable array-percentile
      // aggregate (all three φs share a single value→count buffer) on the
      // bit-identical graft_percentile kernel (ExactPercentileSpec).
      val docs = Tables.documents(s, d)
      docs.groupBy("lang")
        .agg(graft.expressions.ExactPercentiles.pctl(docs, col("n_chars"),
          array(lit(0.5), lit(0.9), lit(0.99)),
          docs.schema("n_chars").dataType).as("_qs"))
        .select(col("lang"),
          round(element_at(col("_qs"), 1), 6).as("q50"),
          round(element_at(col("_qs"), 2), 6).as("q90"),
          round(element_at(col("_qs"), 3), 6).as("q99"))
        .orderBy("lang")
    }),

    "q_sample_hash" -> ((s, d) =>
      // Reproducible 30% corpus sample: keep iff md5-hash-bucket(id) < 300.
      // Pure scan-side filter — zero shuffle; same id ⇒ same fate across
      // runs, partitionings and engines.
      graft.text.Sampling.sampleByHash(Tables.documents(s, d), "doc_id", 0.30)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "q_sample_temperature" -> ((s, d) =>
      // α=0.5 mixture sampling: rare languages keep a higher fraction.
      // sqrt/division are correctly-rounded IEEE ops, so the per-language
      // floor threshold is bit-identical cross-engine.
      graft.text.Sampling.sampleTemperatureHalf(
          Tables.documents(s, d), "doc_id", "lang", c = 3.0)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "q_dedup_quality" -> ((s, d) =>
      // Retention policy: keep the LONGEST duplicate (not the first-seen)
      // per exact fingerprint, ties to the smallest doc_id.
      graft.dedup.Dedup.exactDedupSurvivorsByQuality(
          Tables.documents(s, d), "doc_id", "text", "n_chars")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "q_sample_stratified" -> ((s, d) =>
      // Language-rebalancing sample: downsample dominant 'en' to 10%, keep
      // 50% of every other language — deterministic per-stratum rates.
      graft.text.Sampling.sampleStratified(Tables.documents(s, d), "doc_id",
          "lang", Map("en" -> 0.10), defaultRate = 0.50)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "q_split_leakage" -> ((s, d) => {
      // Train/eval contamination check: normalized-text fingerprints that
      // appear on BOTH sides of a split. The fixture corpus has NO
      // duplicate texts, so a disjoint even/odd split would make this
      // oracle verify the empty set (the vacuous-oracle trap) — the two
      // "sources" here deliberately overlap in membership (multiples of 2
      // vs multiples of 3 ⇒ multiples of 6 leak), as real multi-source
      // corpora do, so the oracle checks a non-empty fingerprint set.
      val f = Tables.documents(s, d).select(col("doc_id"),
        graft.text.TextStats.fingerprintMd5(col("text")).as("fp"))
      graft.text.Sampling.overlap(
          f.filter(col("doc_id") % 2 === 0), f.filter(col("doc_id") % 3 === 0), "fp")
        .orderBy("fp")
    }),

    "q_dedup_exact" -> ((s, d) =>
      graft.dedup.Dedup.exactDedup(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "q_dedup_survivors" -> ((s, d) =>
      graft.dedup.Dedup.exactDedupSurvivors(Tables.documents(s, d), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    "q_segment_dedup" -> ((s, d) =>
      // Sub-document "line dedup" rewrite: 4-token segments occurring in
      // >= 2 distinct docs removed from every carrier; the oracle replays
      // the segmentation, md5 document-frequency count, and the ordered
      // surviving-segment rejoin verbatim (at sf0.01: 771 of 6974 segment
      // positions are hot — non-vacuous, far from total erasure).
      graft.dedup.Dedup.segmentDedup(Tables.documents(s, d), "doc_id", "text",
          segTokens = 4, minDf = 2)
        .orderBy("doc_id")),

    "q_segment_dedup_incremental" -> ((s, d) => {
      // Nightly-ingest segment dedup: even docs are the frozen base (its
      // per-segment df table), odd docs the arriving batch; hot iff
      // base df + batch df >= 2, only the batch is rewritten. By the
      // distinct-count additivity of disjoint id sets this equals the
      // full-corpus q_segment_dedup restricted to odd ids — which is
      // exactly what the oracle replays.
      val docs = Tables.documents(s, d)
      graft.dedup.Dedup.segmentDedupIncremental(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          segTokens = 4, minDf = 2)
        .orderBy("doc_id")
    }),

    "q_neardup_survivors" -> ((s, d) => {
      // Near-dup retention: anti-join away every non-representative
      // cluster member (same deterministic consecutive-Jaccard pair set as
      // q_neardup_clusters, so the oracle mirrors it exactly).
      val docs = Tables.documents(s, d)
      val consecutive = docs.select(col("doc_id").as("id1"),
        (col("doc_id") + 1).as("id2"))
      val pairs = graft.dedup.Dedup.jaccardVerify(consecutive, docs,
        "doc_id", "text", k = 1, threshold = 0.75).select("id1", "id2")
      graft.dedup.Dedup.nearDupSurvivors(docs, "doc_id", pairs)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "q_dedup_incremental" -> ((s, d) => {
      // Incremental ingest dedup: a synthetic re-crawl batch (every
      // third doc re-ingested verbatim; every third-plus-one doc edited
      // with a ' v2' suffix, delivered TWICE to exercise within-batch
      // keep-first) deduped against the existing corpus. Survivors are
      // exactly the first copy of each edited doc.
      val docs = Tables.documents(s, d)
      val reingest = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val edited = docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text"))
      val editedDup = docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text"))
      val batch = reingest.unionByName(edited).unionByName(editedDup)
      graft.dedup.Dedup.exactDedupIncremental(batch, "doc_id", "text",
          docs, "text")
        .orderBy("doc_id")
    }),

    "q_neardup_quality" -> ((s, d) => {
      // Quality retention per near-dup CLUSTER: keep the longest member
      // (n_chars desc, min-id ties) of each connected component — the
      // production keeper rule, vs q_neardup_survivors' min-id. Same
      // deterministic consecutive-Jaccard pair set, so the oracle
      // mirrors the clustering and replays the argmax.
      val docs = Tables.documents(s, d)
      val consecutive = docs.select(col("doc_id").as("id1"),
        (col("doc_id") + 1).as("id2"))
      val pairs = graft.dedup.Dedup.jaccardVerify(consecutive, docs,
        "doc_id", "text", k = 1, threshold = 0.75).select("id1", "id2")
      graft.dedup.Dedup.nearDupSurvivorsByQuality(docs, "doc_id", pairs,
          col("n_chars"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "q_neardup_clusters" -> ((s, d) => {
      // Connected-component near-dup clustering over a DETERMINISTIC pair
      // set (consecutive ids with unigram Jaccard >= 0.75) so the oracle
      // can mirror it with gaps-and-islands SQL. Exercises the distributed
      // pointer-jumping label propagation end-to-end.
      val docs = Tables.documents(s, d)
      val consecutive = docs.select(col("doc_id").as("id1"),
        (col("doc_id") + 1).as("id2"))
      val pairs = graft.dedup.Dedup.jaccardVerify(consecutive, docs,
        "doc_id", "text", k = 1, threshold = 0.75).select("id1", "id2")
      val clusters = graft.dedup.Dedup.nearDupClusters(pairs)
      docs.select("doc_id")
        .join(clusters, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .orderBy("doc_id")
    }),

    "q_neardup_clusters_dist" -> ((s, d) => {
      // The SCALE path certified by the oracle (round-10 verdict item 4):
      // identical pair construction to q_neardup_clusters, but the
      // connected components run through nearDupClustersDistributed
      // DIRECTLY — min-label propagation + pointer jumping, edge set
      // never driver-materialized — rather than through the
      // driver-union-find fast path the edge counts at benched SFs would
      // otherwise select. Structurally guaranteed (the distributed entry
      // point is called, not the dispatcher) and plan-asserted in
      // PlanGuardSpec: the result scans the propagation's localCheckpoint
      // (RDDScanExec), never a driver-built LocalTableScan.
      val docs = Tables.documents(s, d)
      val consecutive = docs.select(col("doc_id").as("id1"),
        (col("doc_id") + 1).as("id2"))
      val pairs = graft.dedup.Dedup.jaccardVerify(consecutive, docs,
        "doc_id", "text", k = 1, threshold = 0.75).select("id1", "id2")
      val clusters = graft.dedup.Dedup.nearDupClustersDistributed(pairs)
      docs.select("doc_id")
        .join(clusters, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .orderBy("doc_id")
    }),

    "q_boilerplate" -> ((s, d) =>
      // Global-frequency boilerplate coverage (the CCNet/RefinedWeb hot
      // k-gram pass): bigrams in ≥35 docs are boilerplate; each doc scored
      // by the covered fraction of its bigram positions. k=2/minDf=35 are
      // tuned so the fixture splits non-trivially (130 of 916 bigrams hot
      // at sf0.01 — neither all nor none: a vacuous-oracle guard).
      graft.text.TextStats.boilerplate(Tables.documents(s, d), "doc_id",
          "text", k = 2, minDf = 35)
        .orderBy("doc_id")),

    "q_source_mix" -> ((s, d) => {
      // Corpus-mix curation report per source over a corpus with REAL
      // cross-source duplication (every doc_id % 7 == 0 re-syndicated
      // under a 'syndicated' source — the split_leakage trick: the fixture
      // is duplicate-free, so without the overlay the dup columns would
      // verify the empty set). Per source: doc count, corpus-wide
      // duplicated-doc count (fingerprint seen ≥2×), dup ratio, char
      // volume, corpus char share. One fingerprint-keyed aggregate + one
      // source-keyed aggregate + a 1-row broadcast total.
      val docs = Tables.documents(s, d)
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("source", lit("syndicated")))
      val fp = corpus.select(col("source"), col("n_chars"),
        graft.text.TextStats.fingerprintMd5(col("text")).as("fp"))
      val dupFp = fp.groupBy("fp").agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= 2).select(col("fp"), lit(1L).as("_dup"))
      val perSource = fp.join(dupFp, Seq("fp"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("_dup"), lit(0L)).as("n_dup_docs"),
          sum("n_chars").as("total_chars"))
      val total = fp.agg(sum("n_chars").as("_tc"))
      perSource.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          round(col("n_dup_docs").cast("double") / col("n_docs"), 6)
            .as("dup_ratio"),
          col("total_chars"),
          round(col("total_chars").cast("double") / col("_tc"), 6)
            .as("char_share"))
        .orderBy("source")
    }),

    "q_text_stats" -> ((s, d) =>
      graft.text.TextStats.withQualitySignals(Tables.documents(s, d), "text")
        .select("doc_id", "n_chars_calc", "n_tokens", "mean_token_len",
          "punct_ratio", "digit_ratio", "stopword_ratio")
        .orderBy("doc_id")),

    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          graft.text.TextStats.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.text.TextStats.fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")),

    "q_ngram_jaccard" -> ((s, d) => {
      // Exact 3-gram Jaccard over consecutive doc pairs (deterministic,
      // oracle-expressible candidate set; the LSH-generated candidate path is
      // covered by q_minhash_lsh_md5 below and ProductionTwinSpec).
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("id1"),
        (col("doc_id") + 1).as("id2"))
      graft.dedup.Dedup.jaccardVerify(pairs, docs, "doc_id", "text",
          k = 3, threshold = 0.0)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1")
    }),

    "q_pca_cert" -> ((s, d) =>
      // Distributed PCA certification: exact corpus facts (n, dims,
      // var_pop-trace) next to literal-1 invariant flags (orthonormal
      // basis, descending spectrum, trace preservation, and the
      // Pythagoras reconstruction identity measured against the DATA in
      // a second pass) — the sketch-certification pattern, since
      // eigenvectors aren't cross-engine replayable. k=8 of 64.
      graft.sim.Pca.certify(Tables.embeddings(s, d), "embedding", k = 8)),

    "q_embed_quant" -> ((s, d) => {
      // int8 embedding quantization report: symmetric codes, per-vector
      // scale, mean abs reconstruction error — the 4x storage lever for
      // 100 TB embedding tables, oracle-checked per row (fixed fold order).
      val rep = Tables.embeddings(s, d)
        .select(col("vec_id"), graft.sim.Ann.int8Report(col("embedding")).as("r"))
      rep.select(col("vec_id"),
          array_min(col("r.codes")).as("min_code"),
          array_max(col("r.codes")).as("max_code"),
          round(col("r.scale"), 6).as("scale"),
          round(col("r.mae"), 6).as("mae"))
        .orderBy("vec_id")
    }),

    "q_pack_bins" -> ((s, d) =>
      // Sequence packing: sequential-fill bin assignment by cumulative
      // token count per lang (capacity 512 tokens). Reference-faithful
      // single-window shape; the bucketed twin below removes the per-lang
      // single-task ceiling with boundary carries.
      graft.text.Packing.packBins(Tables.documents(s, d),
          "doc_id", "lang", "text", capacity = 512L)
        .orderBy("doc_id")),

    "q_pack_bins_bucketed" -> ((s, d) =>
      // Scale twin: identical bins from range-bucketed local cumsums +
      // broadcast carry-ins — shares q_pack_bins' oracle verbatim.
      graft.text.Packing.packBinsBucketed(Tables.documents(s, d),
          "doc_id", "lang", "text", capacity = 512L, idsPerBucket = 100L)
        .orderBy("doc_id")),

    "q_dup_spans" -> ((s, d) =>
      // Substring-level dedup: longest verbatim shared token span per doc
      // pair via rare-shingle anchoring + diagonal gaps-and-islands — the
      // exact-substring pass doc-level dedup misses (two documents can
      // share a 50-token quote at 0.1 Jaccard). The anchored-shingle
      // materialization is size-gated (shingleCheckpoint): localCheckpoint
      // at driver SFs, zstd parquet at builder scale — semantics
      // identical, checkpoint bytes ~10× smaller (round-13 order #2: the
      // 1000× rung's rep 2 died on uncompressed block-manager bytes).
      graft.dedup.Dedup.duplicatedSpans(Tables.documents(s, d),
          "doc_id", "text", k = 3, maxDf = 5, minSpan = 5,
          checkpoint = shingleCheckpoint(s, d))
        .orderBy("id1", "id2")),

    "q_bpe_merges" -> ((s, d) => {
      // Distributed BPE merge training (8 rounds): per round one
      // pair-count aggregation over the deduplicated word table + a
      // map-only merge; only the argmax pair reaches the driver. The
      // oracle replays every round as a generated CTE chain.
      import s.implicits._
      graft.text.Bpe.train(
          graft.text.Bpe.wordTable(Tables.documents(s, d), "text"), 8)
        .map(m => (m.step, m.pair, m.cnt))
        .toDF("step", "pair", "cnt")
        .orderBy("step")
    }),

    "q_bpe_encode" -> ((s, d) => {
      // The encode half of the tokenizer: train 8 merges on the corpus,
      // then apply them (in training order, one greedy pass each) to every
      // document and count the resulting BPE tokens. Merges ride as
      // literals in chained replace expressions — scan-shaped.
      val merges = graft.text.Bpe.train(
        graft.text.Bpe.wordTable(Tables.documents(s, d), "text"), 8)
      graft.text.Bpe.encode(Tables.documents(s, d), "doc_id", "text", merges)
        .orderBy("doc_id")
    }),

    "q_vocab_topk" -> ((s, d) =>
      // Vocabulary building: token frequency top-k (explode → count → top
      // 100 with deterministic tiebreak) — the classic first pass of any
      // tokenizer-training pipeline.
      Tables.documents(s, d)
        .select(explode(graft.text.TextStats.tokens(lower(col("text")))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100)),

    "q_vocab_coverage" -> ((s, d) => {
      // Tokenizer-sizing curve: what fraction of the corpus PIECE MASS a
      // top-k head vocabulary covers, at k = 10 / 100 / 1000 — the
      // number that decides the vocab size before training a tokenizer
      // (q_oov_rate's corpus-level complement). Pieces are word bigrams
      // (the phrase-merge candidates a BPE pass would face; the
      // whitespace unigram vocabulary of this fixture is 31 tokens, which
      // every head covers — vacuous). Shape: ONE exploded map-side-
      // combined piece count (checkpointed — four consumers), then each
      // head mass is a TakeOrdered over the DISTINCT-piece table
      // (O(V·log k), no global sort or window over V) + a 1-row
      // broadcast total.
      val tk = Tables.documents(s, d)
        .select(graft.text.TextStats.tokens(lower(col("text"))).as("_tk"))
      val tc = tk.filter(size(col("_tk")) >= 2)
        .select(explode(zip_with(
          slice(col("_tk"), lit(1), size(col("_tk")) - 1),
          slice(col("_tk"), lit(2), size(col("_tk")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val total = tc.agg(sum("cnt").as("total_mass"))
      val rows = Seq(10, 100, 1000).map { k =>
        tc.orderBy(col("cnt").desc, col("piece")).limit(k)
          .agg(coalesce(sum("cnt"), lit(0L)).as("head_mass"))
          .select(lit(k).as("k"), col("head_mass"))
      }.reduce(_ unionByName _)
      rows.crossJoin(broadcast(total))
        .select(col("k"), col("head_mass"), col("total_mass"),
          round(col("head_mass").cast("double") / col("total_mass"), 6)
            .as("coverage"))
        .orderBy("k")
    }),

    "q_pii_scrub" -> ((s, d) => {
      // PII redaction. The fixture text carries no PII, so a deterministic
      // email + IPv4 are synthesized from doc_id IDENTICALLY on both
      // engines — the oracle then verifies real (non-vacuous) replacements.
      val withPii = Tables.documents(s, d).select(col("doc_id"),
        concat(substring(col("text"), 1, 40), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".7 end"))
          .as("text"))
      graft.text.TextStats.scrubPii(withPii, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_fluency" -> ((s, d) =>
      // Bigram-frequency fluency (perplexity proxy, no libm log): mean
      // corpus frequency of the doc's bigram occurrences.
      graft.text.TextStats.bigramFluency(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "q_repetition" -> ((s, d) =>
      // Gopher/C4 repetition filters: distinct-token ratio + top-token share.
      graft.text.TextStats.repetitionSignals(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "q_contamination" -> ((s, d) => {
      // Decontamination audit: corpus docs (id >= 20) sharing 3-gram
      // shingles with the benchmark stand-in (id < 20).
      val docs = Tables.documents(s, d)
      graft.text.TextStats.contamination(
          docs.filter(col("doc_id") >= 20), "doc_id", "text",
          docs.filter(col("doc_id") < 20), k = 3)
        .orderBy("doc_id")
    }),

    "q_doc_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      docs.groupBy("lang")
        .agg(count(lit(1)).as("cnt"),
          round(avg("n_chars"), 6).as("avg_chars"),
          // median ≡ percentile(c, 0.5); bit-identical kernel dispatch
          graft.expressions.ExactPercentiles.pctl(docs, col("n_chars"),
            lit(0.5), docs.schema("n_chars").dataType).as("median_chars"))
        .orderBy("lang")
    }),

    "q_embed_norm" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          round(graft.sim.Ann.norm(col("embedding")), 6).as("l2_norm"))
        .orderBy("vec_id")),

    // The xxhash64-basis production variants of the four hash-twin families
    // (minhashCandidates, simhashFromHashes, lshTopK, cosineNearDup) used to
    // sit here as rows-only registry entries; DuckDB cannot replay xxhash64,
    // so they could never be oracle-green. They now live in
    // ProductionTwinSpec, which executes them against real testdata and
    // asserts the md5-twin structural contracts — the registry carries only
    // oracle-checkable rows.

    "q_minhash_lsh_md5" -> ((s, d) =>
      // md5 minwise signatures + md5 band buckets make the ENTIRE banded
      // candidate set DuckDB-checkable (same plan shape as the xxhash64
      // production path: equi-join on (band_id, band_hash), no cartesian).
      graft.dedup.Dedup.minhashCandidatesMd5(Tables.documents(s, d), "doc_id",
          "text", k = 2, numHashes = 32, bands = 16)
        .orderBy("id1", "id2")),

    "q_ann_lsh_md5" -> ((s, d) => {
      // md5-parity twin of q_ann_lsh: hyperplane components from md5 hex,
      // inputs quantized to exact integers — bucket assignment is bit-stable
      // cross-engine, so the full ANN result is oracle-checked.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.lshTopK(q, "qid", "qv", emb, "vec_id", "embedding", 5,
          bits = 4, bucketFn = graft.sim.Ann.lshBucketMd5(_, _))
        .select(col("qid"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy("qid", "rank")
    }),

    "q_ann_mp_md5" -> ((s, d) => {
      // Multi-probe LSH on the md5 integer basis: base bucket + Hamming-1
      // flips of the least-confident bits, ALL exact-integer — probe
      // selection included — so the full search is oracle-checked.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.lshTopKMultiProbeMd5(q, "qid", "qv", emb, "vec_id",
          "embedding", 5, bits = 4, probes = 2)
        .select(col("qid"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy("qid", "rank")
    }),

    "q_cosine_neardup_md5" -> ((s, d) =>
      // md5-parity twin of q_cosine_neardup — LSH-bucketed pairs with the
      // exact-integer bucket basis, fully oracle-checked. AUTO-BITS since
      // round 11 (the q_semdedup capacity rule, oracle-replayed): the
      // frozen-4-bit variant's within-bucket join grows N²/16 and read
      // 229× at 100× data; with targetCell=64 the candidate volume is
      // linear in the corpus at every SF.
      graft.sim.Ann.cosineNearDupAuto(Tables.embeddings(s, d), "vec_id",
          "embedding", threshold = 0.15, targetCell = AutoBitsTargetCell,
          bucketFn = graft.sim.Ann.lshBucketMd5(_, _))
        .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2")),

    "q_semdedup_fixedk" -> ((s, d) =>
      // SemDeDup with a FIXED label-centroid quantizer (the q_ann_ivf
      // cells) — kept as the N²/k capacity-law DEMO, and since round 10
      // BOUNDED to a fixed 1000-vector slice (oracle restricted
      // identically) so the demo row's cost is constant at every SF: with
      // k frozen, per-cell population grows with N and the within-cell
      // pair join is quadratic (measured 11.4× at 10× data on the
      // unbounded row — SCALE.md; reproduce on demand with
      // `tools/ScaleProbe semdedup_fixedk_unbounded`). The PRIMARY
      // q_semdedup row is the auto-k variant below, whose cell count
      // scales with the corpus. Survivors (vec_id, cell); pair candidates
      // are cell-bucketed, never corpus all-pairs.
      graft.sim.Ann.semDedup(
          Tables.embeddings(s, d).filter(col("vec_id") < 1000), "vec_id",
          "embedding", "label", threshold = 0.30)
        .orderBy("vec_id")),

    "q_table_profile" -> ((s, d) =>
      // Dataset-card profiler: one row per orders column with null /
      // exact-distinct counts and type-appropriate min/max/mean (means
      // on the exact decimal grid — no float avg). ONE aggregate job;
      // the schema drives the projection, never the data.
      graft.operators.Profile.profile(Tables.orders(s, d))),

    "q_embed_drift" -> ((s, d) =>
      // Embedding-distribution drift: per-dim mean of the even-id
      // (reference) vs odd-id (current) halves on the exact 1e-6 grid —
      // the batch-health read before trusting a new encoder/crawl
      // against existing quantizers. One explode + one map-side
      // combinable aggregate; dims output rows.
      graft.sim.Ann.embeddingDrift(Tables.embeddings(s, d), "embedding",
        refPred = pmod(col("vec_id"), lit(2)) === 0)),

    "q_semdedup" -> ((s, d) =>
      // SemDeDup, PRIMARY row (auto-k — promoted round 9 per the round-8
      // verdict: the sf1 run proved this is the plan a 100× user must
      // land on). The coarse quantizer SCALES with the corpus — cell
      // count 2^b where b is the smallest with 64·2^b >= N (pure-integer
      // rule, oracle-replayed), cells are md5-plane sign-LSH buckets.
      // Per-cell population stays ~64 at every corpus size, so the
      // within-cell pair join grows linearly in N — the engineered fix
      // for q_semdedup_fixedk's N²/k law (measured near-flat 1.33/2.39/
      // 2.43 s at 1×/4×/8×).
      graft.sim.Ann.semDedupAuto(Tables.embeddings(s, d), "vec_id",
          "embedding", threshold = 0.30, targetCell = AutoBitsTargetCell)
        .orderBy("vec_id")),

    "q_semdedup_incremental" -> ((s, d) => {
      // The embedding re-crawl shape: vec_id < 250 is the existing
      // corpus — deduped once, its survivors forming the index with the
      // quantizer frozen at autoBits(base count) — and the rest arrive
      // as a batch. Incoming vectors drop on a near-dup base survivor
      // in their cell or a smaller-id near-dup batch mate; both prune
      // joins are cell-keyed, the base never re-shuffles against itself.
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") < 250)
      val incoming = emb.filter(col("vec_id") >= 250)
      // ONE count job: the same bits feed the base dedup and the
      // incremental index (semDedupAutoWithBits skips the internal count)
      val bits = graft.sim.Ann.autoBits(base.count(), targetCell = AutoBitsTargetCell)
      val baseSurv = graft.sim.Ann.semDedupAutoWithBits(base, "vec_id",
          "embedding", threshold = 0.30, bits = bits)
        .join(base, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"))
      graft.sim.Ann.semDedupAutoIncremental(incoming, baseSurv, "vec_id",
          "embedding", threshold = 0.30, bits = bits)
        .orderBy("vec_id")
    }),

    "q_simhash_md5" -> ((s, d) =>
      // Oracle-checkable SimHash-32 (md5-parity bit basis — md5 is
      // identical cross-engine, unlike xxhash64): verifies the sign-sum
      // fingerprint math bit-for-bit against DuckDB.
      Tables.documents(s, d)
        .select(col("doc_id"), graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
        .select(col("doc_id"),
          simhashMd5Col(s, col("_m"), 32).as("simhash32"))
        .orderBy("doc_id")),

    "q_simhash32_saturation" -> ((s, d) =>
      // SimHash-32 pair counts — kept as the fingerprint-SATURATION
      // capacity-law demonstration (demoted from the primary name round 9
      // per the round-8 verdict: at 10× data the 32-bit space saturates —
      // 77.9M candidates, 20.4× wall — which q_banding_capacity predicts
      // for pennies), and since round 10 BOUNDED to a fixed 2000-doc
      // slice (oracle restricted identically) so the demo row's cost is
      // constant at every SF; the unbounded saturation curve stays
      // reproducible via `tools/ScaleProbe simhash32_unbounded`. The
      // PRIMARY q_simhash_pairs row is the 64-bit banding below. 4 bands
      // × 8 bits: maxDist 3 < 4 bands keeps recall exact by pigeonhole,
      // and 8-bit bands are the widest a 32-bit hash allows (candidates ≈
      // nBands·D²/2^bandBits/2 for D distinct hashes, so fingerprint
      // width is the whole selectivity game).
      graft.sim.Hamming.pairCounts(
        Tables.documents(s, d).filter(col("doc_id") < 2000)
          .select(col("doc_id"),
            graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
          .select(simhashMd5Col(s, col("_m"), 32).as("simhash32")),
        "simhash32", nBands = 4, bandBits = 8, maxDist = 3)),

    "q_banding_capacity" -> ((s, d) =>
      // The capacity plan for q_simhash32_saturation's 4×8-bit banding, as a
      // first-class operator: per band — buckets, largest bucket, and the
      // candidate fan-out Σ C(n,2) the banded join WOULD generate, read
      // ahead of running it (the sf4 SimHash-32 blow-up in SCALE.md
      // is visible in this table for pennies). DuckDB replays the
      // fingerprints and the banding arithmetic exactly.
      graft.sim.Hamming.bandingStats(
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
          .select(simhashMd5Col(s, col("_m"), 32).as("simhash32")),
        "simhash32", bandWidths = Seq(8, 8, 8, 8))),

    "q_simhash64" -> ((s, d) =>
      // SimHash-64 on the md5-ascii-bit basis — the wider-fingerprint
      // lever for large distinct-hash cardinalities (SCALE.md): every
      // primitive replays bit-for-bit in the DuckDB oracle.
      Tables.documents(s, d)
        .select(col("doc_id"), graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
        .select(col("doc_id"),
          simhashMd5Col(s, col("_m"), 64).as("simhash64"))
        .orderBy("doc_id")),

    "q_simhash_pairs" -> ((s, d) => {
      // Text near-dup pair counts, PRIMARY row (SimHash-64 banding —
      // promoted round 9 per the round-8 verdict; the 32-bit variant
      // saturates at 20.4× wall at 10× data). 5 bands
      // {13,13,13,13,12} tile all 64 bits — maxDist 4 < 5 bands
      // keeps recall exact, and 13-bit bands collide 32× less than the
      // 8-bit bands SimHash-32 permits (the measured D²/2^w law). At 10×
      // data the banded candidate volume grows 20.3× (template-clustered
      // buckets; BandProbe64) while wall grows 10.5× — cost tracks the
      // candidate law at half its slope, the floor any pair-miner pays
      // (SCALE.md round-9 sf1 section). The
      // doc_id % 7 re-syndication overlay plants exact duplicates so the
      // oracle verifies a non-empty pair set on the duplicate-free
      // fixture (random 64-bit fingerprints alone never land within
      // distance 4 — the vacuous-oracle guard).
      val docs = Tables.documents(s, d)
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.sim.Hamming.pairCounts(
        corpus.select(graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
          .select(simhashMd5Col(s, col("_m"), 64).as("sh")),
        "sh", bandWidths = Seq(13, 13, 13, 13, 12), maxDist = 4)
    }),

    "q_bpe_vocab" -> ((s, d) =>
      // Subword pre-tokenization vocabulary (BPE-ish) — formulated as regex
      // EXTRACTION (no lookarounds) so the identical pattern runs in DuckDB.
      Tables.documents(s, d)
        .select(explode(graft.text.TextStats.bpeTokens(col("text"))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(100)),

    "q_simhash_hamming" -> ((s, d) => {
      // Hamming distance between consecutive docs' SimHash-32 fingerprints
      // (md5-parity basis → oracle-checkable bit arithmetic end-to-end).
      val fp = Tables.documents(s, d)
        .select(col("doc_id"), graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
        .select(col("doc_id"),
          simhashMd5Col(s, col("_m"), 32).as("sh"))
      val a = fp.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      val b = fp.select(col("doc_id").as("id2"), col("sh").as("sh2"))
      a.join(b, col("id2") === col("id1") + 1)
        .select(col("id1"), col("id2"),
          bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("int").as("hamming"))
        .orderBy("id1")
    }),

    "q_ann_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.bruteForceTopK(q, "qid", "qv", emb, "vec_id", "embedding", 5)
        .select(col("qid"), col("vec_id"), round(col("cosine"), 6).as("cosine"),
          col("rank"))
        .orderBy("qid", "rank")
    }),

    "q_ann_pca_exact" -> ((s, d) => {
      // PCA-shortlist machinery under a HARD oracle: with the shortlist
      // covering the corpus, shortlistTopK IS brute force (the projection
      // and reduced-space window select everything; the exact full-dim
      // rerank decides the output) — so DuckDB replays the result without
      // ever seeing the eigenbasis. Certifies projection plumbing +
      // window + rerank bit-for-bit; the pruned production shape rides in
      // q_ann_pca (twin pattern, like the md5/xxhash hash families).
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val model = graft.sim.Pca.fit(emb, "embedding")
      graft.sim.Pca.shortlistTopK(q, "qid", "qv", emb, "vec_id", "embedding",
          model, kdims = 16, shortlist = Int.MaxValue, k = 5)
        .select(col("qid"), col("vec_id"), round(col("cosine"), 6).as("cosine"),
          col("rank"))
        .orderBy("qid", "rank")
    }),

    "q_ann_pca" -> ((s, d) => {
      // The production PCA + rerank read: 16-of-64-dim shortlist of 50,
      // exact rerank, recall@5 vs brute force measured in-query and
      // certified as a floor flag (eigenvectors aren't SQL-replayable, so
      // the flag pattern of q_sketch_bounds applies). Measured recall on
      // driver corpora: 0.80 (sf0.001) / 0.70 (sf0.01) / 0.46 (sf0.1).
      // Floor 0.3 (15 of 50 hits), not 0.4: every SF is a gate, the
      // treeAggregate eigenbasis can move by ulps with partitioning, and
      // near-tie flips at the shortlist/rank boundaries need absolute
      // margin — 0.3 keeps >= 8 hits of slack at the tightest (sf0.1)
      // reading. The slide with corpus size is the honest behavior of a
      // flat-spectrum synthetic corpus (top-8 explained variance 0.20 vs
      // 0.125 isotropic): PCA pruning pays on anisotropic real embedding
      // spaces, and q_ann_pca_exact pins the machinery regardless.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val model = graft.sim.Pca.fit(emb, "embedding")
      val brute = graft.sim.Ann.bruteForceTopK(q, "qid", "qv", emb,
          "vec_id", "embedding", 5)
        .select("qid", "vec_id")
      val pca = graft.sim.Pca.shortlistTopK(q, "qid", "qv", emb, "vec_id",
          "embedding", model, kdims = 16, shortlist = 50, k = 5)
        .select(col("qid"), col("vec_id"), lit(1L).as("_h"))
      brute.join(pca, Seq("qid", "vec_id"), "left")
        .agg(countDistinct("qid").as("n_queries"),
          coalesce(sum("_h"), lit(0L)).as("hits"))
        .select(col("n_queries"),
          when(col("hits") >= col("n_queries") * 5 * 0.3, 1L).otherwise(0L)
            .as("recall_floor_ok"))
    }),

    "q_ann_ivf" -> ((s, d) => {
      // IVF two-stage ANN: label-centroid coarse quantizer (6-dp rounded →
      // cross-engine stable cells), map-only corpus assignment, nprobe=2
      // probed cells per query, exact cosine top-k inside probed cells.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.ivfTopK(q, "qid", "qv", emb, "vec_id", "embedding",
          "label", k = 5, nprobe = 2)
        .select(col("qid"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy("qid", "rank")
    }),

    "q_ann_ivf_kmeans" -> ((s, d) => {
      // IVF over the LEARNED quantizer: fixed-point Lloyd k-means (md5-
      // seeded init, 2 exact-integer iterations) — no labels involved; the
      // DuckDB oracle replays the identical iterations bit-for-bit.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.ivfTopKKmeans(q, "qid", "qv", emb, "vec_id", "embedding",
          k = 5, centers = 8, iters = 2, nprobe = 2)
        .select(col("qid"), col("vec_id"),
          round(col("cosine"), 6).as("cosine"), col("rank"))
        .orderBy("qid", "rank")
    }),

    "q_ann_ivf_append" -> ((s, d) => {
      // Index MAINTENANCE lifecycle, end-to-end on disk: build the
      // persisted IVF index from the base half (vec_id < 250 — the
      // re-crawl split q_semdedup_incremental uses), append the arriving
      // batch with the FROZEN quantizer (map-only, O(batch) — never a
      // retrain or base re-assignment), then read back the staleness
      // report: per cell, each generation's population and mean
      // quantization error — the measurable rebuild signal. The oracle
      // replays the base-only k-means training, the frozen-centroid
      // assignment of everyone, and the exact-integer error arithmetic.
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") < 250)
      val batch = emb.filter(col("vec_id") >= 250)
      val path = scratchDir("graft_ivf_append")
      graft.sim.IvfIndex.build(base, "vec_id", "embedding", path,
        centers = 8, iters = 2)
      graft.sim.IvfIndex.append(batch, "vec_id", "embedding", s, path)
      graft.sim.IvfIndex.staleness(s, path)
    }),

    "q_random_proj" -> ((s, d) =>
      // JL random projection 64 → 8 dims on the md5 integer plane family —
      // exact integer dot products, bit-stable cross-engine (no rounding).
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(graft.sim.Ann.randomProjectionMd5(col("embedding"), 8))
            .as(Seq("pos", "comp")))
        .orderBy("vec_id", "pos")),

    "q_centroids" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "comp")))
        .groupBy("label", "pos")
        .agg(round(avg(col("comp").cast("double")), 6).as("mean_v"))
        .orderBy("label", "pos")),

    "q_mm_meta" -> ((s, d) =>
      // The deterministic half of the multimodal pipeline — asset
      // construction: modality routing, typed meta, payload sizes — IS
      // oracle-checkable; the codec kernels meet the DuckDB oracle via
      // q_mm_features_real, and the stub-fallback routing is golden-file
      // tested in MultimodalSpec.
      graft.multimodal.Multimodal.syntheticAssets(
          Tables.documents(s, d), "doc_id", "text")
        .select(col("asset_id"), col("modality"),
          length(col("content")).as("n_bytes"),
          col("meta.width").as("width"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("asset_id")),

    // (q_mm_features — the stubbed-decode plumbing smoke — was retired in
    // round 6: fully superseded by the hard-oracle q_mm_features_real below,
    // and the stub routing it exercised is covered by MultimodalSpec's
    // golden-file tests. Keeping it only added a permanent no_oracle row.)

    "q_mm_probe" -> ((s, d) =>
      // Typed metadata parsed FROM the payload bytes (PNG IHDR, WAV RIFF
      // chunks, Y4M header+frames) — the oracle knows the closed form per
      // modality, so every parsed field meets DuckDB.
      // SF-gated sample (mediaCertDocs): full corpus at driver SFs, the
      // deterministic budget slice at builder scale — see the helper.
      graft.multimodal.Multimodal.probeAssets(
          graft.multimodal.Multimodal.mediaAssets(
            mediaCertDocs(s, d), "doc_id"))
        .orderBy("asset_id")),

    "q_mm_probe_sampled" -> ((s, d) =>
      // The static-K twin that keeps the SAMPLED certification formula
      // oracle-green at every sf (mediaCertDocs' gate is corpus-size-
      // driven, so the oracle could never see it fire): same probe path
      // over the doc_id % 5 slice. COMPOSED with the SF gate (at driver
      // SFs the gate is identity, so the oracle sees pure % 5; at builder
      // scale the twin certifies % 5 OF the budget slice instead of 20%
      // of a 100× corpus — it prices the formula, not a second sweep).
      graft.multimodal.Multimodal.probeAssets(
          graft.multimodal.Multimodal.mediaAssets(
            mediaCertDocs(s, d).filter(pmod(col("doc_id"), lit(5)) === 0),
            "doc_id"))
        .orderBy("asset_id")),

    "q_phash" -> ((s, d) =>
      // Perceptual hash (dHash) of the REAL image payloads: PNG bytes →
      // ImageIO decode → 4×4 luma grid → 24 adjacent-cell comparison bits.
      // Served from the decode-once MEDIA INDEX since round 12 (the same
      // dHashImages kernel ran exactly once when the index was built —
      // MediaIndexSpec pins the equality); the oracle still replays the
      // pixel FORMULA in SQL, so the persisted values meet a fully
      // independent path to the same integer every round.
      graft.multimodal.MediaIndex.hashes(s, mediaIndexPath(s, d),
          "image", "dhash")
        .orderBy("asset_id")),

    "q_phash_pairs" -> ((s, d) =>
      // Image near-dup pair counts by Hamming distance over the 24-bit
      // dHash — the shared Hamming.pairCounts shape: distinct-hash
      // collapse with multiplicities, banded equi-join, arithmetic count
      // expansion. 5 bands is the minimum maxDist 4 allows (pigeonhole),
      // so {5,5,5,5,4} bits are the widest bands that tile 24 bits —
      // strictly more selective than the former 6×4 equal banding.
      // Hashes come from the persisted media index (round 12): the pair
      // row reads two parquet columns instead of re-decoding the corpus.
      graft.sim.Hamming.pairCounts(
        graft.multimodal.MediaIndex.hashes(s, mediaIndexPath(s, d),
          "image", "dhash"),
        "dhash", bandWidths = Seq(5, 5, 5, 5, 4), maxDist = 4)),

    "q_ahash_pairs" -> ((s, d) =>
      // Audio near-dup pairs over the 14-bit energy hash. maxDist 2 needs
      // only 3 bands for exact pigeonhole recall, so {5,5,4} bits are the
      // widest bands that tile 14 bits — 8–16× more selective per band
      // than the former 7×2 banding (2-bit bands collide 1-in-4 on random
      // hashes; near-useless pruning at high distinct-hash cardinality).
      graft.sim.Hamming.pairCounts(
        graft.multimodal.MediaIndex.hashes(s, mediaIndexPath(s, d),
          "audio", "ahash"),
        "ahash", bandWidths = Seq(5, 5, 4), maxDist = 2)),

    "q_vhash_pairs" -> ((s, d) =>
      // Video near-dup pairs over the 48-bit two-frame hash (6 bands × 8
      // bits, distance ≤ 4).
      graft.sim.Hamming.pairCounts(
        graft.multimodal.MediaIndex.hashes(s, mediaIndexPath(s, d),
          "video", "vhash"),
        "vhash", nBands = 6, bandBits = 8, maxDist = 4)),

    "q_ahash" -> ((s, d) =>
      // Audio fingerprint of the REAL WAV payloads: PCM decode → 8 integer
      // block energies + zero-crossing counts → 14 adjacent-comparison
      // bits. Integer energies make the bits order-independent, so the
      // formula-replay oracle is bit-exact (float RMS would not be).
      // Served from the decode-once media index since round 12.
      graft.multimodal.MediaIndex.hashes(s, mediaIndexPath(s, d),
          "audio", "ahash")
        .orderBy("asset_id")),

    "q_vhash" -> ((s, d) =>
      // Video fingerprint of the REAL Y4M payloads: frame walk → per-frame
      // integer luma-cell comparisons (24 bits × 2 frames). Exact integers
      // end-to-end, so the formula-replay oracle is bit-exact.
      // Served from the decode-once media index since round 12.
      graft.multimodal.MediaIndex.hashes(s, mediaIndexPath(s, d),
          "video", "vhash")
        .orderBy("asset_id")),

    "q_mm_features_real" -> ((s, d) =>
      // The hard oracle for the multimodal feature path: REAL container
      // payloads (PNG / WAV / Y4M, pixel+sample values from pure integer
      // formulas of doc_id) → the REAL JDK decoders (javax.imageio,
      // javax.sound.sampled, the Y4M frame parser) → feature vectors.
      // DuckDB replays the formulas + feature math directly, so every
      // decoded value meets the oracle bit-for-bit (all float ops in the
      // feature math are exact or IEEE-identical cross-engine — see
      // Multimodal.scala's media-fixture notes). Served from the
      // decode-once media index since round 12 — float32 round-trips
      // parquet exactly, so the persisted vectors ARE the decoded ones.
      graft.multimodal.MediaIndex.features(s, mediaIndexPath(s, d))
        .select(col("asset_id"),
          posexplode(col("features")).as(Seq("pos", "f")))
        .select(col("asset_id"), col("pos"),
          round(col("f").cast("double"), 6).as("feat"))
        .orderBy("asset_id", "pos")),

    "q_mm_jpeg" -> ((s, d) =>
      // Lossy-codec certification: the SAME formula image encoded as
      // lossless PNG and lossy JPEG (JDK baseline writer, quality 0.95),
      // both decoded through the REAL javax.imageio path. The PNG-side
      // dHash is EXACT (oracle replays the pixel formula, as q_phash);
      // the JPEG side is certified by bound flags the oracle states as
      // literal 1 — measured max luma deviation 0.0275 / dHash drift 0,
      // bounds 0.06 / 4 carry 2× headroom, same pattern as the sketch
      // certifications (q_cms_bounds / q_bloom_bounds).
      // SF-gated sample (mediaCertDocs): full corpus at driver SFs, the
      // deterministic budget slice at builder scale — see the helper.
      graft.multimodal.Multimodal.jpegParity(
          mediaCertDocs(s, d), "doc_id")
        .orderBy("asset_id")),

    "q_mm_jpeg_sampled" -> ((s, d) =>
      // Static-K oracle twin of the sampled jpeg certification, composed
      // with the SF gate (see q_mm_probe_sampled).
      graft.multimodal.Multimodal.jpegParity(
          mediaCertDocs(s, d).filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id")
        .orderBy("asset_id")),

    "q_mm_adpcm" -> ((s, d) =>
      // Compressed-audio certification: IMA-ADPCM (WAV tag 0x11, a real
      // 4:1 codec the JDK cannot decode) through the in-JVM decoder in
      // the production decodePcm16 path. first_sample is a hard
      // cross-engine value (block header stores sample 0 verbatim);
      // n/first/deviation bounds are literal-1 flags, jpegParity-style.
      // SF-gated sample (mediaCertDocs): full corpus at driver SFs, the
      // deterministic budget slice at builder scale — see the helper.
      graft.multimodal.Multimodal.adpcmParity(
          mediaCertDocs(s, d), "doc_id")
        .orderBy("asset_id")),

    "q_mm_adpcm_sampled" -> ((s, d) =>
      // Static-K oracle twin of the sampled ADPCM certification, composed
      // with the SF gate (see q_mm_probe_sampled).
      graft.multimodal.Multimodal.adpcmParity(
          mediaCertDocs(s, d).filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id")
        .orderBy("asset_id")),

    "q_mm_index" -> ((s, d) =>
      // The decode-once MEDIA INDEX itself, read back and certified: ONE
      // Multimodal.indexRow pass decoded every payload exactly once into
      // (dhash, ahash, vhash, features[16]) — this row checks the whole
      // persisted table (every fingerprint, the feature arity, the build
      // generation) against the DuckDB formula replay of all three
      // modalities at once. q_phash/q_ahash/q_vhash/q_*hash_pairs/
      // q_mm_features_real all read this index instead of re-decoding.
      graft.multimodal.MediaIndex.load(s, mediaIndexPath(s, d))
        .select(col("asset_id"), col("modality"), col("dhash"),
          col("ahash"), col("vhash"), size(col("features")).as("n_feat"),
          col("_gen").as("gen"))
        .orderBy("asset_id")),

    "q_mm_index_append" -> ((s, d) => {
      // Index MAINTENANCE lifecycle for media (the q_ann_ivf_append shape):
      // build the index from the base 70% of assets (pmod(doc_id,10) < 7 —
      // SF-independent split), decode-and-append ONLY the arriving 30% as
      // generation 1 (O(batch): the base is never re-read, let alone
      // re-decoded), then read back the per-(modality, generation)
      // population + decode-health report. The oracle replays the split
      // and the all-payloads-decodable closed form. BOUNDED to a fixed
      // 3000-asset slice (oracle restricted identically, q_semdedup_fixedk
      // pattern): the row certifies the lifecycle, not its scaling — the
      // append-vs-rebuild cost law at volume is measured by
      // tools/MediaIndexProbe (SCALE.md), so re-running a corpus-sized
      // build+append per bench rep would only re-price what the probe
      // already prices.
      val docs = Tables.documents(s, d).filter(col("doc_id") < 3000)
      val base = graft.multimodal.Multimodal.mediaAssets(
        docs.filter(pmod(col("doc_id"), lit(10)) < 7), "doc_id")
      val batch = graft.multimodal.Multimodal.mediaAssets(
        docs.filter(pmod(col("doc_id"), lit(10)) >= 7), "doc_id")
      val path = scratchDir("graft_mm_index_append")
      graft.multimodal.MediaIndex.build(base, path)
      graft.multimodal.MediaIndex.append(batch, s, path)
      graft.multimodal.MediaIndex.generations(s, path)
    }),

    "q_unigram_ppl" -> ((s, d) =>
      // Unigram-LM perplexity quality filter (KenLM analog at model order
      // 1): mean per-token surprisal in nats under the corpus's own
      // unigram distribution. ln carried as exact micro-nat integers
      // (cross-engine probe: Math.log ≡ DuckDB ln after the 1e-6
      // quantization for every count ≤ 2e6), summed order-free, one final
      // double expression.
      graft.text.TextStats.unigramSurprisal(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "q_mix_weights" -> ((s, d) =>
      // Corpus-mixture table: per-source doc/token counts, raw token
      // share, and the α=0.5 temperature sampling weight normalized by
      // the dominant source (sqrt + division are correctly-rounded IEEE
      // ops; a Σ√tokens normalizer would be order-dependent).
      graft.text.Sampling.mixWeights(
          Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    "q_bigram_ppl" -> ((s, d) =>
      // Bigram-LM perplexity (model order 2, add-1 smoothing): bigrams
      // form PER-ROW (token array zipped with its own 1-shift — never a
      // positional self-join), surprisal carried as exact micro-nat
      // BIGINTs, one final double expression. See TextStats scaladoc.
      graft.text.TextStats.bigramSurprisal(
          Tables.documents(s, d), "doc_id", "text",
          checkpoint = shingleCheckpoint(s, d))
        .orderBy("doc_id")),

    "q_source_kl" -> ((s, d) =>
      // Mixture-drift audit: KL(source ‖ corpus) over unigram token
      // distributions, four individually-quantized micro-nat log terms
      // combined exactly, one division at the end.
      graft.text.TextStats.sourceDivergence(
          Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    "q_dsir_weights" -> ((s, d) =>
      // DSIR importance weights: per-doc log-likelihood ratio of the
      // add-1 'en'-subset unigram LM over the whole-corpus LM — the
      // importance-resampling tilt score. Exact-integer micro-nats;
      // logw = ssum/1e6 single division.
      graft.text.TextStats.importanceWeights(
          Tables.documents(s, d), "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id")),

    "q_drift_ref" -> ((s, d) =>
      // Drift vs a FROZEN reference (the monitoring read; the streaming
      // twin StreamingDrift computes the identical micro-nat integers
      // incrementally, bitwise parity spec-proven): even docs build the
      // reference LM, odd docs score per source; unseen tokens collapse
      // into the OOV smoothing bucket.
      graft.text.TextStats.referenceDrift(
          Tables.documents(s, d), "source", "text", col("doc_id") % 2 === 0)
        .orderBy("source")),

    "q_ngram_novelty" -> ((s, d) =>
      // Cross-doc novelty: fraction of each doc's distinct 3-gram
      // shingles first seen in THIS doc (min-doc-id index join, no
      // all-pairs). Integer counts + one exact division.
      graft.text.TextStats.ngramNovelty(
          Tables.documents(s, d), "doc_id", "text", k = 3,
          checkpoint = shingleCheckpoint(s, d))
        .orderBy("doc_id")),

    "q_oov_rate" -> ((s, d) =>
      // Tokenizer-coverage read: per-doc token mass outside the corpus
      // top-100 vocabulary (deterministic count-desc/token-asc head).
      // The k-row vocabulary broadcasts; one exact division.
      graft.text.TextStats.oovRate(
          Tables.documents(s, d), "doc_id", "text", k = 100)
        .orderBy("doc_id")),

    "q_char_entropy" -> ((s, d) =>
      // Gibberish/binary-spill detector: per-doc code-point entropy,
      // H = (n·qln(n) − Σ c·qln(c))/n/1e6 — exact-integer numerator,
      // one final division chain. Runs the graft_char_entropy codegen
      // kernel (ONE zero-shuffle scan; the compositional twin shuffles
      // corpus-characters rows twice — parity bit-exact, CharEntropySpec).
      graft.text.TextStats.charEntropyAuto(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "q_quantile_agg" -> ((s, d) =>
      // PromQL `quantile(φ, metric)` — the cross-series instant-vector
      // quantile per time bucket (vs q_quantile_ot's per-series
      // over-time read). ONE percentile call with all three φs shares a
      // single sort buffer per group; Spark `percentile` ≡ DuckDB
      // `quantile_cont` interpolation, hash-exact at 6 dp.
      {
      val ev = Tables.events(s, d)
      ev.withColumn("bucket_us",
          expr("ts_us div 600000000") * lit(600000000L))
        .groupBy("bucket_us")
        .agg(count(lit(1)).as("cnt"),
          // bit-identical primitive-buffer kernel (ExactPercentileSpec);
          // dispatch on the ACTUAL column type, not a hardcoded
          // DoubleType — a schema drift falls back to the built-in
          // instead of failing analysis (r18 ADVICE item 2)
          graft.expressions.ExactPercentiles.pctl(ev, col("value"),
            array(lit(0.5), lit(0.9), lit(0.99)),
            ev.schema("value").dataType).as("_qs"))
        .select(col("bucket_us"), col("cnt"),
          round(element_at(col("_qs"), 1), 6).as("q50"),
          round(element_at(col("_qs"), 2), 6).as("q90"),
          round(element_at(col("_qs"), 3), 6).as("q99"))
        .orderBy("bucket_us")
      }),

    "q_hist_fraction" -> ((s, d) => {
      // PromQL histogram_fraction over the A7 histogram: interpolated
      // share of observations inside three [lo, hi] ranges — the SLO
      // read ("what fraction was under X") on pre-bucketed data. Range
      // endpoints derive from the same min/max the bucketing uses, in
      // the identical lo + f·(hi−lo) operation order as the oracle.
      val ev = Tables.events(s, d)
      val r = ev.agg(min(col("value")).cast("double"),
        max(col("value")).cast("double")).head()
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      val ranges = Seq((0.1, 0.5), (0.25, 0.75), (0.0, 1.0))
        .map { case (f1, f2) => (lo + f1 * (hi - lo), lo + f2 * (hi - lo)) }
      Score.histogramFraction(Score.histogramWith(ev, "value", lo, hi, 50),
          lo, hi, 50, ranges)
        .orderBy("x_lo", "x_hi")
    }),

    "q_hist_stats" -> ((s, d) => {
      // PromQL histogram_count / histogram_sum / histogram_avg over the
      // A7 histogram: exact count + midpoint-mass sum/mean estimates —
      // the aggregate reads that work when only bucketed counts survive.
      val ev = Tables.events(s, d)
      val r = ev.agg(min(col("value")).cast("double"),
        max(col("value")).cast("double")).head()
      Score.histogramStats(
        Score.histogramWith(ev, "value", r.getDouble(0), r.getDouble(1), 50),
        r.getDouble(0), r.getDouble(1), 50)
    }),

    "q_bottomk_series" -> ((s, d) => {
      // PromQL bottomk(2, sum by (type) (...)) per 1-hour bucket — the
      // topk mirror (cheapest/quietest series per bucket): keyed
      // aggregate + rank window, deterministic label tiebreak.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("hour_bkt").orderBy(col("sum_v").asc,
          col("event_type"))
      milliEvents(s, d)
        .groupBy(expr("ts_us div 3600000000").as("hour_bkt"),
          col("event_type"))
        .agg(sum("v").as("sum_v"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .orderBy("hour_bkt", "rk")
    }),

    "q_gopher_rules" -> ((s, d) =>
      // Gopher-style composite quality gate: token-count band, mean
      // token length band (integer cross-multiplied — no float
      // thresholds), stopword floor, and the conjunction. Scan-side
      // projection; the rule flags are exact-int comparisons so the
      // oracle replays them bit-identically.
      graft.text.TextStats.gopherRules(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "q_dup_ngrams" -> ((s, d) =>
      // Gopher repetition signals at 2-gram grain: per-doc character
      // share of the most-covering bigram and of all duplicated bigrams
      // — ratios of exact BIGINT char sums, one division each.
      graft.text.TextStats.dupNgramStats(
          Tables.documents(s, d), "doc_id", "text", n = 2)
        .orderBy("doc_id")),

    "q_quality_logit" -> ((s, d) => {
      // Linear quality classifier APPLY: a frozen Logit checkpoint
      // (S8-style — weights as literals; the distributed trainer is
      // LogitSpec surface) over exact integer count features. Dyadic
      // weights × BIGINT counts folded left-to-right keep score_z
      // bitwise-reproducible in DuckDB with no rounding step; keep is
      // the z > 0 decision (σ(z) > 0.5). Scan-side, zero shuffle.
      val doc = Tables.documents(s, d)
      doc.select(col("doc_id"),
          size(graft.text.TextStats.tokens(lower(col("text"))))
            .cast("long").as("n_tokens"),
          col("n_chars"),
          length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long").as("n_digits"),
          length(regexp_replace(col("text"), "[^.,;:!?]", ""))
            .cast("long").as("n_punct"))
        .withColumn("score_z", graft.model.Logit.scoreCol(
          Seq(col("n_tokens"), col("n_chars"), col("n_digits"),
            col("n_punct")),
          Seq(0.03125, 0.00390625, -0.0625, -0.125), bias = -3.0))
        .withColumn("keep", (col("score_z") > 0).cast("int"))
        .orderBy("doc_id")
    }),

    "q_quality_pr" -> ((s, d) => {
      // Classifier operating-point sweep: precision/recall of the frozen
      // logit (q_quality_logit's scorer) against the Gopher rule gate
      // (q_gopher_rules' pass flag) as pseudo-truth, at five z cutoffs —
      // the "can the cheap model replace the expensive gate, and where
      // to cut" read. One scan joins score and truth per doc, a
      // broadcast 5-row threshold frame fans out, and the confusion
      // counts are map-side-combinable sums. Exact-int features +
      // dyadic weights keep every comparison bitwise cross-engine.
      val doc = Tables.documents(s, d)
      val scored = doc.select(col("doc_id"),
          size(graft.text.TextStats.tokens(lower(col("text"))))
            .cast("long").as("n_tokens"),
          col("n_chars"),
          length(regexp_replace(col("text"), "[^0-9]", ""))
            .cast("long").as("n_digits"),
          length(regexp_replace(col("text"), "[^.,;:!?]", ""))
            .cast("long").as("n_punct"))
        .withColumn("score_z", graft.model.Logit.scoreCol(
          Seq(col("n_tokens"), col("n_chars"), col("n_digits"),
            col("n_punct")),
          Seq(0.03125, 0.00390625, -0.0625, -0.125), bias = -3.0))
      val truth = graft.text.TextStats.gopherRules(doc, "doc_id", "text")
        .select(col("doc_id"), col("pass"))
      graft.model.Logit.prCurve(
        scored.join(truth, Seq("doc_id")), "score_z", "pass",
        Seq(-2.0, -1.0, 0.0, 1.0, 2.0))
    }),

    "q_pq_codes" -> ((s, d) =>
      // Product quantization (the IVF-PQ compression stage): 4 subspaces
      // × 16 dims, 4-centroid codebooks trained with the deterministic
      // fixed-point Lloyd machinery (md5-seeded farthest-first init, one
      // iteration, ALL subspaces in one shuffle per iteration), then
      // map-only code assignment + exact-integer reconstruction error.
      // The oracle replays init, iteration, and coding bit-for-bit.
      graft.sim.Ann.pqCodes(Tables.embeddings(s, d), "vec_id", "embedding",
          m = 4, ksub = 4, iters = 1, dims = 64)
        .orderBy("vec_id")),

    "q_pq_topk" -> ((s, d) => {
      // PQ asymmetric-distance top-k — the search half of IVF-PQ: corpus
      // candidates are scored ONLY from their m codes (query-to-centroid
      // exact integer distances), broadcast-queries × codes scan + rank
      // window. The oracle replays codebooks, codes, ADC sums, and the
      // id-tiebreak ranking bit-for-bit.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.pqTopK(q, "qid", "qv", emb, "vec_id", "embedding",
          k = 5, m = 8, ksub = 8, iters = 2, dims = 64)
        .orderBy("qid", "rank")
    }),

    "q_pq_recall" -> ((s, d) => {
      // PQ quality evaluation IN the correctness record: per-query
      // recall@5 of the reranked PQ search (ADC shortlist of 50 from
      // codes alone, exact cosine rerank of only those candidates — the
      // production IVF-PQ read path) against the exact brute-force
      // ranking. Both searches are replayed by the oracle, so the recall
      // numbers themselves are certified, not just spot-asserted.
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val brute = graft.sim.Ann.bruteForceTopK(q, "qid", "qv", emb,
          "vec_id", "embedding", 5)
        .select("qid", "vec_id")
      val pq = graft.sim.Ann.pqTopKRerank(q, "qid", "qv", emb, "vec_id",
          "embedding", k = 5, m = 8, ksub = 8, iters = 2, dims = 64,
          rerank = 50)
        .select(col("qid"), col("vec_id"), lit(1L).as("_h"))
      brute.join(pq, Seq("qid", "vec_id"), "left")
        .groupBy("qid")
        .agg(coalesce(sum("_h"), lit(0L)).as("hits"))
        .select(col("qid"), col("hits"),
          (col("hits").cast("double") / lit(5.0)).as("recall"))
        .orderBy("qid")
    })
  )

  // ==========================================================================
  // Oracle SQL (DuckDB) — keys must mirror `queries` names and column names.
  // ==========================================================================

  /** Shared CTE chains for the audio / video fingerprint oracles (formula
    * replay of the real-decoder hashes); the hash and pair-count queries
    * both build on them. */
  /** The image dHash formula replay as a WITH-fragment ending at
    * `${p}dh(asset_id, dhash)`. `p` prefixes every CTE name so the three
    * modality chains can share one WITH clause (q_mm_index). */
  private def phashCtes(p: String): String =
    s"""${p}ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
       |${p}rb AS (SELECT doc_id, (r*3 + c) AS k,
       |    CASE WHEN (doc_id*131 + (r*4+c)*17) % 256
       |           < (doc_id*131 + (r*4+c+1)*17) % 256 THEN 1 ELSE 0 END AS b
       |  FROM ${p}ids, range(4) t1(r), range(3) t2(c)),
       |${p}cb AS (SELECT doc_id, 12 + (r*4 + c) AS k,
       |    CASE WHEN (doc_id*131 + (r*4+c)*17) % 256
       |           < (doc_id*131 + ((r+1)*4+c)*17) % 256 THEN 1 ELSE 0 END AS b
       |  FROM ${p}ids, range(3) t1(r), range(4) t2(c)),
       |${p}dh AS (SELECT doc_id AS asset_id,
       |    CAST(sum(b * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS dhash
       |  FROM (SELECT * FROM ${p}rb UNION ALL SELECT * FROM ${p}cb)
       |  GROUP BY 1)""".stripMargin

  /** The audio energy-hash formula replay, ending at
    * `${p}ah(asset_id, ahash)`. */
  private def ahashCtes(p: String): String =
    s"""${p}ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
       |${p}smp AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
       |    ((doc_id*7919 + i*104729) % 20001) - 10000 AS x
       |  FROM ${p}ids, range(256) t(i)),
       |${p}blk AS (SELECT doc_id, i // 32 AS b,
       |    sum(x*x) AS e,
       |    sum(CASE WHEN i % 32 > 0 AND ((x >= 0) <>
       |      (((doc_id*7919 + (i-1)*104729) % 20001) - 10000 >= 0))
       |      THEN 1 ELSE 0 END) AS z
       |  FROM ${p}smp GROUP BY 1, 2),
       |${p}bits AS (SELECT a.doc_id,
       |    (CASE WHEN a.e < n.e THEN CAST(1 AS BIGINT) << a.b
       |          ELSE 0 END) +
       |    (CASE WHEN a.z < n.z THEN CAST(1 AS BIGINT) << (7 + a.b)
       |          ELSE 0 END) AS v
       |  FROM ${p}blk a JOIN ${p}blk n ON a.doc_id = n.doc_id AND n.b = a.b + 1),
       |${p}ah AS (SELECT doc_id AS asset_id, CAST(sum(v) AS BIGINT) AS ahash
       |  FROM ${p}bits GROUP BY 1)""".stripMargin

  /** The video temporal-hash formula replay, ending at
    * `${p}vh(asset_id, vhash)`. */
  private def vhashCtes(p: String): String =
    s"""${p}ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
       |${p}px AS (SELECT doc_id, CAST(f AS BIGINT) AS f, CAST(pos AS BIGINT) AS pos,
       |    (doc_id*37 + pos*13 + f) % 256 AS v
       |  FROM ${p}ids, range(2) tf(f), range(16) tp(pos)),
       |${p}hb AS (SELECT a.doc_id,
       |    a.f*24 + (a.pos // 4)*3 + (a.pos % 4) AS k,
       |    CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
       |  FROM ${p}px a JOIN ${p}px b ON a.doc_id = b.doc_id AND a.f = b.f
       |    AND b.pos = a.pos + 1 AND a.pos % 4 < 3),
       |${p}vb AS (SELECT a.doc_id, a.f*24 + 12 + a.pos AS k,
       |    CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
       |  FROM ${p}px a JOIN ${p}px b ON a.doc_id = b.doc_id AND a.f = b.f
       |    AND b.pos = a.pos + 4 AND a.pos < 12),
       |${p}vh AS (SELECT doc_id AS asset_id,
       |    CAST(sum(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS vhash
       |  FROM (SELECT * FROM ${p}hb UNION ALL SELECT * FROM ${p}vb)
       |  GROUP BY 1)""".stripMargin

  private val AhashCtes: String = ahashCtes("")
  private val VhashCtes: String = vhashCtes("")

  /** N-round BPE oracle: each round is a generated CTE trio — pair counts
    * from the comma-form words, argmax with the (count desc, pair asc)
    * tiebreak, merge application via the boundary-safe replace — replaying
    * [[graft.text.Bpe.train]] round for round. */
  private def bpeMergesSql(n: Int): String = {
    val sel = (1 to n)
      .map(i => s"SELECT $i AS step, p AS pair, c AS cnt FROM m$i")
      .mkString("\nUNION ALL ")
    s"${bpeCtes(n)}\n$sel\nORDER BY step"
  }

  /** The shared WITH-chain (words, w0..wN, px/m per round) both BPE oracles
    * build on — exposed separately so the encode oracle appends its own
    * CTEs instead of string-slicing the merges oracle. */
  private def bpeCtes(n: Int): String = {
    val base =
      s"""WITH words AS (
         |  SELECT t AS w, count(*) AS cnt
         |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |        FROM documents)
         |  WHERE regexp_matches(t, '^[a-z]+$$') GROUP BY 1),
         |w0 AS (SELECT ',' || regexp_replace(w, '(.)', '\\1,,', 'g') || '_,' AS s,
         |    cnt
         |  FROM words)""".stripMargin
    val rounds = (1 to n).map { i =>
      s"""px$i AS (SELECT cnt, unnest(list_transform(list_zip(l, l[2:]),
         |    x -> CASE WHEN x[2] IS NULL THEN NULL
         |              ELSE x[1] || ' ' || x[2] END)) AS p
         |  FROM (SELECT cnt, list_filter(string_split(s, ','), y -> y <> '') AS l
         |        FROM w${i - 1})),
         |m$i AS (SELECT p, CAST(sum(cnt) AS BIGINT) AS c FROM px$i
         |  WHERE p IS NOT NULL
         |  GROUP BY p ORDER BY c DESC, p ASC LIMIT 1),
         |w$i AS (SELECT replace(s,
         |    ',' || string_split(m.p, ' ')[1] || ',,' ||
         |      string_split(m.p, ' ')[2] || ',',
         |    ',' || replace(m.p, ' ', '') || ',') AS s, cnt
         |  FROM w${i - 1}, m$i m)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  /** Encode oracle: reuse the merge-training CTEs (w0..wN, m1..mN), then
    * re-derive per-document words and chain one replace per round with the
    * merge pulled from its m-CTE as a scalar subquery. */
  private def bpeEncodeSql(n: Int): String = {
    val ctes = bpeCtes(n)
    val encodeRounds = (1 to n).map { i =>
      s"""e$i AS (SELECT doc_id, replace(s,
         |    (SELECT ',' || string_split(p, ' ')[1] || ',,' ||
         |       string_split(p, ' ')[2] || ',' FROM m$i),
         |    (SELECT ',' || replace(p, ' ', '') || ',' FROM m$i)) AS s
         |  FROM e${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""$ctes,
       |dt AS (SELECT doc_id, t AS w
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
       |      '\\s+')) AS t FROM documents)
       |  WHERE regexp_matches(t, '^[a-z]+$$')),
       |e0 AS (SELECT doc_id,
       |    ',' || regexp_replace(w, '(.)', '\\1,,', 'g') || '_,' AS s
       |  FROM dt),
       |$encodeRounds
       |SELECT doc_id,
       |  CAST(sum(len(list_filter(string_split(s, ','), y -> y <> '')))
       |    AS BIGINT) AS bpe_tokens,
       |  count(*) AS n_words
       |FROM e$n GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private def fillAllSql(inner: String): String =
    s"""SELECT ts_min, ${Types.map(fillSql).mkString(",\n  ")}
       |FROM ($inner) ORDER BY ts_min""".stripMargin

  private val stopIn =
    graft.text.TextStats.DefaultStopwords.map(w => s"'$w'").mkString("(", ",", ")")

  val oracleSql: Map[String, String] = Map(

    "q_pivot_outer_j1" ->
      s"SELECT * FROM ($MinuteWideSql) ORDER BY ts_min",

    // One row per (ts_bkt, type) feeds the pivot, so its avg(v) is identity
    // and the oracle is a single filtered-avg aggregation at the same grain.
    "q_pivot_inner_j2" ->
      s"""SELECT * FROM (
         |  SELECT ts_us // 600000000 AS ts_bkt,
         |    ${Types.map(filterAvg).mkString(",\n    ")}
         |  FROM ($EvSql) GROUP BY 1)
         |WHERE ${Types.map(t => s""""$t" IS NOT NULL""").mkString(" AND ")}
         |ORDER BY ts_bkt""".stripMargin,

    "q_pivot_keepfirst_j1" ->
      s"""SELECT ts_us,
         |  ${Types.map(t => s"""arg_min(value, event_id) FILTER (WHERE event_type = '$t') AS "$t"""").mkString(",\n  ")}
         |FROM ($EvSql) GROUP BY ts_us ORDER BY ts_us""".stripMargin,

    "q_totalize_p6" ->
      s"""SELECT *, CAST(NULL AS DOUBLE) AS refund FROM ($MinuteWideSql)
         |ORDER BY ts_min""".stripMargin,

    "q_dedup_keepfirst_w3" ->
      s"""SELECT event_id, user_id, event_type, ts_us, value FROM ($EvSql)
         |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
         |  ORDER BY ts_us, event_id) = 1
         |ORDER BY user_id, event_type""".stripMargin,

    "q_calendar_p4" ->
      s"""SELECT event_id, epoch_us(ts) AS ts_us,
         |CAST(isodow(ts) - 1 AS INTEGER) AS day_of_week,
         |CAST(hour(ts) AS INTEGER) AS hour_of_day
         |FROM events ORDER BY event_id""".stripMargin,

    "q_json_s2" ->
      s"""SELECT event_id, CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k_int
         |FROM events ORDER BY event_id""".stripMargin,

    "q_cast_coerce_p2" ->
      s"""SELECT event_id, TRY_CAST(CASE WHEN event_id % 10 = 0 THEN 'bad'
         |ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS coerced
         |FROM events ORDER BY event_id""".stripMargin,

    "q_epoch_ts_p3" ->
      s"""SELECT event_id, make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS ts_sec
         |FROM events ORDER BY event_id""".stripMargin,

    "q_fill_mean_a1" ->
      fillAllSqlWith(MinuteWideSql, c =>
        s"""round(coalesce("$c", avg("$c") OVER ()), 6) AS "$c""""),

    "q_fill_median_a2" ->
      fillAllSqlWith(MinuteWideSql, c =>
        s"""round(coalesce("$c", median("$c") OVER ()), 6) AS "$c""""),

    "q_ffill_bfill_w1" -> fillAllSql(MinuteWideSql),

    // the bucketed twin must produce byte-identical results to the global
    // fill — it shares fillSql verbatim
    "q_ffill_bucketed_w1" -> fillAllSql(MinuteWideSql),

    "q_ffill_partitioned_w1" ->
      s"""WITH long AS ($MinuteLongSql),
         |grid AS (SELECT ts_min, t.event_type
         |  FROM (SELECT DISTINCT ts_min FROM long)
         |  CROSS JOIN (VALUES ${Types.map(t => s"('$t')").mkString(",")}) t(event_type)),
         |sparse AS (SELECT g.ts_min, g.event_type, l.v
         |  FROM grid g LEFT JOIN long l
         |  ON g.ts_min = l.ts_min AND g.event_type = l.event_type)
         |SELECT ts_min, event_type, round(coalesce(
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY ts_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY ts_min ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS v
         |FROM sparse ORDER BY ts_min, event_type""".stripMargin,

    "q_nan_report_a5" ->
      s"""SELECT count(*) AS n_rows,
         |  ${Types.map(c => s"""CAST(sum(CASE WHEN "$c" IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS "${c}_nulls"""").mkString(",\n  ")}
         |FROM ($MinuteWideSql)""".stripMargin,

    "q_scale_minmax_a3" -> {
      def mm(c: String) =
        s"""("$c" - min("$c") OVER ()) / (max("$c") OVER () - min("$c") OVER ()) AS "$c""""
      s"""SELECT l_orderkey, l_linenumber, ${Seq("l_quantity", "l_extendedprice", "l_discount").map(mm).mkString(", ")}
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, "l_quantity", "l_extendedprice", "l_discount"""".stripMargin
    },

    "q_scale_standard_a4" -> {
      def st(c: String) =
        s"""round(("$c" - avg("$c") OVER ()) / stddev_pop("$c") OVER (), 6) AS "$c""""
      s"""SELECT l_orderkey, l_linenumber, ${Seq("l_quantity", "l_extendedprice").map(st).mkString(", ")}
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, "l_quantity", "l_extendedprice"""".stripMargin
    },

    "q_scale_robust" -> {
      def rb(c: String) =
        s"""round(("$c" - quantile_cont("$c", 0.5) OVER ())
           |  / (quantile_cont("$c", 0.75) OVER ()
           |     - quantile_cont("$c", 0.25) OVER ()), 6) AS "$c"""".stripMargin
      s"""SELECT l_orderkey, l_linenumber, ${Seq("l_quantity", "l_extendedprice").map(rb).mkString(", ")}
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, "l_quantity", "l_extendedprice"""".stripMargin
    },

    "q_winsorize" ->
      s"""WITH b AS (SELECT event_type,
         |    quantile_cont(value, 0.05) AS lo,
         |    quantile_cont(value, 0.95) AS hi
         |  FROM events GROUP BY 1)
         |SELECT e.event_type, e.event_id,
         |  round(greatest(least(e.value, b.hi), b.lo), 6) AS value
         |FROM events e JOIN b USING (event_type)
         |ORDER BY event_id""".stripMargin,

    "q_scale_inverse_m5" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  round(l_quantity, 6) AS l_quantity,
         |  round(l_extendedprice, 6) AS l_extendedprice
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_scale_transform_m5" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  (l_quantity - (SELECT min(l_quantity) FROM lineitem WHERE l_shipdate < '1999-01-01'))
         |  / ((SELECT max(l_quantity) FROM lineitem WHERE l_shipdate < '1999-01-01')
         |     - (SELECT min(l_quantity) FROM lineitem WHERE l_shipdate < '1999-01-01')) AS l_quantity
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, "l_quantity"""".stripMargin,

    "q_window_w2" -> windowSql,
    "q_window_w2_partitioned" -> windowSql,

    "q_tail_w5" ->
      s"""SELECT event_id, ts_us, value FROM (
         |  SELECT event_id, ts_us, value FROM ($EvSql)
         |  ORDER BY ts_us DESC, event_id DESC LIMIT $L)
         |ORDER BY ts_us, event_id""".stripMargin,

    "q_stepalign_w6" ->
      s"""SELECT ts_us - (ts_us % 120000000) AS step_us, count(*) AS cnt
         |FROM ($EvSql) GROUP BY 1 ORDER BY step_us""".stripMargin,

    "q_window_mse_a6" -> windowMseSql,
    "q_window_mse_a6_partitioned" -> windowMseSql,

    "q_per_feature_mse_a8" ->
      s"""SELECT event_type, round(avg(pow(v - m, 2)), 6) AS feature_mse
         |FROM (SELECT event_type, v, avg(v) OVER (PARTITION BY event_type) AS m
         |      FROM ($MinuteLongSql))
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_hist_a7" ->
      s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
         |SELECT least(CAST(floor(((value - lo) * 50) / (hi - lo)) AS BIGINT) + 1, 50) AS bucket,
         |  count(*) AS cnt
         |FROM events, b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_hist_quantile" ->
      s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
         |h AS (SELECT least(CAST(floor(((value - lo) * 50) / (hi - lo))
         |      AS BIGINT) + 1, 50) AS bucket, count(*) AS cnt
         |  FROM events, b GROUP BY 1),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM h),
         |qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
         |c AS (SELECT q, bucket, cnt,
         |    CAST(sum(cnt) OVER (PARTITION BY q ORDER BY bucket
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    q * total AS target
         |  FROM h, qs, t),
         |f AS (SELECT q, bucket, cnt, cum, target,
         |    row_number() OVER (PARTITION BY q ORDER BY bucket) AS rk
         |  FROM c WHERE cum >= target)
         |SELECT q, round(lo + (bucket - 1) * ((hi - lo) / 50) +
         |    ((target - (cum - cnt)) / cnt) * ((hi - lo) / 50), 6) AS value
         |FROM f, b WHERE rk = 1 ORDER BY q""".stripMargin,

    "q_threshold_p8" ->
      s"""SELECT event_id, value, value > 150.0 AS is_anomaly FROM events
         |ORDER BY event_id""".stripMargin,

    "q_anomaly_stats_a9" ->
      s"""SELECT is_anomaly, cnt, cnt / CAST(sum(cnt) OVER () AS DOUBLE) AS ratio
         |FROM (SELECT value > 150.0 AS is_anomaly, count(*) AS cnt
         |      FROM events GROUP BY 1)
         |ORDER BY is_anomaly""".stripMargin,

    "q_running_anomaly_a10" -> runningAnomalySql,
    "q_running_anomaly_a10_partitioned" -> runningAnomalySql,

    "q_detect_quality" -> {
      // The oracle replays the fixture arithmetic — minute series, planted
      // spike positions, stride-1 window ground truth — and asserts the
      // PERFECT outcome: n_flagged = planted windows, recall = precision
      // = 1.0. The Spark side earns those numbers through the frozen
      // trained model; a missed spike or a clean false positive changes
      // n_flagged/recall/precision and fails the compare. Constants are
      // interpolated from DetectQuality/Pipeline so the two sides cannot
      // drift apart.
      val L = Pipeline.SeqLen
      val P = graft.model.DetectQuality.SpikePeriod
      s"""WITH m AS (SELECT ts_us // 60000000 AS ts_min FROM ($EvSql)
         |  WHERE event_type = 'click' GROUP BY 1),
         |r0 AS (SELECT ts_min, row_number() OVER (ORDER BY ts_min) - 1 AS rn FROM m),
         |r AS (SELECT rn, CASE WHEN rn % $P = 0 THEN 1 ELSE 0 END AS sp FROM r0),
         |n AS (SELECT count(*) AS cnt FROM r),
         |w AS (SELECT a.rn AS wid, max(b.sp) AS spiked
         |  FROM r a JOIN r b ON b.rn BETWEEN a.rn AND a.rn + ${L - 1}
         |  CROSS JOIN n WHERE a.rn <= n.cnt - $L GROUP BY a.rn)
         |SELECT CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(spiked) AS BIGINT) AS n_flagged,
         |  1.0 AS spike_recall, 1.0 AS clean_precision
         |FROM w""".stripMargin
    },

    "q_union_u1" ->
      s"""SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_v
         |FROM (SELECT * FROM events WHERE event_id % 2 = 0
         |      UNION ALL SELECT * FROM events WHERE event_id % 2 = 1)
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity), 2) AS sum_qty,
         |  round(sum(l_extendedprice), 2) AS sum_base_price,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
         |  round(avg(l_quantity), 6) AS avg_qty,
         |  round(avg(l_extendedprice), 4) AS avg_price,
         |  round(avg(l_discount), 6) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS cnt
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_join_shuffle" ->
      s"""SELECT o_orderpriority,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         |  count(*) AS cnt
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_salted_agg" ->
      s"""SELECT event_type, count(value) AS cnt, min(value) AS min_v,
         |  max(value) AS max_v, round(sum(value), 4) AS sum_v
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_join_skewed" ->
      // The oracle is the UNSALTED join — salting must not change results.
      s"""WITH f AS (SELECT
         |    CASE WHEN l_suppkey % 10 < 9
         |      THEN (SELECT min(o_orderkey) FROM orders)
         |      ELSE l_orderkey END AS jk,
         |    l_quantity
         |  FROM lineitem)
         |SELECT o_orderstatus, count(*) AS cnt,
         |  round(sum(l_quantity), 2) AS sum_qty
         |FROM f JOIN orders ON jk = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_semi_anti" ->
      s"""WITH r AS (SELECT o_custkey FROM orders
         |  WHERE o_orderdate >= '1998-01-01'),
         |tagged AS (
         |  SELECT CASE WHEN EXISTS (SELECT 1 FROM r WHERE r.o_custkey =
         |      c.c_custkey) THEN 'with_order' ELSE 'no_order' END AS grp,
         |    c_acctbal
         |  FROM customer c)
         |SELECT grp, count(*) AS cnt,
         |  round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
         |    / 100.0 / count(*), 4) AS avg_bal
         |FROM tagged GROUP BY grp ORDER BY grp""".stripMargin,

    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         |  sum(l_quantity) AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY coalesce(l_returnflag, '~'),
         |  coalesce(l_linestatus, '~')""".stripMargin,

    "q_percent_rank" ->
      s"""SELECT o_orderpriority, o_orderkey, o_totalprice,
         |  round(percent_rank() OVER w, 6) AS pct_rank,
         |  round(cume_dist() OVER w, 6) AS cume,
         |  CAST(dense_rank() OVER w AS BIGINT) AS drank
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
         |ORDER BY o_orderkey""".stripMargin,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         |  sum(l_quantity) AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY coalesce(l_returnflag, '~'),
         |  coalesce(l_linestatus, '~')""".stripMargin,

    "q_moving_range" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         |    CAST(round(value * 1000) AS BIGINT) AS v FROM events)
         |SELECT event_type, ts_us, event_id,
         |  count(*) OVER w AS cnt_10m,
         |  CAST(sum(v) OVER w AS BIGINT) AS sum_10m
         |FROM ev
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
         |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "q_setops" ->
      s"""WITH e AS (SELECT lang, source FROM documents WHERE doc_id % 2 = 0),
         |o AS (SELECT lang, source FROM documents WHERE doc_id % 2 = 1)
         |SELECT 'except_even' AS op, count(*) AS cnt
         |  FROM (SELECT * FROM e EXCEPT SELECT * FROM o)
         |UNION ALL
         |SELECT 'except_odd' AS op, count(*) AS cnt
         |  FROM (SELECT * FROM o EXCEPT SELECT * FROM e)
         |UNION ALL
         |SELECT 'intersect' AS op, count(*) AS cnt
         |  FROM (SELECT * FROM e INTERSECT SELECT * FROM o)
         |ORDER BY op""".stripMargin,

    "q_counter_rate" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
         |    CAST(round(value * 1000) AS BIGINT) AS v FROM events),
         |c AS (SELECT event_type, ts_us, event_id,
         |    CAST(((sum(v) OVER (PARTITION BY event_type
         |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING))
         |      % 100000 + 100000) % 100000 AS BIGINT) AS ctr
         |  FROM ev),
         |d AS (SELECT event_type, ts_us, ctr, lag(ctr) OVER (
         |    PARTITION BY event_type ORDER BY ts_us, event_id) AS prev
         |  FROM c),
         |i AS (SELECT event_type, ts_us,
         |    CASE WHEN prev IS NULL THEN 0
         |         WHEN ctr < prev THEN ctr ELSE ctr - prev END AS inc
         |  FROM d)
         |SELECT event_type, CAST(sum(inc) AS BIGINT) AS increase,
         |  max(ts_us) - min(ts_us) AS span_us,
         |  round(sum(inc) * 1000000.0 / (max(ts_us) - min(ts_us)), 6)
         |    AS rate_per_sec
         |FROM i GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_over_time" ->
      s"""WITH ev AS ($MilliEvSql),
         |s AS (SELECT event_type, ts_us, event_id,
         |    count(*) OVER w AS cnt_ot,
         |    CAST(sum(v) OVER w AS BIGINT) AS sum_ot,
         |    CAST(sum(v * v) OVER w AS BIGINT) AS sumsq,
         |    min(v) OVER w AS mn,
         |    max(v) OVER w AS mx
         |  FROM ev
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
         |    RANGE BETWEEN 900000000 PRECEDING AND CURRENT ROW))
         |SELECT event_type, ts_us, event_id, cnt_ot, sum_ot,
         |  round(CAST(sum_ot AS DOUBLE) / cnt_ot / 1000.0, 6) AS avg_ot,
         |  round(sqrt(greatest(CAST(sumsq AS DOUBLE) / cnt_ot
         |    - (CAST(sum_ot AS DOUBLE) / cnt_ot)
         |      * (CAST(sum_ot AS DOUBLE) / cnt_ot), 0.0)) / 1000.0, 6)
         |    AS std_ot,
         |  round(mn / 1000.0, 6) AS min_ot,
         |  round(mx / 1000.0, 6) AS max_ot
         |FROM s ORDER BY event_id""".stripMargin,

    "q_zscore" ->
      s"""WITH ev AS ($MilliEvSql),
         |s AS (SELECT event_type, ts_us, event_id, v,
         |    count(*) OVER w AS cnt_ot,
         |    CAST(sum(v) OVER w AS BIGINT) AS sum_ot,
         |    CAST(sum(v * v) OVER w AS BIGINT) AS sumsq
         |  FROM ev
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
         |    RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)),
         |ot AS (SELECT event_type, ts_us, event_id, v, cnt_ot,
         |    round(CAST(sum_ot AS DOUBLE) / cnt_ot / 1000.0, 6) AS avg_ot,
         |    round(sqrt(greatest(CAST(sumsq AS DOUBLE) / cnt_ot
         |      - (CAST(sum_ot AS DOUBLE) / cnt_ot)
         |        * (CAST(sum_ot AS DOUBLE) / cnt_ot), 0.0)) / 1000.0, 6)
         |      AS std_ot
         |  FROM s),
         |z AS (SELECT event_type, ts_us, event_id, v, cnt_ot,
         |    CASE WHEN cnt_ot < 2 OR std_ot = 0.0 THEN NULL
         |      ELSE round((CAST(v AS DOUBLE) / 1000.0 - avg_ot) / std_ot, 6)
         |      END AS z
         |  FROM ot)
         |SELECT event_type, ts_us, event_id, v, cnt_ot, z,
         |  CASE WHEN z IS NULL THEN CAST(0 AS BIGINT)
         |    WHEN abs(z) > 3.0 THEN CAST(1 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS anom
         |FROM z ORDER BY event_id""".stripMargin,

    "q_group_mad" ->
      s"""WITH ev AS ($MilliEvSql),
         |d AS (SELECT event_type, ts_us // 86400000000 AS day_bkt, v
         |  FROM ev),
         |m AS (SELECT event_type, day_bkt,
         |    quantile_cont(v, 0.5) AS med, count(*) AS n
         |  FROM d GROUP BY 1, 2)
         |SELECT d.event_type, d.day_bkt, m.n AS n,
         |  round(m.med / 1000.0, 6) AS med,
         |  round(quantile_cont(abs(CAST(d.v AS DOUBLE) - m.med), 0.5)
         |    / 1000.0, 6) AS mad
         |FROM d JOIN m ON d.event_type = m.event_type
         |  AND d.day_bkt = m.day_bkt
         |GROUP BY d.event_type, d.day_bkt, m.n, m.med
         |ORDER BY d.event_type, d.day_bkt""".stripMargin,

    "q_count_values" ->
      s"""SELECT event_type, CAST(round(value * 10) AS BIGINT) AS vd,
         |  count(*) AS cnt
         |FROM events GROUP BY 1, 2 ORDER BY event_type, vd""".stripMargin,

    "q_shard_assign" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |    md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
         |sh AS (SELECT doc_id, lang, hx,
         |    CAST('0x' || substr(hx, 1, 12) AS BIGINT) % 32 AS shard
         |  FROM h)
         |SELECT doc_id, lang, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
         |    AS BIGINT) AS pos
         |FROM sh ORDER BY doc_id""".stripMargin,

    "q_deriv_predict" ->
      s"""WITH ev AS ($MilliEvSql),
         |t0 AS (SELECT event_type, ts_us, v,
         |    min(ts_us) OVER (PARTITION BY event_type) AS t0 FROM ev),
         |x AS (SELECT event_type, (ts_us - t0) // 1000000 AS x, v FROM t0),
         |a AS (SELECT event_type, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(v) AS BIGINT) AS sy,
         |    sum(CAST(x AS DOUBLE) * x) AS sxx,
         |    sum(CAST(x AS DOUBLE) * v) AS sxy,
         |    max(x) AS x_last
         |  FROM x GROUP BY 1),
         |sl AS (SELECT event_type, n, x_last, sx, sy,
         |    (n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |      / nullif(n * sxx
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope
         |  FROM a)
         |SELECT event_type, n,
         |  round(slope * 3.6, 6) AS deriv_per_hour,
         |  round((CAST(sy AS DOUBLE) / n
         |    + slope * (x_last + 3600 - CAST(sx AS DOUBLE) / n)) / 1000.0, 6)
         |    AS predict_val
         |FROM sl ORDER BY event_type""".stripMargin,

    "q_resets_changes" ->
      s"""WITH ev AS ($MilliEvSql),
         |c AS (SELECT event_type, ts_us, event_id,
         |    CAST(((sum(v) OVER (PARTITION BY event_type
         |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING))
         |      % 100000 + 100000) % 100000 AS BIGINT) AS ctr
         |  FROM ev),
         |d AS (SELECT event_type, ctr, lag(ctr) OVER (
         |    PARTITION BY event_type ORDER BY ts_us, event_id) AS prev
         |  FROM c)
         |SELECT event_type,
         |  CAST(sum(CASE WHEN ctr < prev THEN 1 ELSE 0 END) AS BIGINT)
         |    AS resets,
         |  CAST(sum(CASE WHEN ctr <> prev THEN 1 ELSE 0 END) AS BIGINT)
         |    AS changes
         |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_rate_window" ->
      s"""WITH ev AS ($MilliEvSql),
         |c AS (SELECT event_type, ts_us, event_id,
         |    CAST(((sum(v) OVER (PARTITION BY event_type
         |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING))
         |      % 100000 + 100000) % 100000 AS BIGINT) AS ctr
         |  FROM ev),
         |i AS (SELECT event_type, ts_us, event_id, ctr,
         |    CASE WHEN prev IS NULL THEN 0
         |         WHEN ctr < prev THEN ctr ELSE ctr - prev END AS inc
         |  FROM (SELECT event_type, ts_us, event_id, ctr, lag(ctr) OVER (
         |      PARTITION BY event_type ORDER BY ts_us, event_id) AS prev
         |    FROM c))
         |SELECT event_type, ts_us, event_id, ctr,
         |  CAST(sum(inc) OVER w AS BIGINT) AS increase_w,
         |  round(CAST(sum(inc) OVER w AS BIGINT) * 1000000.0
         |    / nullif(CAST(ts_us - min(ts_us) OVER w AS DOUBLE), 0.0), 6)
         |    AS rate_w
         |FROM i
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
         |  RANGE BETWEEN 900000000 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "q_delta_irate" ->
      s"""WITH ev AS ($MilliEvSql),
         |r AS (SELECT event_type, ts_us, v,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY ts_us, event_id) AS rna,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY ts_us DESC, event_id DESC) AS rnd
         |  FROM ev),
         |a AS (SELECT event_type,
         |    max(CASE WHEN rna = 1 THEN v END) AS v_first,
         |    max(CASE WHEN rnd = 1 THEN v END) AS v_last,
         |    max(CASE WHEN rnd = 2 THEN v END) AS v_prev,
         |    max(CASE WHEN rnd = 1 THEN ts_us END) AS ts_last,
         |    max(CASE WHEN rnd = 2 THEN ts_us END) AS ts_prev
         |  FROM r GROUP BY 1)
         |SELECT event_type,
         |  round((v_last - v_first) / 1000.0, 6) AS delta_val,
         |  round((v_last - v_prev) / 1000.0, 6) AS idelta_val,
         |  round((v_last - v_prev) * 1000.0
         |    / nullif(CAST(ts_last - ts_prev AS DOUBLE), 0.0), 6)
         |    AS irate_per_sec
         |FROM a ORDER BY event_type""".stripMargin,

    "q_ewma" -> ewmaOracleSql,

    "q_vector_ratio" ->
      s"""WITH ev AS ($MilliEvSql),
         |g AS (SELECT ts_us // 600000000 AS bkt, event_type,
         |    CAST(sum(v) AS BIGINT) AS sum_v FROM ev GROUP BY 1, 2)
         |SELECT bkt, event_type, sum_v,
         |  round(sum_v * 1.0 / (sum(sum_v) OVER (PARTITION BY bkt)), 6)
         |    AS share
         |FROM g ORDER BY bkt, event_type""".stripMargin,

    "q_offset_compare" ->
      s"""WITH ev AS ($MilliEvSql),
         |h AS (SELECT ts_us // 3600000000 AS hr, event_type,
         |    CAST(sum(v) AS BIGINT) AS sv, count(*) AS cn
         |  FROM ev GROUP BY 1, 2),
         |a AS (SELECT hr, event_type,
         |    CAST(sv AS DOUBLE) / cn AS avg_v FROM h)
         |SELECT a.hr, a.event_type,
         |  a.avg_v / 1000.0 AS avg_v,
         |  (a.avg_v - p.avg_v) / 1000.0 AS delta_1h
         |FROM a LEFT JOIN a p
         |  ON p.hr = a.hr - 1 AND p.event_type = a.event_type
         |ORDER BY a.hr, a.event_type""".stripMargin,

    "q_absent_gaps" ->
      s"""WITH b AS (SELECT DISTINCT event_type,
         |    epoch_us(ts) // 600000000 AS bkt FROM events),
         |l AS (SELECT event_type, bkt, lag(bkt) OVER (
         |    PARTITION BY event_type ORDER BY bkt) AS prev FROM b)
         |SELECT event_type, prev + 1 AS gap_start,
         |  bkt - prev - 1 AS gap_len
         |FROM l WHERE prev IS NOT NULL AND bkt - prev > 1
         |ORDER BY event_type, gap_start""".stripMargin,

    "q_topk_series" ->
      s"""WITH ev AS ($MilliEvSql),
         |g AS (SELECT ts_us // 3600000000 AS hour_bkt, event_type,
         |    CAST(sum(v) AS BIGINT) AS sum_v FROM ev GROUP BY 1, 2),
         |r AS (SELECT hour_bkt, event_type, sum_v, row_number() OVER (
         |    PARTITION BY hour_bkt ORDER BY sum_v DESC, event_type) AS rk
         |  FROM g)
         |SELECT hour_bkt, event_type, sum_v, CAST(rk AS INTEGER) AS rk
         |FROM r WHERE rk <= 2
         |ORDER BY hour_bkt, rk""".stripMargin,

    "q_label_ops" ->
      s"""SELECT event_id, event_type,
         |  regexp_replace(event_type, '^(click|view)$$', 'interaction')
         |    AS kind,
         |  concat_ws('/', 'events', event_type) AS series,
         |  regexp_extract(props, '"k":\\s*(\\d+)', 1) AS k_raw
         |FROM events ORDER BY event_id""".stripMargin,

    "q_source_cap" ->
      s"""WITH r AS (SELECT doc_id, source, n_chars, row_number() OVER (
         |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents)
         |SELECT doc_id, source, n_chars, CAST(rk AS INTEGER) AS rk
         |FROM r WHERE rk <= 3
         |ORDER BY source, rk""".stripMargin,

    "q_holt_winters" -> holtWintersOracleSql,

    "q_quantile_ot" ->
      s"""WITH ev AS ($MilliEvSql)
         |SELECT event_type, ts_us, event_id,
         |  round(quantile_cont(v, 0.5) OVER (PARTITION BY event_type
         |    ORDER BY ts_us, event_id
         |    ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) / 1000.0, 6)
         |    AS med_ot
         |FROM ev ORDER BY event_id""".stripMargin,

    "q_sessionize" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |b AS (SELECT user_id, ts_us,
         |    CASE WHEN ts_us - lag(ts_us) OVER (
         |        PARTITION BY user_id ORDER BY ts_us) >= 1800000000
         |      THEN 1 ELSE 0 END AS nb
         |  FROM ev),
         |si AS (SELECT user_id, ts_us,
         |    CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts_us
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM b)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |  min(ts_us) AS ts_start, max(ts_us) AS ts_end
         |FROM si GROUP BY 1, 2
         |ORDER BY user_id, session_idx""".stripMargin,

    "q_asof_join" ->
      s"""WITH ev AS ($EvSql),
         |l AS (SELECT event_id, user_id % 16 AS bucket, ts_us
         |  FROM ev WHERE event_type = 'view'),
         |r AS (SELECT user_id % 16 AS bucket,
         |    (ts_us // 60000000) * 60000000 AS rts,
         |    round(avg(value), 6) AS v_click
         |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT l.bucket, l.event_id, l.ts_us, r.v_click
         |FROM l ASOF LEFT JOIN r
         |  ON l.bucket = r.bucket AND r.rts <= l.ts_us
         |ORDER BY l.event_id""".stripMargin,

    "q_asof_forward" ->
      s"""WITH ev AS ($EvSql),
         |l AS (SELECT event_id, user_id % 16 AS bucket, ts_us
         |  FROM ev WHERE event_type = 'view'),
         |r AS (SELECT user_id % 16 AS bucket,
         |    (ts_us // 60000000) * 60000000 AS rts,
         |    round(avg(value), 6) AS v_click
         |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT l.bucket, l.event_id, l.ts_us, r.v_click
         |FROM l ASOF LEFT JOIN r
         |  ON l.bucket = r.bucket AND r.rts >= l.ts_us
         |ORDER BY l.event_id""".stripMargin,

    "q_asof_tolerance" ->
      s"""WITH ev AS ($EvSql),
         |l AS (SELECT event_id, user_id % 16 AS bucket, ts_us
         |  FROM ev WHERE event_type = 'view'),
         |r AS (SELECT user_id % 16 AS bucket,
         |    (ts_us // 60000000) * 60000000 AS rts,
         |    round(avg(value), 6) AS v_click
         |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT l.bucket, l.event_id, l.ts_us,
         |  CASE WHEN l.ts_us - r.rts <= 300000000 THEN r.v_click END AS v_click
         |FROM l ASOF LEFT JOIN r
         |  ON l.bucket = r.bucket AND r.rts <= l.ts_us
         |ORDER BY l.event_id""".stripMargin,

    "q_range_join" ->
      s"""WITH ev AS ($EvSql),
         |i AS (SELECT event_id AS win_id, ts_us AS win_start,
         |    ts_us + 1800000000 AS win_end
         |  FROM ev WHERE event_type = 'purchase'),
         |p AS (SELECT ts_us AS err_ts, value AS err_v
         |  FROM ev WHERE event_type = 'error')
         |SELECT i.win_id, count(*) AS n_errors,
         |  round(min(p.err_v), 6) AS min_v, round(max(p.err_v), 6) AS max_v
         |FROM i JOIN p ON i.win_start <= p.err_ts AND p.err_ts < i.win_end
         |GROUP BY i.win_id ORDER BY i.win_id""".stripMargin,

    "q_sketch_bounds" ->
      s"""SELECT count(*) AS n_rows, count(DISTINCT text) AS exact_distinct,
         |  CAST(1 AS BIGINT) AS hll_ok, CAST(1 AS BIGINT) AS p50_rank_ok
         |FROM documents""".stripMargin,

    "q_cms_bounds" ->
      // Exact top-20 (count desc, token asc) + the CMS guarantees as
      // literal 1s: a sketch under-counting or drifting past eps*N flips
      // a flag on the Spark side and fails the hash compare.
      s"""WITH tk AS (SELECT t AS token
         |  FROM (SELECT unnest(string_split_regex(trim(lower(text)),
         |      '\\s+')) AS t FROM documents)
         |  WHERE t <> ''),
         |top AS (SELECT token, CAST(count(*) AS BIGINT) AS c_exact
         |  FROM tk GROUP BY 1 ORDER BY c_exact DESC, token LIMIT 20)
         |SELECT token, c_exact, CAST(1 AS BIGINT) AS ge_ok,
         |  CAST(1 AS BIGINT) AS eps_ok
         |FROM top ORDER BY token""".stripMargin,

    "q_bloom_bounds" ->
      // Exact member/probe counts; the bloom guarantees as literal 1s
      // (q_sketch_bounds pattern — a violated guarantee flips the Spark
      // flag and fails the hash compare).
      s"""WITH f AS (SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM documents),
         |e AS (SELECT DISTINCT f FROM f WHERE doc_id % 2 = 0),
         |p AS (SELECT DISTINCT f.f FROM f
         |  WHERE doc_id % 2 = 1 AND f NOT IN (SELECT f FROM e))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_members,
         |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_probes,
         |  CAST(1 AS BIGINT) AS no_false_neg, CAST(1 AS BIGINT) AS fp_ok""".stripMargin,

    "q_interval_join" ->
      s"""WITH ev AS ($EvSql),
         |p AS (SELECT event_id AS p_id, user_id, ts_us AS p_us
         |  FROM ev WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS c_id, user_id, ts_us AS c_us
         |  FROM ev WHERE event_type = 'click')
         |SELECT p.p_id, c.c_id, p.user_id, c.c_us - p.p_us AS delta_us
         |FROM p JOIN c ON p.user_id = c.user_id
         |  AND c.c_us >= p.p_us - 600000000 AND c.c_us <= p.p_us + 600000000
         |ORDER BY p_id, c_id""".stripMargin,

    "q3_shipping" ->
      s"""SELECT c_mktsegment,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         |  count(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey AND o_orderdate >= '1999-01-01'
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_tfidf_topk" ->
      s"""WITH tk AS (SELECT doc_id,
         |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
         |  WHERE term <> '' GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT tf.doc_id, tf.term, tf.tf,
         |    tf.tf * (n.n + 1.0) / (dfreq.df + 1.0) AS score,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * (n.n + 1.0) / (dfreq.df + 1.0) DESC, tf.term) AS rk
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT doc_id, term, CAST(rk AS INTEGER) AS rk, round(score, 6) AS score
         |FROM scored WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,

    // ONE string for BOTH curation twins: the fused single-plan row and
    // the staged write-per-stage row must match the identical replay —
    // sharing it makes the twins unsplittable (the q_ann_pca_exact
    // pattern).
    "q_curation_pipeline" -> curationSql,

    "q_curation_staged" -> curationSql,


    "q_doc_chunks" ->
      // list_filter mirrors tokens(): empty-token-free arrays, which also
      // covers the whitespace-only-text case the old CASE handled.
      s"""WITH tk AS (SELECT doc_id,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      y -> y <> '') AS t
         |  FROM documents),
         |st AS (SELECT doc_id, t,
         |    CAST(greatest(floor((len(t) - 32 + 15) / 16.0), 0) AS BIGINT) AS last
         |  FROM tk),
         |ex AS (SELECT doc_id, t, unnest(range(0, last + 1)) AS i FROM st)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
         |  array_to_string(list_slice(t, i*16 + 1, i*16 + 32), ' ') AS chunk,
         |  CAST(len(list_slice(t, i*16 + 1, i*16 + 32)) AS INTEGER) AS n_tokens
         |FROM ex WHERE len(list_slice(t, i*16 + 1, i*16 + 32)) > 0
         |ORDER BY doc_id, chunk_no""".stripMargin,

    "q_len_percentiles" ->
      s"""SELECT lang, round(quantile_cont(n_chars, 0.5), 6) AS q50,
         |  round(quantile_cont(n_chars, 0.9), 6) AS q90,
         |  round(quantile_cont(n_chars, 0.99), 6) AS q99
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000 < 300
         |ORDER BY doc_id""".stripMargin,

    "q_sample_temperature" ->
      s"""WITH n AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1)
         |SELECT d.doc_id, d.lang FROM documents d JOIN n USING (lang)
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000
         |  < least(1000, CAST(floor(3000.0 / sqrt(cnt)) AS BIGINT))
         |ORDER BY doc_id""".stripMargin,

    "q_dedup_quality" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |QUALIFY row_number() OVER (
         |  PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |  ORDER BY n_chars DESC, doc_id) = 1
         |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000
         |  < CASE WHEN lang = 'en' THEN 100 ELSE 500 END
         |ORDER BY doc_id""".stripMargin,

    "q_split_leakage" ->
      s"""WITH f AS (SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents)
         |SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0
         |  AND fp IN (SELECT fp FROM f WHERE doc_id % 3 = 0)
         |ORDER BY fp""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         |    / 10000.0 AS revenue,
         |  count(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |  AND o_orderdate >= '1998-01-01' AND o_orderdate < '1999-01-01'
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |  * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
         |  count(*) AS cnt
         |FROM lineitem
         |WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
         |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_rank_in_group" ->
      s"""SELECT o_orderpriority, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice
         |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
         |        row_number() OVER (PARTITION BY o_orderpriority
         |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
         |      FROM orders)
         |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    "q_dedup_exact" ->
      s"""SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |  min(doc_id) AS doc_id, count(*) AS dup_count
         |FROM documents GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Exact n/dims plus the var_pop trace (the one eigen-invariant DuckDB
    // can replay without an eigensolver); the four invariants ride as
    // literal 1s (q_sketch_bounds pattern). The WHERE mirrors certify()'s
    // null-vector / null-element drop so both engines state the SAME
    // population — without it a null row in a future fixture would read
    // as a Spark bug (n and trace diverging cross-engine).
    "q_pca_cert" ->
      s"""WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |dm AS (SELECT unnest(v) AS x, unnest(range(1, len(v) + 1)) AS i FROM e),
         |vr AS (SELECT sum(vp) AS tr, count(*) AS nd
         |  FROM (SELECT i, var_pop(x) AS vp FROM dm GROUP BY i))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n,
         |  CAST((SELECT nd FROM vr) AS INTEGER) AS dims,
         |  round((SELECT tr FROM vr), 4) AS trace,
         |  CAST(1 AS BIGINT) AS orth_ok, CAST(1 AS BIGINT) AS desc_ok,
         |  CAST(1 AS BIGINT) AS trace_ok, CAST(1 AS BIGINT) AS recon_ok""".stripMargin,

    "q_embed_quant" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |m AS (SELECT vec_id, v,
         |    list_aggregate(list_transform(v, x -> abs(x)), 'max') AS ma FROM e),
         |s AS (SELECT vec_id, v,
         |    CASE WHEN ma > 0 THEN 127.0 / ma ELSE 0.0 END AS scale FROM m),
         |q AS (SELECT vec_id, v, scale,
         |    list_transform(v, x -> CAST(round(x * scale) AS BIGINT)) AS codes FROM s)
         |SELECT vec_id,
         |  list_aggregate(codes, 'min') AS min_code,
         |  list_aggregate(codes, 'max') AS max_code,
         |  round(scale, 6) AS scale,
         |  round(list_aggregate(list_transform(range(1, len(v)+1),
         |    i -> abs(v[i] - CASE WHEN scale > 0 THEN codes[i] / scale ELSE 0.0 END)),
         |    'sum') / len(v), 6) AS mae
         |FROM q ORDER BY vec_id""".stripMargin,

    "q_pack_bins" -> packBinsSql,
    "q_pack_bins_bucketed" -> packBinsSql,

    // Replays duplicatedSpans verbatim: positional 3-gram shingles, df<=5
    // rare-shingle anchoring, pair equi-join on the shingle, diagonal
    // gaps-and-islands (pos1 - row_number), span length = run + k - 1.
    // All integer arithmetic — exact cross-engine.
    "q_dup_spans" ->
      s"""WITH tk AS (SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
         |  FROM documents),
         |sh AS (SELECT doc_id,
         |    unnest(range(0, greatest(len(tk) - 2, 0))) AS pos,
         |    unnest(list_transform(range(0, greatest(len(tk) - 2, 0)),
         |      i -> concat_ws(' ', tk[i+1], tk[i+2], tk[i+3]))) AS shingle
         |  FROM tk),
         |rare AS (SELECT shingle FROM (
         |    SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1)
         |  WHERE df <= 5),
         |an AS (SELECT s.doc_id, s.pos, s.shingle FROM sh s JOIN rare USING (shingle)),
         |isl AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    a.pos - b.pos AS diag, a.pos AS pos1,
         |    a.pos - row_number() OVER (PARTITION BY a.doc_id, b.doc_id, a.pos - b.pos
         |      ORDER BY a.pos) AS isl
         |  FROM an a JOIN an b USING (shingle) WHERE a.doc_id < b.doc_id),
         |sp AS (SELECT id1, id2, count(*) + 2 AS span_tokens
         |  FROM isl GROUP BY id1, id2, diag, isl
         |  HAVING count(*) + 2 >= 5)
         |SELECT id1, id2, CAST(max(span_tokens) AS BIGINT) AS max_span_tokens,
         |  CAST(count(*) AS BIGINT) AS n_spans
         |FROM sp GROUP BY id1, id2 ORDER BY id1, id2""".stripMargin,

    "q_dedup_survivors" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id IN (
         |  SELECT min(doc_id) FROM documents
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
         |ORDER BY doc_id""".stripMargin,

    // Replays segmentDedup verbatim: normalized tokens, non-overlapping
    // 4-token segments (final partial kept), md5 fingerprint, distinct-doc
    // frequency >= 2 -> hot, hot segments removed everywhere, survivors
    // rejoined in position order (string_agg ORDER BY; coalesce mirrors
    // Spark's concat_ws('') on an all-hot doc). Whitespace-only docs have
    // no segments and are absent on both sides.
    "q_segment_dedup" -> segmentDedupSql("", segTokens = 4, minDf = 2),

    // The SAME replay restricted to the odd-id batch — the incremental
    // path's spec-asserted equivalence target, stated directly (shared
    // builder, so the two replays cannot diverge).
    "q_segment_dedup_incremental" ->
      segmentDedupSql("WHERE doc_id % 2 = 1", segTokens = 4, minDf = 2),

    "q_neardup_survivors" ->
      // survivors = docs that are their own cluster representative under
      // the same gaps-and-islands clustering as q_neardup_clusters
      s"""WITH sh AS (SELECT doc_id, list_distinct(string_split(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS s
         |  FROM documents),
         |linked AS (SELECT a.doc_id AS id,
         |    (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |     / len(list_distinct(list_concat(a.s, b.s))) >= 0.75) AS l
         |  FROM sh a JOIN sh b ON a.doc_id = b.doc_id + 1),
         |cl AS (SELECT d.doc_id,
         |    max(CASE WHEN NOT coalesce(l.l, FALSE) THEN d.doc_id END)
         |      OVER (ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster
         |  FROM documents d LEFT JOIN linked l ON l.id = d.doc_id)
         |SELECT d.doc_id, d.lang, d.n_chars
         |FROM documents d JOIN cl ON d.doc_id = cl.doc_id
         |WHERE cl.doc_id = cl.cluster
         |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_incremental" ->
      // Same batch construction; base-fingerprint anti-filter + min-id
      // keep-first within the remainder.
      s"""WITH basefp AS (SELECT DISTINCT
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, text
         |  FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text || ' v2' AS text
         |  FROM documents WHERE doc_id % 3 = 1
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, text || ' v2' AS text
         |  FROM documents WHERE doc_id % 3 = 1),
         |bf AS (SELECT doc_id, text,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM batch),
         |fresh AS (SELECT * FROM bf WHERE fp NOT IN (SELECT fp FROM basefp)),
         |keep AS (SELECT min(doc_id) AS doc_id FROM fresh GROUP BY fp)
         |SELECT f.doc_id, f.text FROM fresh f JOIN keep USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_neardup_quality" ->
      // Same gaps-and-islands clustering; keeper = rank-1 by n_chars desc
      // within the cluster, min doc_id across rank-1 ties.
      s"""WITH sh AS (SELECT doc_id, list_distinct(string_split(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS s
         |  FROM documents),
         |linked AS (SELECT a.doc_id AS id,
         |    (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |     / len(list_distinct(list_concat(a.s, b.s))) >= 0.75) AS l
         |  FROM sh a JOIN sh b ON a.doc_id = b.doc_id + 1),
         |cl AS (SELECT d.doc_id, d.n_chars,
         |    max(CASE WHEN NOT coalesce(l.l, FALSE) THEN d.doc_id END)
         |      OVER (ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster
         |  FROM documents d LEFT JOIN linked l ON l.id = d.doc_id),
         |rk AS (SELECT doc_id, cluster,
         |    rank() OVER (PARTITION BY cluster ORDER BY n_chars DESC) AS rk
         |  FROM cl),
         |best AS (SELECT min(doc_id) AS keep FROM rk WHERE rk = 1 GROUP BY cluster)
         |SELECT d.doc_id, d.lang, d.n_chars
         |FROM documents d JOIN best ON d.doc_id = best.keep
         |ORDER BY d.doc_id""".stripMargin,

    "q_neardup_clusters" ->
      s"""WITH sh AS (SELECT doc_id, list_distinct(string_split(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS s
         |  FROM documents),
         |linked AS (SELECT a.doc_id AS id,
         |    (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |     / len(list_distinct(list_concat(a.s, b.s))) >= 0.75) AS l
         |  FROM sh a JOIN sh b ON a.doc_id = b.doc_id + 1)
         |SELECT d.doc_id,
         |  max(CASE WHEN NOT coalesce(l.l, FALSE) THEN d.doc_id END)
         |    OVER (ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster
         |FROM documents d LEFT JOIN linked l ON l.id = d.doc_id
         |ORDER BY doc_id""".stripMargin,

    // identical replay — the twin differs only in which engine path
    // (driver union-find vs distributed propagation) computes the same
    // connected components
    "q_neardup_clusters_dist" ->
      s"""WITH sh AS (SELECT doc_id, list_distinct(string_split(
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS s
         |  FROM documents),
         |linked AS (SELECT a.doc_id AS id,
         |    (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |     / len(list_distinct(list_concat(a.s, b.s))) >= 0.75) AS l
         |  FROM sh a JOIN sh b ON a.doc_id = b.doc_id + 1)
         |SELECT d.doc_id,
         |  max(CASE WHEN NOT coalesce(l.l, FALSE) THEN d.doc_id END)
         |    OVER (ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster
         |FROM documents d LEFT JOIN linked l ON l.id = d.doc_id
         |ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      s"""WITH tk AS (SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
         |  FROM documents),
         |sh AS (SELECT doc_id,
         |    unnest(list_transform(range(0, greatest(len(tk) - 1, 0)),
         |      i -> concat_ws(' ', tk[i+1], tk[i+2]))) AS shingle
         |  FROM tk),
         |hot AS (SELECT shingle FROM (
         |    SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1)
         |  WHERE df >= 35),
         |an AS (SELECT s.doc_id,
         |    CASE WHEN h.shingle IS NULL THEN 0 ELSE 1 END AS hot
         |  FROM sh s LEFT JOIN hot h USING (shingle))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(hot) AS BIGINT) AS n_hot,
         |  round(CAST(sum(hot) AS DOUBLE) / count(*), 6) AS hot_ratio
         |FROM an GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_source_mix" ->
      s"""WITH corpus AS (
         |  SELECT source, n_chars,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents
         |  UNION ALL
         |  SELECT 'syndicated' AS source, n_chars,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents WHERE doc_id % 7 = 0),
         |dup AS (SELECT fp FROM (
         |    SELECT fp, count(*) AS n FROM corpus GROUP BY 1) WHERE n >= 2),
         |j AS (SELECT c.source, c.n_chars,
         |    CASE WHEN d.fp IS NULL THEN 0 ELSE 1 END AS is_dup
         |  FROM corpus c LEFT JOIN dup d USING (fp))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
         |  round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_ratio,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  round(CAST(sum(n_chars) AS DOUBLE)
         |    / (SELECT sum(n_chars) FROM corpus), 6) AS char_share
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "q_text_stats" ->
      // n_tokens mirrors tokens() exactly (empty tokens filtered), with the
      // same n_tokens=0 / n_chars=0 → 0.0 guards the Spark projection has —
      // so texts with \t/\n edges or whitespace-only bodies stay cross-engine
      // equal no matter what corpus the driver regenerates.
      s"""WITH tk AS (SELECT doc_id, text,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> t <> '')) AS n_tokens
         |  FROM documents)
         |SELECT doc_id,
         |  length(text) AS n_chars_calc,
         |  n_tokens,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / n_tokens ELSE 0.0 END AS mean_token_len,
         |  CASE WHEN length(text) > 0
         |    THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE)
         |      / length(text) ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN length(text) > 0
         |    THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |      / length(text) ELSE 0.0 END AS digit_ratio,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> t <> '' AND t IN $stopIn)) AS DOUBLE)
         |      / n_tokens ELSE 0.0 END AS stopword_ratio
         |FROM tk ORDER BY doc_id""".stripMargin,

    "q_lang_id" -> langIdSql,

    "q_bpe_merges" -> bpeMergesSql(8),
    "q_bpe_encode" -> bpeEncodeSql(8),

    "q_vocab_topk" ->
      // t <> '' mirrors Spark's empty-array semantics for whitespace-only
      // docs (DuckDB's split of '' yields [''], Spark's tokens() yields [])
      s"""SELECT t AS token, count(*) AS cnt
         |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |      FROM documents)
         |WHERE t <> ''
         |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100""".stripMargin,

    "q_vocab_coverage" ->
      // Same tokenizer + bigram formation as q_bigram_ppl; rank over the
      // distinct-piece table, head mass per k by rank cutoff, one total.
      s"""WITH tk AS (SELECT
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      y -> y <> '') AS t
         |  FROM documents),
         |tc AS (SELECT bg AS piece, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_transform(range(0, len(t) - 1),
         |      i -> concat_ws(' ', t[i+1], t[i+2]))) AS bg
         |    FROM tk WHERE len(t) >= 2)
         |  GROUP BY 1),
         |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS r FROM tc),
         |ks AS (SELECT unnest([10, 100, 1000]) AS k)
         |SELECT CAST(ks.k AS INTEGER) AS k,
         |  (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM rk WHERE r <= ks.k) AS head_mass,
         |  (SELECT CAST(sum(cnt) AS BIGINT) FROM tc) AS total_mass,
         |  round((SELECT coalesce(sum(cnt), 0) FROM rk WHERE r <= ks.k)
         |    / (SELECT CAST(sum(cnt) AS DOUBLE) FROM tc), 6) AS coverage
         |FROM ks ORDER BY k""".stripMargin,

    "q_bpe_vocab" ->
      // Same extraction pattern as TextStats.BpeTokenPattern, verbatim —
      // extraction (unlike the historical lookaround split) is RE2-safe.
      s"""SELECT p AS piece, count(*) AS cnt
         |FROM (SELECT unnest(regexp_extract_all(text,
         |        '${graft.text.TextStats.BpeTokenPattern}')) AS p
         |      FROM documents)
         |GROUP BY 1 ORDER BY cnt DESC, piece LIMIT 100""".stripMargin,

    "q_pii_scrub" -> {
      val email = graft.text.TextStats.EmailPattern
      val ip = graft.text.TextStats.Ipv4Pattern
      s"""WITH pii AS (SELECT doc_id,
         |  substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |    || '.7 end' AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS INTEGER) AS n_ips,
         |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
         |    '$ip', '<IP>', 'g') AS scrubbed
         |FROM pii ORDER BY doc_id""".stripMargin
    },

    "q_fluency" ->
      s"""WITH tk AS (SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
         |  FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(tk) - 1),
         |    i -> tk[i+1] || ' ' || tk[i+2])) AS bg FROM tk),
         |fr AS (SELECT bg, count(*) AS f FROM bg GROUP BY 1)
         |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(f) AS DOUBLE) / count(*), 6) AS fluency
         |FROM bg b JOIN fr USING (bg)
         |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      s"""WITH tf AS (
         |  SELECT doc_id, t AS tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |        FROM documents)
         |  WHERE t <> '' GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(max(c) AS BIGINT) AS max_tf,
         |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS distinct_ratio,
         |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_share
         |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, len(tk) - 2),
         |    i -> concat_ws(' ', tk[i+1], tk[i+2], tk[i+3])))) AS shingle
         |  FROM (SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
         |    FROM documents)),
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM sh s JOIN bench b USING (shingle)
         |WHERE s.doc_id >= 20
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    "q_mm_meta" ->
      // duration mirrors syntheticAssets' length(text)*10 (CHARACTER
      // length), n_bytes the binary payload's octet length
      s"""SELECT doc_id AS asset_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         |  64 AS width, 16000 AS sample_rate,
         |  CAST(length(text) * 10 AS BIGINT) AS duration_ms
         |FROM documents ORDER BY asset_id""".stripMargin,

    // Closed form of the probed metadata per modality: PNG/Y4M are 4x4;
    // WAV is 256 samples @ 8 kHz (512 B / 16000 Bps = 32 ms); Y4M is
    // 2 frames @ 25 fps = 80 ms.
    "q_mm_probe" ->
      s"""SELECT doc_id AS asset_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'y4m' END AS format,
         |  CASE WHEN doc_id % 3 = 1 THEN NULL ELSE 4 END AS width,
         |  CASE WHEN doc_id % 3 = 1 THEN NULL ELSE 4 END AS height,
         |  CASE WHEN doc_id % 3 = 1 THEN 8000 ELSE NULL END AS sample_rate,
         |  CASE doc_id % 3 WHEN 1 THEN CAST(32 AS BIGINT) WHEN 2 THEN CAST(80 AS BIGINT)
         |    ELSE NULL END AS duration_ms
         |FROM documents ORDER BY asset_id""".stripMargin,

    // Same closed form over the static doc_id % 5 slice — certifies the
    // sampled-certification formula the SF-gated main row applies at
    // builder scale (mediaCertDocs).
    "q_mm_probe_sampled" ->
      s"""SELECT doc_id AS asset_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'y4m' END AS format,
         |  CASE WHEN doc_id % 3 = 1 THEN NULL ELSE 4 END AS width,
         |  CASE WHEN doc_id % 3 = 1 THEN NULL ELSE 4 END AS height,
         |  CASE WHEN doc_id % 3 = 1 THEN 8000 ELSE NULL END AS sample_rate,
         |  CASE doc_id % 3 WHEN 1 THEN CAST(32 AS BIGINT) WHEN 2 THEN CAST(80 AS BIGINT)
         |    ELSE NULL END AS duration_ms
         |FROM documents WHERE doc_id % 5 = 0 ORDER BY asset_id""".stripMargin,

    // Replays the media-fixture formulas (Multimodal.imagePixel/audioSample/
    // videoLumaPx) and the decoders' feature math: image/video are one
    // pixel per grid cell (4×4 @ dim 16), audio is 8 blocks of 32 samples
    // → (RMS, zero-crossing-rate) pairs. Each float op mirrors the JVM op
    // order exactly; RMS partial sums are dyadic rationals (x²/2³⁰,
    // |x| ≤ 10⁴) so summation order cannot matter.
    "q_phash" ->
      s"""WITH ${phashCtes("")}
         |SELECT asset_id, dhash FROM dh ORDER BY asset_id""".stripMargin,

    "q_phash_pairs" ->
      s"""WITH ${phashCtes("")}
         |SELECT CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming,
         |  count(*) AS n_pairs
         |FROM dh a JOIN dh b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
         |GROUP BY 1 ORDER BY hamming""".stripMargin,

    // PNG-side dHash replayed exactly (same CTEs as q_phash); the JPEG
    // bound flags are the oracle-stated contract: literal 1.
    "q_mm_jpeg" ->
      s"""WITH ${phashCtes("")}
         |SELECT asset_id, dhash,
         |  CAST(1 AS BIGINT) AS jpeg_decoded,
         |  CAST(1 AS BIGINT) AS dev_ok,
         |  CAST(1 AS BIGINT) AS hamming_ok
         |FROM dh ORDER BY asset_id""".stripMargin,

    // Static doc_id % 5 slice of the jpeg certification (see
    // q_mm_probe_sampled's rationale).
    "q_mm_jpeg_sampled" ->
      s"""WITH ${phashCtes("")}
         |SELECT asset_id, dhash,
         |  CAST(1 AS BIGINT) AS jpeg_decoded,
         |  CAST(1 AS BIGINT) AS dev_ok,
         |  CAST(1 AS BIGINT) AS hamming_ok
         |FROM dh WHERE asset_id % 5 = 0 ORDER BY asset_id""".stripMargin,

    "q_mm_adpcm" ->
      // first_sample replays adpcmSamples' closed-form s(0); the codec
      // bounds are literal-1 flags (jpegParity pattern).
      s"""SELECT doc_id AS asset_id,
         |  CAST(((doc_id * 7919) % 4001) - 2000 AS BIGINT) AS first_sample,
         |  CAST(1 AS BIGINT) AS decoded,
         |  CAST(1 AS BIGINT) AS n_ok,
         |  CAST(1 AS BIGINT) AS first_exact,
         |  CAST(1 AS BIGINT) AS dev_ok
         |FROM documents WHERE doc_id % 3 = 1
         |ORDER BY asset_id""".stripMargin,

    // Static doc_id % 5 slice of the ADPCM certification (see
    // q_mm_probe_sampled's rationale).
    "q_mm_adpcm_sampled" ->
      s"""SELECT doc_id AS asset_id,
         |  CAST(((doc_id * 7919) % 4001) - 2000 AS BIGINT) AS first_sample,
         |  CAST(1 AS BIGINT) AS decoded,
         |  CAST(1 AS BIGINT) AS n_ok,
         |  CAST(1 AS BIGINT) AS first_exact,
         |  CAST(1 AS BIGINT) AS dev_ok
         |FROM documents WHERE doc_id % 3 = 1 AND doc_id % 5 = 0
         |ORDER BY asset_id""".stripMargin,

    "q_ahash" ->
      s"""WITH $AhashCtes
         |SELECT asset_id, ahash FROM ah ORDER BY asset_id""".stripMargin,

    "q_ahash_pairs" ->
      s"""WITH $AhashCtes
         |SELECT CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming,
         |  count(*) AS n_pairs
         |FROM ah a JOIN ah b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
         |GROUP BY 1 ORDER BY hamming""".stripMargin,

    "q_vhash" ->
      s"""WITH $VhashCtes
         |SELECT asset_id, vhash FROM vh ORDER BY asset_id""".stripMargin,

    "q_vhash_pairs" ->
      s"""WITH $VhashCtes
         |SELECT CAST(bit_count(xor(a.vhash, b.vhash)) AS INTEGER) AS hamming,
         |  count(*) AS n_pairs
         |FROM vh a JOIN vh b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.vhash, b.vhash)) <= 4
         |GROUP BY 1 ORDER BY hamming""".stripMargin,

    "q_mm_features_real" ->
      s"""WITH p AS (SELECT CAST(i AS INTEGER) AS pos FROM range(16) t(i)),
         |img AS (
         |  SELECT doc_id, pos,
         |    CAST((0.299*v + 0.587*v + 0.114*v)/255.0 AS FLOAT) AS f
         |  FROM (SELECT doc_id, pos, (doc_id*131 + pos*17) % 256 AS v
         |        FROM documents, p WHERE doc_id % 3 = 0)),
         |vid AS (
         |  SELECT doc_id, pos, CAST(y/255.0 AS FLOAT) AS f
         |  FROM (SELECT doc_id, pos, (doc_id*37 + pos*13) % 256 AS y
         |        FROM documents, p WHERE doc_id % 3 = 2)),
         |smp AS (
         |  SELECT d.doc_id, s.i,
         |    ((d.doc_id*7919 + s.i*104729) % 20001) - 10000 AS x
         |  FROM documents d, range(256) s(i) WHERE d.doc_id % 3 = 1),
         |blk AS (
         |  SELECT doc_id, CAST(i // 32 AS INTEGER) AS b,
         |    sqrt(sum((x/32768.0)*(x/32768.0)) / 32.0) AS rms,
         |    sum(CASE WHEN i % 32 > 0 AND ((x >= 0) <>
         |      (((doc_id*7919 + (i-1)*104729) % 20001) - 10000 >= 0))
         |      THEN 1 ELSE 0 END) AS z
         |  FROM smp GROUP BY doc_id, b),
         |aud AS (
         |  SELECT doc_id, 2*b AS pos, CAST(rms AS FLOAT) AS f FROM blk
         |  UNION ALL
         |  SELECT doc_id, 2*b + 1 AS pos, CAST(z/32.0 AS FLOAT) AS f FROM blk)
         |SELECT doc_id AS asset_id, CAST(pos AS INTEGER) AS pos,
         |  round(CAST(f AS DOUBLE), 6) AS feat
         |FROM (SELECT * FROM img UNION ALL SELECT * FROM aud
         |      UNION ALL SELECT * FROM vid)
         |ORDER BY asset_id, pos""".stripMargin,

    "q_mm_index" ->
      // The whole persisted media index vs the three modality formula
      // replays at once (prefixed CTE chains so one WITH clause carries
      // all three); every asset decodes (real containers), features are
      // always dim 16, and a fresh build is all generation 0.
      s"""WITH ${phashCtes("p_")},
         |${ahashCtes("a_")},
         |${vhashCtes("v_")}
         |SELECT d.doc_id AS asset_id,
         |  CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |    ELSE 'video' END AS modality,
         |  ph.dhash, ah.ahash, vh.vhash,
         |  CAST(16 AS INTEGER) AS n_feat, CAST(0 AS BIGINT) AS gen
         |FROM documents d
         |  LEFT JOIN p_dh ph ON ph.asset_id = d.doc_id
         |  LEFT JOIN a_ah ah ON ah.asset_id = d.doc_id
         |  LEFT JOIN v_vh vh ON vh.asset_id = d.doc_id
         |ORDER BY asset_id""".stripMargin,

    "q_mm_index_append" ->
      // Build/append generations: base = pmod(doc_id,10) < 7 at gen 0,
      // batch at gen 1; every real-container payload decodes, so
      // n_hashed = n per group.
      s"""SELECT
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |    ELSE 'video' END AS modality,
         |  CAST(CASE WHEN doc_id % 10 < 7 THEN 0 ELSE 1 END AS BIGINT) AS gen,
         |  count(*) AS n, count(*) AS n_hashed
         |FROM documents WHERE doc_id < 3000
         |GROUP BY 1, 2 ORDER BY modality, gen""".stripMargin,

    "q_doc_stats" ->
      s"""SELECT lang, count(*) AS cnt, round(avg(n_chars), 6) AS avg_chars,
         |  median(n_chars) AS median_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_embed_norm" ->
      s"""SELECT vec_id, round(sqrt((
         |  SELECT sum(CAST(embedding[CAST(p.pos AS INTEGER)] AS DOUBLE)
         |           * CAST(embedding[CAST(p.pos AS INTEGER)] AS DOUBLE))
         |  FROM generate_series(1, 64) p(pos))), 6) AS l2_norm
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_minhash_lsh_md5" -> minhashMd5Sql,

    "q_ann_mp_md5" ->
      s"""WITH ${annBucketMd5Cte(4)},
         |qsel AS (SELECT vec_id FROM embeddings WHERE vec_id < 10),
         |flips AS (
         |  SELECT p.vec_id, p.p,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY abs(pr), p.p) AS rk
         |  FROM proj p JOIN qsel USING (vec_id)),
         |qb AS (
         |  SELECT b.vec_id AS qid, b.bucket
         |  FROM bkt b JOIN qsel USING (vec_id)
         |  UNION ALL
         |  SELECT f.vec_id AS qid,
         |    CAST(xor(b.bucket, CAST(1 AS BIGINT) << f.p) AS BIGINT) AS bucket
         |  FROM flips f JOIN bkt b USING (vec_id) WHERE f.rk <= 2),
         |q AS (SELECT qb.qid, e.embedding AS qv, qb.bucket
         |  FROM qb JOIN embeddings e ON e.vec_id = qb.qid),
         |c AS (SELECT e.vec_id, e.embedding, b.bucket
         |  FROM embeddings e JOIN bkt b USING (vec_id)),
         |scored AS (
         |  SELECT q.qid, c.vec_id,
         |    round(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
         |  FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.qid)
         |SELECT qid, vec_id, cosine, CAST(rank AS INTEGER) AS rank
         |FROM scored WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    "q_ann_lsh_md5" ->
      s"""WITH ${annBucketMd5Cte(4)},
         |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, b.bucket
         |  FROM embeddings e JOIN bkt b USING (vec_id) WHERE e.vec_id < 10),
         |c AS (SELECT e.vec_id, e.embedding, b.bucket
         |  FROM embeddings e JOIN bkt b USING (vec_id)),
         |scored AS (
         |  SELECT q.qid, c.vec_id,
         |    round(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
         |  FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.qid)
         |SELECT qid, vec_id, cosine, CAST(rank AS INTEGER) AS rank
         |FROM scored WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_cosine_neardup_md5" ->
      // AUTO-BITS (round 11): replays Ann.cosineNearDupAuto — b = min bits
      // with 64·2^b >= count(*) (the q_semdedup integer rule), the b-bit
      // md5-plane sign-LSH bucket per vector, then the bucket-keyed pair
      // join at the same threshold.
      s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
         |bb AS (SELECT coalesce(min(b), 32) AS bits FROM generate_series(0, 32) s(b), nn
         |  WHERE ${autoBitsWhere("nn.n")}),
         |fx AS (
         |  SELECT vec_id, CAST(g.i AS INTEGER) AS i,
         |    CAST(floor(CAST(embedding[CAST(g.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS vi
         |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
         |proj AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(sum(vi * (CAST('0x' || substr(md5(concat(p.p, '_', i - 1)), 1, 6) AS BIGINT) - 8388608)) AS BIGINT) AS pr
         |  FROM fx CROSS JOIN generate_series(0, 31) p(p), bb
         |  WHERE p.p < bb.bits
         |  GROUP BY vec_id, p.p),
         |bkt AS (
         |  SELECT vec_id, CAST(sum(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id),
         |e AS (SELECT emb.vec_id, emb.embedding, CAST(coalesce(k.bucket, 0) AS BIGINT) AS bucket
         |  FROM embeddings emb LEFT JOIN bkt k USING (vec_id))
         |SELECT a.vec_id AS id1, b2.vec_id AS id2,
         |  round(list_cosine_similarity(a.embedding::DOUBLE[], b2.embedding::DOUBLE[]), 6) AS cosine
         |FROM e a JOIN e b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |  AND list_cosine_similarity(a.embedding::DOUBLE[], b2.embedding::DOUBLE[]) >= 0.15
         |ORDER BY id1, id2""".stripMargin,

    "q_simhash_md5" ->
      s"""SELECT doc_id, ${Simhash32Terms} AS simhash32
         |FROM ($TokenMd5Sql)
         |ORDER BY doc_id""".stripMargin,

    "q_simhash32_saturation" ->
      // fixed 2000-doc slice — same cap as the Spark side (round-10 bound)
      s"""WITH fp AS (SELECT doc_id, ${Simhash32Terms} AS sh
         |  FROM (${tokenMd5Sql(" WHERE doc_id < 2000")}))
         |SELECT CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming,
         |  count(*) AS n_pairs
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3
         |GROUP BY 1 ORDER BY hamming""".stripMargin,

    "q_simhash_hamming" ->
      s"""WITH fp AS (SELECT doc_id, ${Simhash32Terms} AS sh FROM ($TokenMd5Sql))
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
         |FROM fp a JOIN fp b ON b.doc_id = a.doc_id + 1
         |ORDER BY id1""".stripMargin,

    "q_banding_capacity" ->
      s"""WITH fp AS (SELECT doc_id, ${Simhash32Terms} AS sh FROM ($TokenMd5Sql)),
         |d AS (SELECT sh, count(*) AS cnt FROM fp GROUP BY sh),
         |b AS (SELECT CAST(t.i AS INTEGER) AS band,
         |    (sh >> CAST(t.i * 8 AS INTEGER)) & 255 AS bv
         |  FROM d, range(4) t(i)),
         |g AS (SELECT band, bv, count(*) AS n FROM b GROUP BY 1, 2)
         |SELECT band, count(*) AS n_buckets,
         |  CAST(max(n) AS BIGINT) AS max_bucket,
         |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS candidates
         |FROM g GROUP BY band ORDER BY band""".stripMargin,

    "q_simhash64" ->
      s"""SELECT doc_id, ${Simhash64Terms} AS simhash64
         |FROM ($TokenMd5Sql)
         |ORDER BY doc_id""".stripMargin,

    "q_simhash_pairs" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text
         |  FROM documents WHERE doc_id % 7 = 0),
         |tm AS (SELECT doc_id,
         |  list_transform(list_filter(string_split_regex(trim(lower(text)),
         |      '\\s+'), y -> y <> ''),
         |    t -> md5(t)) AS m
         |  FROM corpus),
         |fp AS (SELECT doc_id, ${Simhash64Terms} AS sh FROM tm)
         |SELECT CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming,
         |  count(*) AS n_pairs
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 4
         |GROUP BY 1 ORDER BY hamming""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" -> jaccardSql,

    "q_ann_brute" -> annBruteSql,

    // Identical to q_ann_brute's replay (the SAME string — a future fix
    // to the brute replay cannot miss the twin): with the shortlist
    // covering the corpus the PCA path degenerates to exact search, so
    // the oracle needs no eigenbasis.
    "q_ann_pca_exact" -> annBruteSql,

    // Exact query count; the measured recall floor as a literal 1
    // (q_sketch_bounds pattern — a recall collapse flips the Spark flag).
    "q_ann_pca" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(1 AS BIGINT) AS recall_floor_ok
         |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q_semdedup_fixedk" ->
      // Replays the q_ann_ivf coarse quantizer (6-dp label centroids,
      // cosine-nearest cell with ascending-cell tiebreak), then the
      // within-cell pair prune: drop any vector with a smaller-id
      // same-cell neighbor at cosine >= 0.30.
      // emb CTE = the fixed 1000-vector slice — same cap as the Spark
      // side (round-10 bound); the quantizer's label centroids are fit
      // on the SAME slice, matching Ann.semDedup over the filtered frame
      s"""WITH emb AS (SELECT * FROM embeddings WHERE vec_id < 1000),
         |cent AS (
         |  SELECT label, CAST(p.pos - 1 AS INTEGER) AS pos,
         |    round(avg(CAST(embedding[CAST(p.pos AS INTEGER)] AS DOUBLE)), 6) AS mean_v
         |  FROM emb CROSS JOIN generate_series(1, 64) p(pos)
         |  GROUP BY label, p.pos),
         |cvec AS (SELECT CAST(label AS VARCHAR) AS cell,
         |    list(mean_v ORDER BY pos) AS cvec
         |  FROM cent GROUP BY label),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) DESC, c.cell) AS rk
         |  FROM emb e CROSS JOIN cvec c),
         |cells AS (SELECT vec_id, embedding, cell FROM assign WHERE rk = 1),
         |drp AS (SELECT DISTINCT b.vec_id
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.30)
         |SELECT c.vec_id, c.cell FROM cells c
         |WHERE c.vec_id NOT IN (SELECT vec_id FROM drp)
         |ORDER BY c.vec_id""".stripMargin,

    "q_table_profile" -> {
      // One UNION ALL branch per orders column (the oracle may scan
      // per-column; the Spark side is the one-aggregate shape). Means
      // replay the decimal-grid sum with the identical division order;
      // timestamps profile as epoch seconds.
      def num(name: String, dtype: String, expr: String) =
        s"""SELECT '$name' AS col_name, '$dtype' AS dtype,
           |  count(*) AS n_rows,
           |  count(*) - count($expr) AS n_nulls,
           |  count(DISTINCT $expr) AS n_distinct,
           |  round(min(CAST($expr AS DOUBLE)), 6) AS min_num,
           |  round(max(CAST($expr AS DOUBLE)), 6) AS max_num,
           |  round(CAST(sum(CAST(floor(CAST($expr AS DOUBLE) * 1000000) AS DECIMAL(38,0))) AS DOUBLE)
           |    / 1000000.0 / count($expr), 6) AS mean_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(name: String) =
        s"""SELECT '$name' AS col_name, 'string' AS dtype,
           |  count(*) AS n_rows,
           |  count(*) - count($name) AS n_nulls,
           |  count(DISTINCT $name) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  CAST(NULL AS DOUBLE) AS mean_num,
           |  min($name) AS min_str, max($name) AS max_str
           |FROM orders""".stripMargin
      Seq(
        num("o_orderkey", "bigint", "o_orderkey"),
        num("o_custkey", "bigint", "o_custkey"),
        str("o_orderstatus"),
        num("o_totalprice", "double", "o_totalprice"),
        num("o_orderdate", "timestamp_ntz", "epoch(o_orderdate)"),
        str("o_orderpriority")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_embed_drift" ->
      // Same 1e-6 grid, same conditional-sum aggregate, same op order on
      // the two divisions and the delta subtraction.
      s"""WITH fx AS (
         |  SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS r,
         |    CAST(g.i - 1 AS INTEGER) AS pos,
         |    CAST(floor(CAST(embedding[CAST(g.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
         |ag AS (SELECT pos,
         |    CAST(sum(CASE WHEN r = 1 THEN v ELSE 0 END) AS BIGINT) AS sr,
         |    CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN r = 0 THEN v ELSE 0 END) AS BIGINT) AS sc,
         |    CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         |  FROM fx GROUP BY pos)
         |SELECT pos,
         |  round(CAST(sr AS DOUBLE) / n_ref / 1000000.0, 6) AS mean_ref,
         |  round(CAST(sc AS DOUBLE) / n_cur / 1000000.0, 6) AS mean_cur,
         |  round(CAST(sc AS DOUBLE) / n_cur / 1000000.0
         |    - CAST(sr AS DOUBLE) / n_ref / 1000000.0, 6) AS delta,
         |  n_ref, n_cur
         |FROM ag ORDER BY pos""".stripMargin,

    "q_semdedup" ->
      // PRIMARY row (auto-k). Replays Ann.semDedupAuto: b = min bits with
      // 64·2^b >= count(*) (integer inequality, no float log2), the b-bit
      // md5-plane sign-LSH bucket per vector (exact integer projections,
      // identical to annBucketMd5Cte but with the plane range bounded by
      // the computed b), then the same within-cell min-id prune as
      // q_semdedup_fixedk.
      s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
         |bb AS (SELECT coalesce(min(b), 32) AS bits FROM generate_series(0, 32) s(b), nn
         |  WHERE ${autoBitsWhere("nn.n")}),
         |fx AS (
         |  SELECT vec_id, CAST(g.i AS INTEGER) AS i,
         |    CAST(floor(CAST(embedding[CAST(g.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS vi
         |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
         |proj AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(sum(vi * (CAST('0x' || substr(md5(concat(p.p, '_', i - 1)), 1, 6) AS BIGINT) - 8388608)) AS BIGINT) AS pr
         |  FROM fx CROSS JOIN generate_series(0, 31) p(p), bb
         |  WHERE p.p < bb.bits
         |  GROUP BY vec_id, p.p),
         |bkt AS (
         |  SELECT vec_id, CAST(sum(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id),
         |cells AS (
         |  SELECT e.vec_id, e.embedding, CAST(coalesce(k.bucket, 0) AS BIGINT) AS cell
         |  FROM embeddings e LEFT JOIN bkt k USING (vec_id)),
         |drp AS (SELECT DISTINCT b.vec_id
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.30)
         |SELECT c.vec_id, c.cell FROM cells c
         |WHERE c.vec_id NOT IN (SELECT vec_id FROM drp)
         |ORDER BY c.vec_id""".stripMargin,

    "q_semdedup_incremental" ->
      // Replays the full incremental pipeline: index bits frozen at
      // autoBits(base count) (base = vec_id < 250), batch bits
      // max(index, autoBits(batch count)); ONE md5-plane projection at
      // batch bits whose low-bits mask is the index cell (per-plane
      // sign independence); base deduped with the min-id rule at index
      // bits, then incoming dropped on a same-INDEX-cell base survivor
      // OR a smaller-id same-BATCH-cell mate at cosine >= 0.30.
      s"""WITH nb AS (SELECT count(*) AS n FROM embeddings WHERE vec_id < 250),
         |ni AS (SELECT count(*) AS n FROM embeddings WHERE vec_id >= 250),
         |bb AS (SELECT coalesce(min(b), 32) AS bits FROM generate_series(0, 32) s(b), nb
         |  WHERE ${autoBitsWhere("nb.n")}),
         |bi AS (SELECT greatest(bb.bits,
         |    (SELECT coalesce(min(b), 32) FROM generate_series(0, 32) s(b), ni
         |     WHERE ${autoBitsWhere("ni.n")})) AS bits FROM bb),
         |fx AS (
         |  SELECT vec_id, CAST(g.i AS INTEGER) AS i,
         |    CAST(floor(CAST(embedding[CAST(g.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS vi
         |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
         |proj AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(sum(vi * (CAST('0x' || substr(md5(concat(p.p, '_', i - 1)), 1, 6) AS BIGINT) - 8388608)) AS BIGINT) AS pr
         |  FROM fx CROSS JOIN generate_series(0, 31) p(p), bi
         |  WHERE p.p < bi.bits
         |  GROUP BY vec_id, p.p),
         |bkt AS (
         |  SELECT vec_id, CAST(sum(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id),
         |cells AS (
         |  SELECT e.vec_id, e.embedding,
         |    CAST(coalesce(k.bucket, 0) AS BIGINT) & ((CAST(1 AS BIGINT) << bb.bits) - 1) AS cell,
         |    CAST(coalesce(k.bucket, 0) AS BIGINT) AS bcell
         |  FROM embeddings e LEFT JOIN bkt k USING (vec_id), bb),
         |bcells AS (SELECT * FROM cells WHERE vec_id < 250),
         |icells AS (SELECT * FROM cells WHERE vec_id >= 250),
         |bdrp AS (SELECT DISTINCT b.vec_id
         |  FROM bcells a JOIN bcells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.30),
         |bsurv AS (SELECT * FROM bcells
         |  WHERE vec_id NOT IN (SELECT vec_id FROM bdrp)),
         |idrp AS (
         |  SELECT DISTINCT i.vec_id
         |  FROM icells i JOIN bsurv s ON i.cell = s.cell
         |  WHERE list_cosine_similarity(i.embedding::DOUBLE[], s.embedding::DOUBLE[]) >= 0.30
         |  UNION
         |  SELECT DISTINCT b.vec_id
         |  FROM icells a JOIN icells b ON a.bcell = b.bcell AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.30)
         |SELECT c.vec_id, c.cell FROM icells c
         |WHERE c.vec_id NOT IN (SELECT vec_id FROM idrp)
         |ORDER BY c.vec_id""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH cent AS (
         |  SELECT label, CAST(p.pos - 1 AS INTEGER) AS pos,
         |    round(avg(CAST(embedding[CAST(p.pos AS INTEGER)] AS DOUBLE)), 6) AS mean_v
         |  FROM embeddings CROSS JOIN generate_series(1, 64) p(pos)
         |  GROUP BY label, p.pos),
         |cvec AS (SELECT CAST(label AS VARCHAR) AS cell,
         |    list(mean_v ORDER BY pos) AS cvec
         |  FROM cent GROUP BY label),
         |assign AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) DESC, c.cell) AS rk
         |  FROM embeddings e CROSS JOIN cvec c),
         |cells AS (SELECT vec_id, embedding, cell FROM assign WHERE rk = 1),
         |probes AS (
         |  SELECT q.vec_id AS qid, q.embedding AS qv, c.cell,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cvec) DESC, c.cell) AS rk
         |  FROM embeddings q CROSS JOIN cvec c WHERE q.vec_id < 10),
         |pr AS (SELECT qid, qv, cell FROM probes WHERE rk <= 2),
         |scored AS (
         |  SELECT pr.qid, ce.vec_id,
         |    round(list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]), 6) AS cosine,
         |    row_number() OVER (PARTITION BY pr.qid
         |      ORDER BY list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]) DESC, ce.vec_id) AS rank
         |  FROM cells ce JOIN pr ON ce.cell = pr.cell AND ce.vec_id <> pr.qid)
         |SELECT qid, vec_id, cosine, CAST(rank AS INTEGER) AS rank
         |FROM scored WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_ann_ivf_kmeans" -> ivfKmeansSql(k = 8, iters = 2, nprobe = 2, topk = 5),

    "q_ann_ivf_append" -> ivfAppendSql(k = 8, iters = 2, split = 250L),

    "q_random_proj" ->
      s"""WITH fx AS (
         |  SELECT vec_id, CAST(g.i AS INTEGER) AS i,
         |    CAST(floor(CAST(embedding[CAST(g.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS vi
         |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
         |proj AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(sum(vi * (CAST('0x' || substr(md5(concat('rp', p.p, '_', i - 1)), 1, 6) AS BIGINT) - 8388608)) AS BIGINT) AS s
         |  FROM fx CROSS JOIN generate_series(0, 7) p(p)
         |  GROUP BY vec_id, p.p)
         |SELECT vec_id, CAST(p AS INTEGER) AS pos,
         |  CAST(s AS DOUBLE) / (1000000.0 * 8388608.0) AS comp
         |FROM proj ORDER BY vec_id, pos""".stripMargin,

    "q_centroids" ->
      s"""SELECT label, CAST(p.pos - 1 AS INTEGER) AS pos,
         |  round(avg(CAST(embedding[CAST(p.pos AS INTEGER)] AS DOUBLE)), 6) AS mean_v
         |FROM embeddings CROSS JOIN generate_series(1, 64) p(pos)
         |GROUP BY label, p.pos ORDER BY label, pos""".stripMargin,

    "q_unigram_ppl" ->
      // ln carried as exact micro-nat BIGINTs (floor(ln·1e6 + 0.5), probed
      // bit-identical vs Math.log for all counts ≤ 2e6); ssum/n/1e6 is the
      // one final double expression, same op order as the Spark side.
      s"""WITH tk AS (SELECT doc_id, t AS token
         |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
         |      '\\s+')) AS t FROM documents)
         |  WHERE t <> ''),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2),
         |vocab AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c
         |  FROM tf GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
         |sp AS (SELECT token,
         |    CAST(floor(ln(CAST(total AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      - CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      AS surp_micro
         |  FROM vocab, tot),
         |s AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         |    CAST(sum(tf.tf * sp.surp_micro) AS BIGINT) AS ssum
         |  FROM tf JOIN sp USING (token) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  CAST(ssum AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1000000.0
         |    AS mean_surprisal_nats
         |FROM s ORDER BY doc_id""".stripMargin,

    "q_mix_weights" ->
      // sqrt + division are correctly-rounded IEEE ops over exact BIGINT
      // counts — bit-identical cross-engine without rounding.
      s"""WITH tk AS (SELECT source,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      y -> y <> '')) AS nt
         |  FROM documents),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens FROM tk GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
         |    CAST(max(n_tokens) AS BIGINT) AS mt FROM per)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS share,
         |  sqrt(CAST(n_tokens AS DOUBLE)) / sqrt(CAST(mt AS DOUBLE)) AS w_sqrt
         |FROM per, tot ORDER BY source""".stripMargin,

    "q_bigram_ppl" ->
      // Add-1 bigram LM: surp = qln(c1+V) − qln(c12+1) in micro-nat
      // BIGINTs (qln = floor(ln·1e6 + 0.5), exact cross-engine ≤ 2e6);
      // ssum/n/1e6 is the one final double expression, same operand
      // order as the Spark side.
      s"""WITH tk AS (SELECT doc_id,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      y -> y <> '') AS t
         |  FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(t) - 1),
         |      i -> concat_ws(' ', t[i+1], t[i+2]))) AS bg
         |  FROM tk WHERE len(t) >= 2),
         |bf AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf
         |  FROM bg GROUP BY 1, 2),
         |c12 AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c12 FROM bf GROUP BY 1),
         |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c12) AS BIGINT) AS c1
         |  FROM c12 GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
         |  FROM (SELECT unnest(t) AS tok FROM tk)),
         |lm AS (SELECT c12.bg,
         |    CAST(floor(ln(CAST(c1.c1 + vv.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |    - CAST(floor(ln(CAST(c12.c12 + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      AS surp_micro
         |  FROM c12 JOIN c1 ON split_part(c12.bg, ' ', 1) = c1.w1, vv),
         |sm AS (SELECT bf.doc_id, CAST(sum(bf.tf) AS BIGINT) AS n_bigrams,
         |    CAST(sum(bf.tf * lm.surp_micro) AS BIGINT) AS ssum
         |  FROM bf JOIN lm USING (bg) GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |  CAST(ssum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1000000.0
         |    AS mean_surprisal_nats
         |FROM sm ORDER BY doc_id""".stripMargin,

    "q_source_kl" ->
      // KL(source ‖ corpus): four individually-quantized micro-nat log
      // terms, tf-weighted exact BIGINT sum, one final division chain.
      s"""WITH tk AS (SELECT source, t AS token
         |  FROM (SELECT source, unnest(string_split_regex(trim(lower(text)),
         |      '\\s+')) AS t FROM documents)
         |  WHERE t <> ''),
         |gtf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cgt
         |  FROM tk GROUP BY 1, 2),
         |ng AS (SELECT source, CAST(sum(cgt) AS BIGINT) AS ng FROM gtf GROUP BY 1),
         |ct AS (SELECT token, CAST(sum(cgt) AS BIGINT) AS ct FROM gtf GROUP BY 1),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM ct),
         |w AS (SELECT g.source, ng.ng,
         |    g.cgt * (
         |      CAST(floor(ln(CAST(g.cgt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      - CAST(floor(ln(CAST(ng.ng AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      - CAST(floor(ln(CAST(ct.ct AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      + CAST(floor(ln(CAST(tot.n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |    ) AS w
         |  FROM gtf g JOIN ct USING (token) JOIN ng USING (source), tot)
         |SELECT source, CAST(max(ng) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / CAST(max(ng) AS DOUBLE)
         |    / 1000000.0 AS kl_nats
         |FROM w GROUP BY source ORDER BY source""".stripMargin,

    "q_dsir_weights" ->
      // DSIR log-likelihood ratio: add-1 target LM (lang='en') vs corpus
      // LM, micro-nat integer carrying, logw = ssum/1e6 single division.
      s"""WITH tk AS (SELECT doc_id, lang = 'en' AS tg, t AS token
         |  FROM (SELECT doc_id, lang,
         |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |    FROM documents)
         |  WHERE t <> ''),
         |tf AS (SELECT doc_id, tg, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2, 3),
         |cs AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cs FROM tf GROUP BY 1),
         |ctg AS (SELECT token, CAST(sum(tf) AS BIGINT) AS ctg
         |  FROM tf WHERE tg GROUP BY 1),
         |vt AS (SELECT CAST(count(*) AS BIGINT) AS v,
         |    CAST(sum(cs) AS BIGINT) AS ns FROM cs),
         |nt AS (SELECT CAST(coalesce(sum(ctg), 0) AS BIGINT) AS nt FROM ctg),
         |lm AS (SELECT cs.token,
         |    (CAST(floor(ln(CAST(coalesce(ctg.ctg, 0) + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |     - CAST(floor(ln(CAST(nt.nt + vt.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
         |    - (CAST(floor(ln(CAST(cs.cs + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |     - CAST(floor(ln(CAST(vt.ns + vt.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
         |      AS lr_micro
         |  FROM cs LEFT JOIN ctg USING (token), vt, nt),
         |sm AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         |    CAST(sum(tf.tf * lm.lr_micro) AS BIGINT) AS ssum
         |  FROM tf JOIN lm USING (token) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  CAST(ssum AS DOUBLE) / 1000000.0 AS logw_nats
         |FROM sm ORDER BY doc_id""".stripMargin,

    "q_oov_rate" ->
      // Same deterministic top-100 head (count desc, token asc), LEFT
      // join, exact-BIGINT division.
      s"""WITH tk AS (SELECT doc_id, t AS token
         |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
         |      '\\s+')) AS t FROM documents)
         |  WHERE t <> ''),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2),
         |vocab AS (SELECT token FROM (
         |  SELECT token, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1
         |  ORDER BY c DESC, token LIMIT 100)),
         |agg AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         |    CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN tf.tf END), 0)
         |      AS BIGINT) AS n_oov
         |  FROM tf LEFT JOIN vocab v USING (token) GROUP BY 1)
         |SELECT doc_id, n_tokens, n_oov,
         |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
         |FROM agg ORDER BY doc_id""".stripMargin,

    "q_char_entropy" ->
      // Code-point split on both sides (BMP-only corpus: code point ≡
      // UTF-16 unit); micro-nat integer numerator, one division chain.
      // length(text) > 0 mirrors the Spark side's empty-doc absence —
      // DuckDB's string_split('', '') is [''] (one empty element), which
      // would otherwise fabricate a row Spark never emits.
      s"""WITH cf AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
         |    FROM documents WHERE length(text) > 0)
         |  GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS ssum
         |  FROM cf GROUP BY 1)
         |SELECT doc_id, n AS n_chars_cp,
         |  CAST(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      - ssum AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
         |    AS entropy_nats
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_drift_ref" ->
      // Reference LM from even docs, add-1 smoothed over support+OOV
      // (' oov' cannot collide: whitespace tokens never contain spaces);
      // four-term micro-nat surprisal, one final division chain.
      s"""WITH tok AS (SELECT source, r, t AS token
         |  FROM (SELECT source, doc_id % 2 = 0 AS r,
         |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |    FROM documents)
         |  WHERE t <> ''),
         |ref AS (SELECT token, CAST(count(*) AS BIGINT) AS rc
         |  FROM tok WHERE r GROUP BY 1),
         |rt AS (SELECT CAST(coalesce(sum(rc), 0) AS BIGINT) AS nref,
         |    CAST(count(*) AS BIGINT) AS v FROM ref),
         |sc AS (SELECT tok.source,
         |    CASE WHEN ref.token IS NULL THEN ' oov' ELSE tok.token END AS k
         |  FROM tok LEFT JOIN ref ON tok.token = ref.token
         |  WHERE NOT tok.r),
         |kc AS (SELECT source, k, CAST(count(*) AS BIGINT) AS c
         |  FROM sc GROUP BY 1, 2),
         |kcr AS (SELECT kc.source, kc.k, kc.c,
         |    CAST(coalesce(ref.rc, 0) AS BIGINT) AS rc
         |  FROM kc LEFT JOIN ref ON kc.k = ref.token),
         |ng AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |  FROM kcr GROUP BY 1),
         |w AS (SELECT kcr.source, ng.n,
         |    kcr.c * (
         |      CAST(floor(ln(CAST(kcr.c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      - CAST(floor(ln(CAST(ng.n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      - CAST(floor(ln(CAST(kcr.rc + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |      + CAST(floor(ln(CAST(rt.nref + rt.v + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         |    ) AS w
         |  FROM kcr JOIN ng USING (source), rt)
         |SELECT source, CAST(max(n) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / CAST(max(n) AS DOUBLE)
         |    / 1000000.0 AS kl_nats
         |FROM w GROUP BY source ORDER BY source""".stripMargin,

    "q_ngram_novelty" ->
      // Mirrors Dedup.shinglesFromTokens exactly: normTokens (an empty
      // text still yields [''] → one whole-doc shingle), < k tokens →
      // the single joined shingle, else distinct positional 3-grams.
      s"""WITH tk AS (SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
         |  FROM documents),
         |sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) < 3
         |    THEN [array_to_string(tk, ' ')]
         |    ELSE list_distinct(list_transform(range(0, len(tk) - 2),
         |      i -> concat_ws(' ', tk[i+1], tk[i+2], tk[i+3]))) END) AS shingle
         |  FROM tk),
         |fst AS (SELECT shingle, min(doc_id) AS first_id FROM sh GROUP BY 1)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN f.first_id < s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_seen,
         |  CAST(count(*) - sum(CASE WHEN f.first_id < s.doc_id THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novel_frac
         |FROM sh s JOIN fst f USING (shingle)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    "q_quantile_agg" ->
      // Spark `percentile` ≡ DuckDB `quantile_cont` interpolation
      // (q_len_percentiles precedent); one list-arg call per group.
      s"""WITH ev AS (SELECT epoch_us(ts) AS ts_us, value FROM events),
         |b AS (SELECT (ts_us // 600000000) * 600000000 AS bucket_us,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    quantile_cont(value, [0.5, 0.9, 0.99]) AS qs
         |  FROM ev GROUP BY 1)
         |SELECT bucket_us, cnt, round(qs[1], 6) AS q50, round(qs[2], 6) AS q90,
         |  round(qs[3], 6) AS q99
         |FROM b ORDER BY bucket_us""".stripMargin,

    "q_hist_fraction" -> histFractionSql,

    "q_hist_stats" ->
      // sum_est factored as lo·N + w·(S − N/2) with N, S exact BIGINTs —
      // one fixed IEEE expression, no double accumulation either side.
      s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
         |h AS (SELECT least(CAST(floor(((value - lo) * 50) / (hi - lo))
         |      AS BIGINT) + 1, 50) AS bucket, count(*) AS cnt
         |  FROM events, b GROUP BY 1),
         |a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |    CAST(sum(bucket * cnt) AS BIGINT) AS s FROM h)
         |SELECT n,
         |  lo * CAST(n AS DOUBLE) + ((hi - lo) / 50.0)
         |    * (CAST(s AS DOUBLE) - CAST(n AS DOUBLE) * 0.5) AS sum_est,
         |  (lo * CAST(n AS DOUBLE) + ((hi - lo) / 50.0)
         |    * (CAST(s AS DOUBLE) - CAST(n AS DOUBLE) * 0.5))
         |    / CAST(n AS DOUBLE) AS avg_est
         |FROM a, b""".stripMargin,

    "q_bottomk_series" ->
      s"""WITH ev AS ($MilliEvSql),
         |g AS (SELECT ts_us // 3600000000 AS hour_bkt, event_type,
         |    CAST(sum(v) AS BIGINT) AS sum_v FROM ev GROUP BY 1, 2),
         |r AS (SELECT hour_bkt, event_type, sum_v, row_number() OVER (
         |    PARTITION BY hour_bkt ORDER BY sum_v ASC, event_type) AS rk
         |  FROM g)
         |SELECT hour_bkt, event_type, sum_v, CAST(rk AS INTEGER) AS rk
         |FROM r WHERE rk <= 2
         |ORDER BY hour_bkt, rk""".stripMargin,

    "q_quality_logit" ->
      // The identical left-associated linear expression over the same
      // exact integer features: every product dyadic-weight × BIGINT
      // (exact), every add the same correctly-rounded IEEE op — bitwise
      // equality without rounding.
      s"""WITH f AS (SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)),
         |      '\\s+'), y -> y <> '')) AS BIGINT) AS n_tokens,
         |    n_chars,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
         |      AS n_digits,
         |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
         |      AS n_punct
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_chars, n_digits, n_punct,
         |  -3.0 + 0.03125 * n_tokens + 0.00390625 * n_chars
         |    + (-0.0625) * n_digits + (-0.125) * n_punct AS score_z,
         |  CASE WHEN -3.0 + 0.03125 * n_tokens + 0.00390625 * n_chars
         |    + (-0.0625) * n_digits + (-0.125) * n_punct > 0
         |    THEN 1 ELSE 0 END AS keep
         |FROM f ORDER BY doc_id""".stripMargin,

    "q_quality_pr" ->
      // The same exact-int features/score as q_quality_logit and the
      // same rule gate as q_gopher_rules, confusion-counted per
      // threshold; precision/recall null (not a sentinel) on a zero
      // denominator.
      s"""WITH f AS (SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(trim(lower(text)),
         |      '\\s+'), y -> y <> '')) AS BIGINT) AS n_tokens,
         |    n_chars,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
         |      AS n_digits,
         |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
         |      AS n_punct,
         |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
         |      AS sum_tok_chars,
         |    CAST(len(list_filter(list_filter(string_split_regex(trim(lower(text)),
         |      '\\s+'), y -> y <> ''), y -> list_contains([${
           graft.text.TextStats.DefaultStopwords.map(w => s"'$w'")
             .mkString(", ")}], y))) AS BIGINT) AS stop_count
         |  FROM documents),
         |st AS (SELECT doc_id,
         |    -3.0 + 0.03125 * n_tokens + 0.00390625 * n_chars
         |      + (-0.0625) * n_digits + (-0.125) * n_punct AS score_z,
         |    CASE WHEN n_tokens BETWEEN 50 AND 100000
         |      AND 3 * n_tokens <= sum_tok_chars
         |      AND sum_tok_chars <= 10 * n_tokens
         |      AND stop_count >= 2 THEN 1 ELSE 0 END AS truth
         |  FROM f),
         |ks AS (SELECT unnest([-2.0, -1.0, 0.0, 1.0, 2.0]) AS thr),
         |c AS (SELECT ks.thr,
         |    CAST(sum(CASE WHEN score_z > ks.thr AND truth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score_z > ks.thr AND truth = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score_z <= ks.thr AND truth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN score_z <= ks.thr AND truth = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM st CROSS JOIN ks GROUP BY ks.thr)
         |SELECT thr, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0
         |    THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
         |  CASE WHEN tp + fn > 0
         |    THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall
         |FROM c ORDER BY thr""".stripMargin,

    "q_gopher_rules" ->
      // Rule flags are exact-int comparisons (mean band cross-multiplied);
      // the stopword list is interpolated from the SAME Scala constant the
      // Spark side uses. mean_tok_len is one division of exact BIGINTs.
      s"""WITH tk AS (SELECT doc_id,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      y -> y <> '') AS ts,
         |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
         |      AS sum_tok_chars
         |  FROM documents),
         |g AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |    sum_tok_chars,
         |    CAST(len(list_filter(ts, y -> list_contains([${
           graft.text.TextStats.DefaultStopwords.map(w => s"'$w'")
             .mkString(", ")}], y))) AS BIGINT) AS stop_count
         |  FROM tk)
         |SELECT doc_id, n_tokens, sum_tok_chars, stop_count,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(sum_tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         |    ELSE 0.0 END AS mean_tok_len,
         |  CAST(n_tokens BETWEEN 50 AND 100000 AS INTEGER) AS ok_len,
         |  CAST(3 * n_tokens <= sum_tok_chars
         |    AND sum_tok_chars <= 10 * n_tokens AS INTEGER) AS ok_mean,
         |  CAST(stop_count >= 2 AS INTEGER) AS ok_stop,
         |  CAST(n_tokens BETWEEN 50 AND 100000
         |    AND 3 * n_tokens <= sum_tok_chars
         |    AND sum_tok_chars <= 10 * n_tokens
         |    AND stop_count >= 2 AS INTEGER) AS pass
         |FROM g ORDER BY doc_id""".stripMargin,

    "q_dup_ngrams" ->
      // Character weights are gram length minus the joiner space — exact
      // BIGINT sums; top_share / dup_frac are single divisions.
      s"""WITH tk AS (SELECT doc_id,
         |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
         |      ' ') AS ts
         |  FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(ts) - 1),
         |    i -> ts[i + 1] || ' ' || ts[i + 2])) AS g FROM tk),
         |c AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c,
         |    CAST(max(length(g)) - 1 AS BIGINT) AS glen
         |  FROM bg GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |    CAST(sum(c * glen) AS BIGINT) AS tot,
         |    CAST(max(c * glen) AS BIGINT) AS top,
         |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * glen END), 0)
         |      AS BIGINT) AS dup
         |  FROM c GROUP BY 1)
         |SELECT doc_id, n_grams,
         |  CAST(top AS DOUBLE) / CAST(tot AS DOUBLE) AS top_share,
         |  CAST(dup AS DOUBLE) / CAST(tot AS DOUBLE) AS dup_frac
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_pq_codes" -> pqSql(m = 4, ksub = 4, iters = 1),

    "q_pq_topk" -> pqTopKSql(m = 8, ksub = 8, iters = 2, topk = 5),

    "q_pq_recall" -> pqRecallSql(m = 8, ksub = 8, iters = 2, topk = 5,
      rerank = 50)
  )

  // --- oracle SQL helpers that need to be defs (used before declaration) ---

  /** q_hist_fraction endpoint snippets — the identical operation order as
    * [[graft.operators.Score.histogramFraction]]'s pos / bucket-clamp /
    * interpolated-CDF columns. */
  private def hfPos(x: String): String = s"(($x - lo) * 50) / (hi - lo)"

  private def hfClamp(x: String): String =
    s"least(greatest(CAST(floor(${hfPos(x)}) AS BIGINT), 0), 49)"

  private def hfCdf(x: String): String =
    s"""CAST(cum - cnt AS DOUBLE) + CAST(cnt AS DOUBLE) *
       |      least(greatest(${hfPos(x)} - CAST(${hfClamp(x)} AS DOUBLE), 0.0),
       |        1.0)""".stripMargin

  private def histFractionSql: String =
    s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
       |h AS (SELECT least(CAST(floor(((value - lo) * 50) / (hi - lo))
       |      AS BIGINT) + 1, 50) AS bucket, count(*) AS cnt
       |  FROM events, b GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM h),
       |spn AS (SELECT CAST(unnest(range(1, 51)) AS BIGINT) AS bucket),
       |dense AS (SELECT spn.bucket, CAST(COALESCE(h.cnt, 0) AS BIGINT) AS cnt
       |  FROM spn LEFT JOIN h USING (bucket)),
       |r AS (SELECT lo + CAST(f1 AS DOUBLE) * (hi - lo) AS x_lo,
       |    lo + CAST(f2 AS DOUBLE) * (hi - lo) AS x_hi
       |  FROM b, (VALUES (0.1, 0.5), (0.25, 0.75), (0.0, 1.0)) v(f1, f2)),
       |cm AS (SELECT r.x_lo, r.x_hi, d.bucket, d.cnt,
       |    CAST(sum(d.cnt) OVER (PARTITION BY r.x_lo, r.x_hi ORDER BY d.bucket
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM dense d, r),
       |flo AS (SELECT x_lo, x_hi,
       |    ${hfCdf("x_lo")} AS f_lo
       |  FROM cm, b WHERE bucket = ${hfClamp("x_lo")} + 1),
       |fhi AS (SELECT x_lo, x_hi,
       |    ${hfCdf("x_hi")} AS f_hi
       |  FROM cm, b WHERE bucket = ${hfClamp("x_hi")} + 1)
       |SELECT x_lo, x_hi, (f_hi - f_lo) / CAST(total AS DOUBLE) AS fraction
       |FROM flo JOIN fhi USING (x_lo, x_hi), t
       |ORDER BY x_lo, x_hi""".stripMargin

  private def fillAllSqlWith(inner: String, f: String => String): String =
    s"""SELECT ts_min, ${Types.map(f).mkString(",\n  ")}
       |FROM ($inner) ORDER BY ts_min""".stripMargin

  private lazy val windowMseSql: String =
    s"""WITH s AS (SELECT row_number() OVER (ORDER BY ts_min) - 1 AS rn,
       |  CAST(round(v * 10000) AS BIGINT) AS vi
       |  FROM ($ClickSeriesSql)),
       |n AS (SELECT count(*) AS n FROM s),
       |sums AS (
       |  SELECT s.rn - p.pos AS window_id,
       |    CAST(sum(vi) AS BIGINT) AS s1, CAST(sum(vi * vi) AS BIGINT) AS s2
       |  FROM s CROSS JOIN generate_series(0, ${L - 1}) p(pos) CROSS JOIN n
       |  WHERE s.rn - p.pos >= 0 AND s.rn - p.pos <= n.n - $L
       |  GROUP BY 1)
       |SELECT window_id, (CAST(s2 AS DOUBLE)
       |  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / ${L.toDouble})
       |  / ${L.toDouble} / 1e8 AS mse
       |FROM sums ORDER BY window_id""".stripMargin

  private lazy val runningAnomalySql: String =
    s"""SELECT event_id, CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)
       |  OVER (ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS anomaly_total
       |FROM ($EvSql) ORDER BY event_id""".stripMargin

  private lazy val windowSql: String =
    s"""WITH s AS (SELECT row_number() OVER (ORDER BY ts_min) - 1 AS rn, v
       |  FROM ($ClickSeriesSql)),
       |n AS (SELECT count(*) AS n FROM s)
       |SELECT s.rn - p.pos AS window_id, CAST(p.pos AS INTEGER) AS pos, s.v AS v
       |FROM s CROSS JOIN generate_series(0, ${L - 1}) p(pos) CROSS JOIN n
       |WHERE s.rn - p.pos >= 0 AND s.rn - p.pos <= n.n - $L
       |ORDER BY window_id, pos""".stripMargin

  private lazy val langIdSql: String = {
    val arms = graft.text.TextStats.LangProfiles.map { case (lang, words) =>
      val in = words.map(w => s"'$w'").mkString("(", ",", ")")
      s"""SELECT doc_id, lang, '$lang' AS cand,
         |  len(list_filter(tk, t -> t IN $in)) AS score FROM t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, lang,
       |  string_split_regex(lower(trim(text)), '\\s+') AS tk FROM documents)
       |SELECT doc_id, lang, cand AS lang_pred FROM ($arms)
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) = 1
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-token md5 array CTE + the 32 SimHash bit terms (shared by the
    * fingerprint and Hamming oracle queries). `where` carries the
    * fixed-slice cap the bounded saturation demo applies on BOTH sides —
    * one string, so the replays cannot desynchronize. */
  private def tokenMd5Sql(where: String = ""): String =
    // list_filter mirrors tokens(): an empty token would otherwise inject a
    // phantom md5('') into the bit-count votes and len(m).
    s"""SELECT doc_id,
       |  list_transform(list_filter(string_split_regex(trim(lower(text)),
       |      '\\s+'), y -> y <> ''),
       |    t -> md5(t)) AS m
       |  FROM documents$where""".stripMargin
  private lazy val TokenMd5Sql: String = tokenMd5Sql()

  private lazy val Simhash32Terms: String = (0 until 32).map { j =>
    s"""CASE WHEN 2 * len(list_filter(m, x -> (ascii(substr(x, ${j + 1}, 1)) % 2) = 1))
       |  > len(m) THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END""".stripMargin
  }.mkString(" + ")

  /** The 64 SimHash-64 bit terms (Dedup.simhash64Md5 replay): bit j votes
    * on ascii bit (j % 2) of hex char (j / 2). DuckDB rejects
    * `1::BIGINT << 63` as overflow, so bit 63 uses the min-BIGINT literal
    * (the same two's-complement value the Spark side's `1L << 63` is). */
  private lazy val Simhash64Terms: String = (0 until 64).map { j =>
    val c = j / 2
    val div = 1 << (j % 2)
    val bit =
      if (j == 63) "CAST(-9223372036854775808 AS BIGINT)"
      else s"(CAST(1 AS BIGINT) << $j)"
    s"""CASE WHEN 2 * len(list_filter(m,
       |    x -> ((ascii(substr(x, ${c + 1}, 1)) // $div) % 2) = 1))
       |  > len(m) THEN $bit ELSE 0 END""".stripMargin
  }.mkString(" + ")

  /** md5-parity MinHash+LSH candidate oracle — mirrors minhashCandidatesMd5
    * (k=2, 32 hashes, 16 bands of 2): ONE md5 per shingle split into a
    * 48-bit (a, b) pair, Carter–Wegman signature h_j = min(a + j·b), md5
    * band-bucket keys over the "_"-joined integer entries, distinct
    * (id1 < id2) band-join pairs. */
  private lazy val minhashMd5Sql: String = {
    val nh = 32; val bands = 16; val r = nh / bands
    val sigTerms = (0 until nh).map(j =>
      s"list_min(list_transform(hp, p -> p.a + $j * p.b)) AS e$j")
      .mkString(",\n  ")
    val bandStructs = (0 until bands).map { b =>
      val es = (0 until r).map(i => s"CAST(e${b * r + i} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"{'band_id': $b, 'band_hash': CAST('0x' || substr(md5($es), 1, 15) AS BIGINT)}"
    }.mkString(",\n  ")
    s"""WITH tk AS (SELECT doc_id,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |sh AS (SELECT doc_id, CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
       |    ELSE list_distinct(list_transform(range(0, len(t) - 1), i -> concat(t[i+1], ' ', t[i+2]))) END AS s
       |  FROM tk),
       |hp AS (SELECT doc_id, list_transform(s, x ->
       |    {'a': CAST('0x' || substr(md5(x), 1, 12) AS BIGINT),
       |     'b': CAST('0x' || substr(md5(x), 13, 12) AS BIGINT)}) AS hp
       |  FROM sh),
       |sig AS (SELECT doc_id, $sigTerms FROM hp),
       |bnd AS (SELECT doc_id, unnest([
       |  $bandStructs], recursive := true) FROM sig)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |FROM bnd a JOIN bnd b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |  AND a.doc_id < b.doc_id
       |ORDER BY id1, id2""".stripMargin
  }

  /** The auto-bits capacity target (expected vectors per LSH cell) shared
    * by BOTH replicas of the capacity rule: the Spark builders pass it to
    * Ann.cosineNearDupAuto / autoBits / semDedupAuto, and every oracle
    * CTE that replays `b = min{b : targetCell*2^b >= N}` derives its SQL
    * from [[autoBitsWhere]] below — changing either side alone can no
    * longer silently break the bit-parity contract. */
  // `final` with a literal = a compile-time constant (inlined at use
  // sites), immune to object-initialization order: the eagerly-built
  // oracleSql val sits textually before this declaration and would read
  // a plain val as 0.
  private[graft] final val AutoBitsTargetCell = 64

  /** SQL twin of Ann.autoBits' integer inequality, parameterized on the
    * shared [[AutoBitsTargetCell]]: the WHERE fragment selecting the
    * smallest b with targetCell*2^b >= `nRef` (a CTE count column). */
  private def autoBitsWhere(nRef: String): String =
    s"$AutoBitsTargetCell * (CAST(1 AS BIGINT) << b) >= $nRef"

  /** Shared CTE chain computing the md5-parity hyperplane bucket per vector
    * (mirrors Ann.lshBucketMd5's exact integer math). */
  private def annBucketMd5Cte(bits: Int): String =
    s"""fx AS (
       |  SELECT vec_id, CAST(g.i AS INTEGER) AS i,
       |    CAST(floor(CAST(embedding[CAST(g.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS vi
       |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
       |proj AS (
       |  SELECT vec_id, p.p AS p,
       |    CAST(sum(vi * (CAST('0x' || substr(md5(concat(p.p, '_', i - 1)), 1, 6) AS BIGINT) - 8388608)) AS BIGINT) AS pr
       |  FROM fx CROSS JOIN generate_series(0, ${bits - 1}) p(p)
       |  GROUP BY vec_id, p.p),
       |bkt AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN pr >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id)""".stripMargin

  /** DuckDB twin of Ann.ivfTopKKmeans: replays the k-means‖-style init
    * (md5-seeded oversample of 4k candidates, Gonzalez farthest-first
    * reduce to k via k−1 argmax-of-min-distance selection CTEs) and the
    * fixed-point Lloyd iterations with the identical integer arithmetic —
    * exact squared-distance assignment (tie → smaller cell), centroid
    * update floorDiv(1000·Σq, m) via the pmod-subtraction so engine
    * division semantics can't diverge. */
  /** Integer squared distance between a ×1000-grid query vector and a
    * ×10⁶-grid centroid (the exact arithmetic IvfIndex/Ann use). */
  private def ivfDistTo(qa: String, ca: String) =
    s"(SELECT sum(($qa[g.i]*1000 - $ca[g.i])*($qa[g.i]*1000 - $ca[g.i])) FROM generate_series(1, 64) g(i))"

  /** The fixed-point k-means training replay (md5-seeded farthest-first
    * init + exact-integer Lloyd) as a WITH-prefix ending at centroid CTE
    * `c<iters>`. `trainWhere` restricts the TRAINING population (both the
    * init candidates and the Lloyd assignment passes) — empty for the
    * full-corpus q_ann_ivf_kmeans, a base-split predicate for the frozen-
    * quantizer append replay. `ev` itself stays unfiltered so finals can
    * score/assign the whole corpus. */
  private def kmeansTrainCtes(k: Int, iters: Int, trainWhere: String): String = {
    def distTo(qa: String, ca: String) = ivfDistTo(qa, ca)
    // candidate-vs-candidate distance: both already on the ×1000 grid
    def candDist(a: String, b: String) =
      s"(SELECT sum(($a[g.i] - $b[g.i])*($a[g.i] - $b[g.i])) FROM generate_series(1, 64) g(i))"
    val over = graft.sim.Ann.KmeansOversample * k
    val sb = new StringBuilder
    sb.append(
      s"""WITH ev AS (SELECT vec_id, embedding,
         |  list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |cand AS MATERIALIZED (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
         |  list_transform(q, x -> x*1000) AS c FROM ev $trainWhere
         |  QUALIFY rn <= $over),
         |ch1 AS MATERIALIZED (SELECT 0 AS cell, rn, c FROM cand WHERE rn = 1),
         |""".stripMargin)
    for (j <- 1 until k) {
      sb.append(
        s"""m$j AS MATERIALIZED (SELECT ca.rn, min(${candDist("ca.c", "p.c")}) AS md
           |  FROM cand ca CROSS JOIN ch$j p
           |  WHERE ca.rn NOT IN (SELECT rn FROM ch$j)
           |  GROUP BY ca.rn),
           |ch${j + 1} AS MATERIALIZED (SELECT * FROM ch$j UNION ALL
           |  SELECT $j AS cell, rn, c FROM (
           |    SELECT ca.rn, ca.c,
           |      row_number() OVER (ORDER BY m.md DESC, ca.rn) AS pk
           |    FROM cand ca JOIN m$j m USING (rn)) WHERE pk = 1),
           |""".stripMargin)
    }
    sb.append(s"c0 AS (SELECT cell, c FROM ch$k),\n")
    for (i <- 1 to iters) {
      sb.append(
        s"""a$i AS (SELECT e.vec_id, e.q, s.cell,
           |  row_number() OVER (PARTITION BY e.vec_id ORDER BY ${distTo("e.q", "s.c")}, s.cell) AS rk
           |  FROM ev e CROSS JOIN c${i - 1} s $trainWhere),
           |u$i AS (SELECT a.cell, g.i AS pos, sum(a.q[g.i]) AS sv, count(*) AS m
           |  FROM a$i a CROSS JOIN generate_series(1, 64) g(i) WHERE a.rk = 1
           |  GROUP BY a.cell, g.i),
           |c$i AS (SELECT cell,
           |  list(CAST((1000*sv - ((((1000*sv) % m) + m) % m)) // m AS BIGINT) ORDER BY pos) AS c
           |  FROM u$i GROUP BY cell),
           |""".stripMargin)
    }
    sb.toString
  }

  private def ivfKmeansSql(k: Int, iters: Int, nprobe: Int, topk: Int): String = {
    def distTo(qa: String, ca: String) = ivfDistTo(qa, ca)
    val sb = new StringBuilder
    sb.append(kmeansTrainCtes(k, iters, ""))
    sb.append(
      s"""fin AS (SELECT e.vec_id, e.embedding, s.cell,
         |  row_number() OVER (PARTITION BY e.vec_id ORDER BY ${distTo("e.q", "s.c")}, s.cell) AS rk
         |  FROM ev e CROSS JOIN c$iters s),
         |cells AS (SELECT vec_id, embedding, cell FROM fin WHERE rk = 1),
         |probes AS (SELECT e.vec_id AS qid, e.embedding AS qv, s.cell,
         |  row_number() OVER (PARTITION BY e.vec_id ORDER BY ${distTo("e.q", "s.c")}, s.cell) AS rk
         |  FROM ev e CROSS JOIN c$iters s WHERE e.vec_id < 10),
         |pr AS (SELECT qid, qv, cell FROM probes WHERE rk <= $nprobe),
         |scored AS (
         |  SELECT pr.qid, ce.vec_id,
         |    round(list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]), 6) AS cosine,
         |    row_number() OVER (PARTITION BY pr.qid
         |      ORDER BY list_cosine_similarity(pr.qv::DOUBLE[], ce.embedding::DOUBLE[]) DESC, ce.vec_id) AS rank
         |  FROM cells ce JOIN pr ON ce.cell = pr.cell AND ce.vec_id <> pr.qid)
         |SELECT qid, vec_id, cosine, CAST(rank AS INTEGER) AS rank
         |FROM scored WHERE rank <= $topk ORDER BY qid, rank""".stripMargin)
    sb.toString
  }

  /** DuckDB twin of the IvfIndex build→append→staleness lifecycle: trains
    * the quantizer on vec_id < `split` ONLY (the frozen build
    * generation), assigns EVERY vector — base and batch — with those
    * frozen centroids (same exact-integer distance, same ascending-cell
    * tiebreak), then replays the staleness report: per cell, population
    * and mean per-dim quantization error of each generation. The error is
    * the exact integer distance divided once by 64·10⁶ (identical op
    * order to IvfIndex.staleness); only the per-cell mean is float. */
  private def ivfAppendSql(k: Int, iters: Int, split: Long): String = {
    val sb = new StringBuilder
    sb.append(kmeansTrainCtes(k, iters, s"WHERE vec_id < $split"))
    sb.append(
      s"""asn AS (SELECT e.vec_id, s.cell, ${ivfDistTo("e.q", "s.c")} AS dd,
         |  row_number() OVER (PARTITION BY e.vec_id ORDER BY ${ivfDistTo("e.q", "s.c")}, s.cell) AS rk
         |  FROM ev e CROSS JOIN c$iters s),
         |lab AS (SELECT cell, dd / 64000000.0 AS qerr,
         |    CASE WHEN vec_id < $split THEN 1 ELSE 0 END AS is_base
         |  FROM asn WHERE rk = 1)
         |SELECT cell,
         |  CAST(count(*) FILTER (WHERE is_base = 1) AS BIGINT) AS n_base,
         |  CAST(count(*) FILTER (WHERE is_base = 0) AS BIGINT) AS n_new,
         |  round(avg(qerr) FILTER (WHERE is_base = 1), 6) AS qerr_base,
         |  round(avg(qerr) FILTER (WHERE is_base = 0), 6) AS qerr_new
         |FROM lab GROUP BY cell ORDER BY cell""".stripMargin)
    sb.toString
  }

  /** DuckDB twin of Ann.pqCodes: per subspace, replays the shared
    * md5-ordered oversample, the Gonzalez farthest-first init (ksub−1
    * argmax-of-min-distance selection CTEs over the SLICED candidates),
    * the fixed-point Lloyd iterations, and the final nearest-cell coding —
    * all on exact integers, then one final double division for recon_err
    * (the identical op order as the Spark side). */
  private def pqSql(m: Int, ksub: Int, iters: Int): String = {
    val joins = (1 until m).map(s => s"JOIN s${s}code USING (vec_id)").mkString(" ")
    val codes = (0 until m).map(s => s"code_$s").mkString(", ")
    val errSum = (0 until m).map(s => s"d_$s").mkString(" + ")
    pqCommonCtes(m, ksub, iters) +
      s"""fin AS (SELECT * FROM s0code $joins)
         |SELECT vec_id, $codes,
         |  CAST($errSum AS DOUBLE) / 1.0E12 AS recon_err
         |FROM fin ORDER BY vec_id""".stripMargin
  }

  /** DuckDB twin of Ann.pqTopK: the same codebook/coding replay as
    * [[pqSql]], then ADC scoring — each (query, candidate) pair sums the
    * exact integer distances from the query's subvectors to the centroids
    * the candidate's codes name (centroids joined BY CELL ID, mirroring
    * the Spark side's cell-keyed CASE), ranked per query with the id
    * tiebreak. */
  private def pqTopKSql(m: Int, ksub: Int, iters: Int, topk: Int): String =
    pqSearchCtes(m, ksub, iters) +
      s"""SELECT qid, vec_id, CAST(adist AS DOUBLE) / 1.0E12 AS adc,
         |  CAST(rk AS INTEGER) AS rank
         |FROM rr WHERE rk <= $topk ORDER BY qid, rank""".stripMargin

  /** DuckDB twin of the PQ recall evaluation: replays BOTH searches — the
    * ADC ranking and the exact brute-force cosine ranking — and counts the
    * per-query overlap of their top-k id sets. */
  private def pqRecallSql(m: Int, ksub: Int, iters: Int, topk: Int,
                          rerank: Int): String =
    pqSearchCtes(m, ksub, iters) +
      s""",
         |cnd AS (SELECT qid, vec_id FROM rr WHERE rk <= $rerank),
         |rsc AS (SELECT c.qid, c.vec_id, row_number() OVER (PARTITION BY c.qid
         |    ORDER BY list_cosine_similarity(qq.qv::DOUBLE[], e.embedding::DOUBLE[]) DESC,
         |      c.vec_id) AS rk
         |  FROM cnd c JOIN embeddings e USING (vec_id)
         |  JOIN (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |    WHERE vec_id < 10) qq USING (qid)),
         |pqk AS (SELECT qid, vec_id FROM rsc WHERE rk <= $topk),
         |bsc AS (SELECT q.qid, e.vec_id, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) DESC,
         |      e.vec_id) AS rk
         |  FROM embeddings e CROSS JOIN (SELECT vec_id AS qid, embedding AS qv
         |    FROM embeddings WHERE vec_id < 10) q
         |  WHERE e.vec_id <> q.qid),
         |bk AS (SELECT qid, vec_id FROM bsc WHERE rk <= $topk)
         |SELECT b.qid, CAST(count(p.vec_id) AS BIGINT) AS hits,
         |  CAST(count(p.vec_id) AS DOUBLE) / ${topk.toDouble} AS recall
         |FROM bk b LEFT JOIN pqk p USING (qid, vec_id)
         |GROUP BY b.qid ORDER BY qid""".stripMargin

  private def pqSearchCtes(m: Int, ksub: Int, iters: Int): String = {
    val dims = 64
    val d = dims / m
    def distTo(off: Int, qa: String, ca: String) =
      s"(SELECT sum(($qa[$off + g.i]*1000 - $ca[g.i])*($qa[$off + g.i]*1000 - $ca[g.i])) FROM generate_series(1, $d) g(i))"
    val joins = (1 until m).map(s => s"JOIN s${s}code USING (vec_id)").mkString(" ")
    val centJoins = (0 until m)
      .map(s => s"JOIN s${s}c$iters t$s ON t$s.cell = f.code_$s").mkString(" ")
    val adc = (0 until m).map(s => distTo(s * d, "q.q", s"t$s.c")).mkString(" + ")
    pqCommonCtes(m, ksub, iters) +
      s"""fin AS (SELECT * FROM s0code $joins),
         |qs AS (SELECT vec_id AS qid, q FROM ev WHERE vec_id < 10),
         |sc AS (SELECT q.qid, f.vec_id, $adc AS adist
         |  FROM fin f CROSS JOIN qs q $centJoins
         |  WHERE f.vec_id <> q.qid),
         |rr AS (SELECT qid, vec_id, adist, row_number() OVER (
         |    PARTITION BY qid ORDER BY adist, vec_id) AS rk
         |  FROM sc)
         |""".stripMargin
  }

  private def pqCommonCtes(m: Int, ksub: Int, iters: Int): String = {
    val dims = 64
    val d = dims / m
    val over = graft.sim.Ann.KmeansOversample * ksub
    // corpus-vs-centroid distance on subspace starting at offset `off`:
    // q is on the ×1000 grid, centroids on ×1000000
    def distTo(off: Int, qa: String, ca: String) =
      s"(SELECT sum(($qa[$off + g.i]*1000 - $ca[g.i])*($qa[$off + g.i]*1000 - $ca[g.i])) FROM generate_series(1, $d) g(i))"
    // candidate-vs-candidate: both already sliced and on the ×1000000 grid
    def candDist(a: String, b: String) =
      s"(SELECT sum(($a[g.i] - $b[g.i])*($a[g.i] - $b[g.i])) FROM generate_series(1, $d) g(i))"
    val sb = new StringBuilder
    sb.append(
      s"""WITH ev AS (SELECT vec_id,
         |  list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |cand AS MATERIALIZED (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
         |  list_transform(q, x -> x*1000) AS c FROM ev
         |  QUALIFY rn <= $over),
         |""".stripMargin)
    for (s <- 0 until m) {
      val off = s * d
      sb.append(
        s"""s${s}cand AS MATERIALIZED (SELECT rn, c[${off + 1}:${off + d}] AS c FROM cand),
           |s${s}ch1 AS MATERIALIZED (SELECT 0 AS cell, rn, c FROM s${s}cand WHERE rn = 1),
           |""".stripMargin)
      for (j <- 1 until ksub) {
        sb.append(
          s"""s${s}m$j AS MATERIALIZED (SELECT ca.rn, min(${candDist("ca.c", "p.c")}) AS md
             |  FROM s${s}cand ca CROSS JOIN s${s}ch$j p
             |  WHERE ca.rn NOT IN (SELECT rn FROM s${s}ch$j)
             |  GROUP BY ca.rn),
             |s${s}ch${j + 1} AS MATERIALIZED (SELECT * FROM s${s}ch$j UNION ALL
             |  SELECT $j AS cell, rn, c FROM (
             |    SELECT ca.rn, ca.c,
             |      row_number() OVER (ORDER BY mm.md DESC, ca.rn) AS pk
             |    FROM s${s}cand ca JOIN s${s}m$j mm USING (rn)) WHERE pk = 1),
             |""".stripMargin)
      }
      sb.append(s"s${s}c0 AS (SELECT cell, c FROM s${s}ch$ksub),\n")
      for (i <- 1 to iters) {
        sb.append(
          s"""s${s}a$i AS (SELECT e.vec_id, e.q, t.cell,
             |  row_number() OVER (PARTITION BY e.vec_id ORDER BY ${distTo(off, "e.q", "t.c")}, t.cell) AS rk
             |  FROM ev e CROSS JOIN s${s}c${i - 1} t),
             |s${s}u$i AS (SELECT a.cell, g.i AS pos, sum(a.q[$off + g.i]) AS sv, count(*) AS m
             |  FROM s${s}a$i a CROSS JOIN generate_series(1, $d) g(i) WHERE a.rk = 1
             |  GROUP BY a.cell, g.i),
             |s${s}c$i AS (SELECT cell,
             |  list(CAST((1000*sv - ((((1000*sv) % m) + m) % m)) // m AS BIGINT) ORDER BY pos) AS c
             |  FROM s${s}u$i GROUP BY cell),
             |""".stripMargin)
      }
      sb.append(
        s"""s${s}f AS (SELECT e.vec_id, t.cell, ${distTo(off, "e.q", "t.c")} AS dd,
           |  row_number() OVER (PARTITION BY e.vec_id ORDER BY ${distTo(off, "e.q", "t.c")}, t.cell) AS rk
           |  FROM ev e CROSS JOIN s${s}c$iters t),
           |s${s}code AS (SELECT vec_id, CAST(cell AS INTEGER) AS code_$s, dd AS d_$s
           |  FROM s${s}f WHERE rk = 1),
           |""".stripMargin)
    }
    sb.toString
  }

  /** One oracle for BOTH packing forms (global window and bucketed-carry):
    * exclusive per-lang running token count, integer-divided by capacity.
    * All integer arithmetic; `//` (DuckDB) = `div` (Spark) on nonnegative
    * operands. */
  private lazy val packBinsSql: String =
    s"""WITH t AS (SELECT doc_id, lang,
       |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, lang, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |  FROM t)
       |SELECT doc_id, lang, n_tokens, CAST(cum_excl // 512 AS BIGINT) AS bin_id
       |FROM c ORDER BY doc_id""".stripMargin

  /** Curation-chain replay shared verbatim by q_curation_pipeline (one
    * fused plan) and q_curation_staged (parquet write + re-read between
    * stages): dedup-keep-best → repetition gate → 50% hash sample →
    * 32/16 chunking → per-lang chunk/token budget. */
  private lazy val curationSql: String =
    s"""WITH kept AS (SELECT doc_id, lang, text FROM documents
         |  QUALIFY row_number() OVER (
         |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |    ORDER BY n_chars DESC, doc_id) = 1),
         |tf AS (SELECT doc_id, t AS tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |        FROM documents)
         |  WHERE t <> '' GROUP BY 1, 2),
         |fluent AS (SELECT doc_id FROM tf GROUP BY doc_id
         |  HAVING round(CAST(count(*) AS DOUBLE) / sum(c), 6) >= 0.5),
         |samp AS (SELECT k.doc_id, k.lang, k.text
         |  FROM kept k JOIN fluent USING (doc_id)
         |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000 < 500),
         |tk AS (SELECT doc_id, lang,
         |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |      y -> y <> '') AS t
         |  FROM samp),
         |st AS (SELECT doc_id, lang, t,
         |    CAST(greatest(floor((len(t) - 32 + 15) / 16.0), 0) AS BIGINT) AS last
         |  FROM tk),
         |ex AS (SELECT doc_id, lang, t, unnest(range(0, last + 1)) AS i FROM st),
         |chunks AS (SELECT doc_id, lang,
         |    len(list_slice(t, i*16 + 1, i*16 + 32)) AS n_tokens
         |  FROM ex WHERE len(list_slice(t, i*16 + 1, i*16 + 32)) > 0)
         |SELECT lang, count(*) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         |FROM chunks GROUP BY lang ORDER BY lang""".stripMargin

  private lazy val jaccardSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(0, len(tk) - 2),
       |    i -> concat_ws(' ', tk[i+1], tk[i+2], tk[i+3]))) AS s
       |  FROM (SELECT doc_id,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
       |    FROM documents))
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
       |ORDER BY id1""".stripMargin

  // ==========================================================================
  // Bench-only production twins (round-9 verdict item 2)
  // ==========================================================================

  /** The xxhash64/float-basis PRODUCTION variants of the four hash-twin
    * families. NOT in `queries`: DuckDB cannot replay xxhash64, so a
    * registry row for them would be permanently yellow (the round-7
    * `no_oracle` cleanup retired them for exactly that reason). But the
    * md5-parity rows the registry DOES carry pay a cryptographic digest
    * per shingle that no production user pays — the heaviest bench rows
    * were measuring oracle tax, not plans. These re-admit the production
    * kernels to the BENCH loop only: `graft.Bench` times them alongside
    * the registry and reports a `production_total` in which each twin's
    * steady time substitutes its md5 row's (see
    * [[productionSubstitutes]]). Value-level correctness of the shared
    * plan shape rides on the md5 oracles; the xxhash kernels' own
    * contracts (exact-dup recall, no cartesian, rank caps) are pinned by
    * ProductionTwinSpec, and their plan shapes by PlanGuardSpec. */
  val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_minhash_lsh" -> ((s, d) =>
      // xxhash64 minwise signatures + banded candidate equi-join — the
      // production MinHash-LSH path (same plan shape as the ~3x-slower
      // md5 oracle twin q_minhash_lsh_md5).
      graft.dedup.Dedup.minhashCandidates(Tables.documents(s, d), "doc_id",
          "text", k = 2, numHashes = 32, bands = 16)
        .orderBy("id1", "id2")),

    "q_simhash" -> ((s, d) =>
      // xxhash64-basis SimHash-64 fingerprints (one codegen'd pass over
      // the token array; md5 twin: q_simhash_md5).
      Tables.documents(s, d)
        .select(col("doc_id"), graft.dedup.Dedup.tokenHashes(col("text")).as("_h"))
        .select(col("doc_id"), simhashXxCol(s, col("_h")).as("simhash"))
        .orderBy("doc_id")),

    "q_ann_lsh" -> ((s, d) => {
      // float-hyperplane LSH-bucketed ANN (md5-plane twin: q_ann_lsh_md5).
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.sim.Ann.lshTopK(q, "qid", "qv", emb, "vec_id", "embedding", 5,
          bits = 4)
        .orderBy("qid", "rank")
    }),

    "q_cosine_neardup" -> ((s, d) =>
      // float-hyperplane LSH near-dup pairs (md5-plane twin:
      // q_cosine_neardup_md5). Auto-bits like the twin (round 11) so the
      // production substitution compares like-for-like capacity.
      graft.sim.Ann.cosineNearDupAuto(Tables.embeddings(s, d), "vec_id",
          "embedding", threshold = 0.15, targetCell = AutoBitsTargetCell)
        .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2")),

    "q_table_profile_approx" -> ((s, d) =>
      // HLL++ production twin of q_table_profile (round-17 order #6
      // adjudication, landed r18 per its sanctioned outcome): identical
      // output schema and identical values except n_distinct, which is
      // approx_count_distinct (rsd 2%) instead of exact countDistinct —
      // no multi-countDistinct Expand, one pass at ×1 rows, constant
      // sketch state per column. Measured 4.3× noop-vs-noop at sf0.1
      // (bench/r17/TABLEPROFILE_sf01_r17.json: 3.67 → 0.85 s). The
      // registry row keeps the EXACT plan (the certification stance);
      // ProfileSpec pins non-distinct-field parity incl. the zero-row
      // case. DuckDB's approx_count_distinct uses a different HLL
      // implementation, so the twin is not oracle-replayable — bench-only.
      graft.operators.Profile.profileApprox(Tables.orders(s, d))),

    "q_simhash_pairs_prod" -> ((s, d) => {
      // xxhash64-basis twin of the PRIMARY q_simhash_pairs row (same
      // overlay, bands, maxDist — only the token-hash kernel differs):
      // one codegen'd pass per doc instead of an md5 per token, so this
      // is the price of the 64-bit pair-mining plan without the oracle
      // digest tax. Exact-recall contract pinned by ProductionTwinSpec
      // against a brute-force distance histogram.
      val docs = Tables.documents(s, d)
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.sim.Hamming.pairCounts(
        corpus.select(graft.dedup.Dedup.tokenHashes(col("text")).as("_h"))
          .select(simhashXxCol(s, col("_h")).as("sh")),
        "sh", bandWidths = Seq(13, 13, 13, 13, 12), maxDist = 4)
    }))

  /** benchOnly twin → the registry row whose steady time it substitutes
    * in graft.Bench's `production_total` (the md5 rows stay in
    * `oracle_total` — both subtotals appear in every bench record). */
  val productionSubstitutes: Map[String, String] = Map(
    "q_minhash_lsh" -> "q_minhash_lsh_md5",
    "q_simhash" -> "q_simhash_md5",
    "q_ann_lsh" -> "q_ann_lsh_md5",
    "q_cosine_neardup" -> "q_cosine_neardup_md5",
    "q_simhash_pairs_prod" -> "q_simhash_pairs",
    "q_table_profile_approx" -> "q_table_profile")
}
