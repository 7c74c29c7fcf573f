package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprints.
  *
  * All hot paths are built-in expressions (split/regexp/HOFs) — codegen'd,
  * no UDFs, embarrassingly parallel per-row: at 100 TB these run at scan
  * speed with zero shuffle.
  */
object TextStats {

  /** Whitespace tokens of trimmed text; empty tokens are DROPPED, so an
    * empty text → empty array and a text starting with a tab/newline
    * (which `trim` — space-only on both engines — does not strip, so the
    * regex split emits a leading "") → real tokens only. Every DuckDB
    * oracle that feeds a count, chunk, or hash from this tokenization
    * filters empties the same way (`t <> ''` / `list_filter(..., y -> y <>
    * '')`, or a `^[a-z]+$`-style match that can never accept ''); the only
    * unfiltered oracle split is langIdSql, where empties cannot score
    * against any profile word. The filter is what keeps the parity total
    * rather than space-prefix-only. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** BPE-ish subword pre-tokenization: word pieces, number runs, and single
    * punctuation marks (the GPT-2-style contraction/word/number/punct split,
    * simplified to an ASCII-safe regex). Splits at letter↔digit transitions
    * so "stop2day" → ["stop","2","day"].
    *
    * Formulated as EXTRACTION (`[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`) rather
    * than a lookaround split: the token stream is identical (letter runs,
    * digit runs, single non-space symbols — see the parity test in
    * TextStatsSpec), but extraction needs no lookarounds, so the same
    * pattern runs on RE2 engines (DuckDB) and the query is oracle-checkable. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  /** The extraction pattern shared verbatim with the DuckDB oracle.
    * The symbol branch excludes ALL of \x00-\x20 (not just regex \s)
    * because the split formulation's `trim` filter drops every ASCII
    * control char — this keeps the two token streams bit-identical. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\x00-\\x20]"

  /** The original lookaround-split formulation, kept as the parity witness:
    * TextStatsSpec asserts it yields the same token stream as [[bpeTokens]].
    * (The historical filter used `trim`, which in Spark SQL strips ONLY
    * spaces — so `\t`/`\n` leaked through as vocabulary "pieces". The
    * whitespace filter here is the intended semantics, matching the
    * extraction pattern's \x00-\x20 exclusion.) */
  private[text] def bpeTokensSplit(text: Column): Column =
    filter(split(text,
      "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"),
      t => !t.rlike("^[\\x00-\\x20]*$"))

  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  def stopwordCount(toks: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Quality-signal projection: token/char counts, mean word length,
    * punctuation + stopword + digit + uppercase ratios — the standard
    * C4/Gopher-style cheap quality columns. */
  def withQualitySignals(df: DataFrame, textCol: String,
                         stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_calc", length(t).cast("long"))
      .withColumn("n_tokens", size(tokens(t)).cast("long"))
      .withColumn("mean_token_len",
        when(col("n_tokens") > 0,
          (length(regexp_replace(t, "\\s+", "")).cast("double")) / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(col("n_chars_calc") > 0,
          length(regexp_replace(t, "[^.,;:!?'\"()]", "")).cast("double")
            / col("n_chars_calc")).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(col("n_chars_calc") > 0,
          length(regexp_replace(t, "[^0-9]", "")).cast("double")
            / col("n_chars_calc")).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          stopwordCount(tokens(t), stopwords).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic
    * language ID. Public knowledge (most-frequent function words). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "un", "una", "es", "por"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"))

  /** Heuristic language ID: score = stopword hits per language profile;
    * argmax wins (ties resolved by profile order). Pure expression tree —
    * no UDF, no shuffle. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = LangProfiles.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isInCollection(words))).as("score"),
             lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs is lexicographic: max score wins,
    // ties break toward the lexicographically largest lang tag.
    array_max(array(scored: _*)).getField("lang")
  }

  /** Exact-dup fingerprint: md5 of whitespace-normalized lowercase text —
    * cross-engine stable (md5 is md5 everywhere). */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** 64-bit rolling chain hash over tokens: acc' = xxhash64(acc, token) —
    * an order-sensitive content fingerprint (Rabin-Karp-style recurrence;
    * hash chaining instead of polynomial multiply because ANSI mode treats
    * wrapping long arithmetic as overflow). HOF fold, codegen-friendly. */
  def fingerprintRolling(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** TF-IDF top-k terms per document — the classic salient-term extractor.
    * Scoring uses the RAW inverse document frequency `tf · (N+1)/(df+1)`
    * (a standard smoothed variant) instead of its logarithm: one division
    * on identical operands is bit-identical cross-engine, where `ln` is
    * libm-dependent and can flip near-tie rankings by an ulp.
    *
    * Scale shape: explode → (doc, term) count [shuffle 1] → term df
    * [shuffle 2, vocabulary-sized] → equi-join df back onto tf (left to the
    * optimizer: web-text whitespace vocabulary is open-ended, so a forced
    * broadcast would hit the driver at scale; AQE broadcasts when it fits)
    * → ranked window partitioned by doc [shuffle 3]. The corpus size N
    * rides in-plan as a broadcast 1-row aggregate — no eager action at
    * construction time. */
  def tfIdfTopK(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int,
                checkpoint: DataFrame => DataFrame =
                  _.localCheckpoint(true)): org.apache.spark.sql.DataFrame = {
    val nRow = df.agg(count(lit(1)).cast("double").as("_n"))
    // materialize the (doc, term) counts ONCE: the table feeds BOTH the
    // df marginal and the score join, and Catalyst re-executes shared
    // subtrees (the round-19 jaccardVerify finding; same house pattern —
    // eager, reference-tracked, size-gated by the caller at builder scale)
    val tf = checkpoint(df
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nRow))
      .withColumn("score", col("tf") * (col("_n") + lit(1.0)) / (col("df") + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("rk"), round(col("score"), 6).as("score"))
  }

  /** PII masking patterns. Single-branch regexes ONLY (no alternation):
    * Java regex is leftmost-first backtracking where RE2 (DuckDB) is
    * leftmost-longest — the two agree exactly when every pattern has one
    * branch and plain greedy quantifiers, which these do. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII scrubbing — the redaction pass of a training-data pipeline:
    * masks emails then IPv4 literals, and reports per-document match
    * counts (counted BEFORE masking). Pure per-row regex work: scan
    * speed, zero shuffle, embarrassingly parallel at 100 TB. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))).as("n_ips"),
      regexp_replace(regexp_replace(t, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>").as("scrubbed"))
  }

  /** Repetition signals (the Gopher/C4 repetition filters): per document,
    * token totals, distinct-token ratio and the share of the single most
    * frequent token. Shape: explode → (doc, token) count → per-doc
    * aggregate — two map-side-combinable shuffles keyed by doc, no
    * windows. Documents with zero tokens emit no row (explode of an empty
    * array), identically on both engines. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max("c").as("max_tf"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_tokens"), 6))
      .withColumn("top_token_share",
        round(col("max_tf").cast("double") / col("n_tokens"), 6))

  /** Bigram-frequency fluency score — the perplexity proxy of the
    * C4/CCNet-style quality filters, without a language model: a document
    * scores high when its word bigrams are common in the corpus, low when
    * its token sequence is rare/garbled. score = (Σ corpus-frequency of
    * each bigram occurrence) / (bigram count) — integer sum over exact
    * counts divided once, so the only float op runs on identical operands
    * cross-engine (no log/perplexity — `ln` is libm-dependent).
    *
    * Shape: explode bigrams (NON-distinct — repeats weigh), one
    * vocabulary-sized count aggregate, an equi-join of doc bigrams against
    * it (AQE broadcasts when it fits; forced broadcast of an open-ended
    * bigram vocabulary would be the scale mistake), one per-doc aggregate.
    * Docs with < 2 tokens emit no row (no bigrams), identically on both
    * engines. */
  def bigramFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.dedup.Dedup
    // all consecutive pairs, repeats kept (shinglesFromTokens distincts)
    val toks = Dedup.normTokens(col(textCol))
    val bigrams = df
      .select(col(idCol), toks.as("_tk"))
      .select(col(idCol), explode(zip_with(col("_tk"),
        slice(col("_tk"), lit(2), greatest(size(col("_tk")) - 1, lit(1))),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .filter(col("bg").isNotNull)
    val freq = bigrams.groupBy("bg").agg(count(lit(1)).as("corpus_freq"))
    bigrams.join(freq, Seq("bg"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum("corpus_freq").cast("double") / count(lit(1)), 6)
          .as("fluency"))
  }

  /** Unigram-LM surprisal score — the KenLM-style perplexity quality
    * filter of large-scale curation pipelines, reduced to model order 1 so
    * the score stays oracle-checkable: mean per-token surprisal
    * −ln p(t) = ln(total) − ln(count(t)) under the corpus's own unigram
    * distribution, in nats. Garbled/rare-vocabulary documents score high;
    * documents of common words score low.
    *
    * Numeric determinism: `ln` is libm-dependent, so each log is carried
    * as an EXACT micro-nat integer q(x) = floor(ln(x)·1e6 + 0.5) — probed
    * bit-identical between `java.lang.Math.log` and DuckDB `ln` for every
    * integer ≤ 2e6 — and per-token surprisal is the exact BIGINT
    * difference q(total) − q(count). The per-doc sum is then
    * order-independent, and the ONLY float op is one fixed final
    * expression (ssum / n / 1e6) over identical operands cross-engine.
    *
    * Scale shape: tf aggregate on (doc, token) → vocabulary aggregate on
    * token (both map-side combinable), a 1-row total broadcast, tf ⋈ vocab
    * equi-join on token (AQE broadcasts the vocabulary side when it fits;
    * forcing broadcast of an open-ended vocabulary would be the scale
    * mistake), one per-doc aggregate. No all-pairs step, no driver loop —
    * the minimum shape for any LM scoring pass. Surprisal ≤ ln(2e6)·1e6
    * ≈ 1.5e7 micro-nats, so tf·surprisal sums stay far from Long range
    * even at 100 TB document sizes. Docs with zero tokens emit no row
    * (no tf entries), identically on both engines. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val qln: Column => Column = x =>
      floor(log(x.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
    val tf = df
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("token").agg(sum("tf").as("c"))
    val tot = vocab.agg(sum("c").as("total"))
    val surprisal = vocab.crossJoin(broadcast(tot))
      .select(col("token"), (qln(col("total")) - qln(col("c"))).as("surp_micro"))
    tf.join(surprisal, Seq("token"))
      .groupBy(idCol)
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("surp_micro")).as("ssum"))
      .select(col(idCol), col("n_tokens"),
        (col("ssum").cast("double") / col("n_tokens").cast("double") /
          lit(1000000.0)).as("mean_surprisal_nats"))
  }

  /** Benchmark-contamination audit — the decontamination pre-step of every
    * LLM training pipeline: for each corpus document, the number of
    * distinct k-gram shingles it shares with ANY benchmark document.
    *
    * Scale shape: both sides explode to (id, shingle) — already distinct
    * per doc via the shingle builder — and the benchmark side collapses to
    * a distinct shingle set that is ALWAYS small relative to the corpus
    * (benchmark suites are fixed-size; the corpus is the 100 TB side).
    * Two-tier plan on the actual set size:
    *
    *  - driver-sized benchmark (≤ [[ContaminationInSetLimit]] shingles,
    *    every real eval suite): ONE pass over the benchmark collects the
    *    exact set, and the corpus side becomes explode → `InSet` filter →
    *    one partial-aggregated groupBy. No join, no second shuffle — the
    *    minimum possible plan, and the membership test is exact.
    *  - oversized benchmark: the distinct set is localCheckpoint'ed once
    *    (it feeds two consumers), a driver bloom filter built from it
    *    pre-filters the exploded corpus BEFORE the shingle equi-join, and
    *    the exact join removes the bloom's false positives. The bloom is
    *    what keeps the join shuffle carrying ~matches instead of the
    *    entire exploded corpus once the benchmark outgrows broadcast size.
    *
    * Docs with zero overlap are absent (inner join semantics on both
    * tiers) — left-join the corpus ids back for explicit zeros if needed. */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, k: Int = 3,
                    inSetLimit: Int = ContaminationInSetLimit): DataFrame = {
    import graft.dedup.Dedup
    def sh(df: DataFrame) = df
      .select(col(idCol), Dedup.normTokens(col(textCol)).as("_tk"))
      .select(col(idCol), explode(Dedup.shinglesFromTokens(col("_tk"), k)).as("shingle"))
    val benchSh = sh(benchmark).select("shingle").distinct()
    val probe = benchSh.limit(inSetLimit + 1).collect().map(_.getString(0))
    val matched =
      if (probe.length <= inSetLimit)
        sh(corpus).filter(col("shingle").isin(probe.toSeq: _*))
      else {
        val bench = benchSh.localCheckpoint(true)
        val bloom = bench.stat.bloomFilter("shingle",
          expectedNumItems = math.max(1024L, bench.count()), fpp = 0.01)
        val bcBloom = corpus.sparkSession.sparkContext.broadcast(bloom)
        val mightContain =
          udf((s: String) => s != null && bcBloom.value.mightContainString(s))
        sh(corpus).filter(mightContain(col("shingle")))
          .join(bench, Seq("shingle"))
      }
    matched.groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** Benchmark-shingle count up to which [[contamination]] collects the
    * exact set driver-side (an `InSet` of 100k strings is a few MB —
    * trivially broadcast-able); above it, bloom + equi-join. */
  val ContaminationInSetLimit: Int = 100000

  /** Document chunking — the context-window packing pre-step of every LLM
    * training pipeline: each document's token stream becomes overlapping
    * windows of `chunkSize` tokens starting every `stride` tokens. The last
    * chunk keeps the tail (may be shorter); start positions run
    * 0, stride, …, ⌈(n − chunkSize)/stride⌉·stride so the tail is always
    * covered. Emits (id, chunk_no, chunk, n_tokens).
    *
    * Scale shape: pure per-row tokenize + explode — zero shuffle; output
    * fans ~n/stride× and flows into whatever partitioning downstream needs.
    * Deterministic (no RNG), so cross-engine oracle-checkable. Empty /
    * whitespace-only documents emit NO chunks (the [[tokens]] helper plus
    * the n_tokens > 0 filter — a bare split would fabricate a phantom
    * 1-token "" chunk per empty doc). */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, chunkSize: Int, stride: Int)
      : org.apache.spark.sql.DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val tk = df.select(col(idCol), tokens(lower(col(textCol))).as("_tk"))
    val last = greatest(
      floor((size(col("_tk")) - chunkSize + (stride - 1)).cast("double") / stride)
        .cast("long"), lit(0L))
    val piece = (i: Column) =>
      slice(col("_tk"), (i * stride + 1).cast("int"), lit(chunkSize))
    tk.withColumn("_i", explode(sequence(lit(0L), last)))
      .select(col(idCol), col("_i").as("chunk_no"),
        concat_ws(" ", piece(col("_i"))).as("chunk"),
        size(piece(col("_i"))).as("n_tokens"))
      .filter(col("n_tokens") > 0)
  }

  /** Boilerplate coverage per document — the global-frequency pass of
    * CCNet/RefinedWeb-style curation: a k-gram appearing in ≥ `minDf`
    * documents is boilerplate (navigation chrome, license blurbs, share
    * buttons), and a document is scored by the fraction of its k-gram
    * POSITIONS covered by hot k-grams. Complements [[graft.dedup.Dedup
    * .duplicatedSpans]], which deliberately IGNORES hot shingles — this is
    * the operator that measures what that one skips.
    *
    * Scale shape: shingle explode is per-row; the document-frequency count
    * is one shingle-keyed aggregate; the hot table joins back onto the
    * positional shingles — its size is data-dependent (≤ positions/minDf),
    * so the join is left to AQE, which broadcasts when the filtered
    * aggregate lands small and falls back to a shingle-keyed shuffle when
    * it doesn't; the per-doc ratio is one id-keyed aggregate. The corpus-scale
    * positional-shingle table is deliberately NOT materialized — it is
    * recomputed on each side (two document scans), because checkpointing
    * O(corpus tokens) rows costs more than the second map-only scan at
    * any scale.
    *
    * Documents with fewer than k tokens have no k-grams and are absent
    * from the output (mirrored by the oracle). */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 2, minDf: Int = 35): DataFrame = {
    require(k > 0 && minDf > 1, s"need k > 0 and minDf > 1, got k=$k minDf=$minDf")
    val sh = docs
      .select(col(idCol), graft.dedup.Dedup.normTokens(col(textCol)).as("_tk"))
      .select(col(idCol),
        posexplode(graft.dedup.Dedup.positionalShingles(col("_tk"), k))
          .as(Seq("pos", "shingle")))
      .filter(col("shingle").isNotNull)
    val hot = sh.groupBy("shingle")
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col("shingle"), lit(1L).as("_hot"))
    sh.join(hot, Seq("shingle"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("_hot")), lit(0L)).as("n_hot"))
      .withColumn("hot_ratio",
        round(col("n_hot").cast("double") / col("n_shingles"), 6))
  }

  /** Gopher-style composite quality gate (Rae et al. 2021 §A1.1, the
    * standard pre-training document filter): per-document token count,
    * mean token length, and stopword presence, each with its rule flag,
    * plus the conjunction. Rules whose signals are structurally absent
    * from whitespace-token corpora (bullet/ellipsis line fractions,
    * symbol-to-word ratio) are omitted rather than emitted as constants.
    *
    * Determinism: every rule evaluates on EXACT integers — the mean-length
    * band [3, 10] is the cross-multiplied `3·n ≤ chars ≤ 10·n`, never a
    * float threshold — so flags are bit-identical cross-engine. The one
    * float column (`mean_tok_len`) is a single correctly-rounded division
    * of exact BIGINTs, emitted unrounded.
    *
    * Scale shape: pure per-row projection — codegen'd, zero shuffle; runs
    * at scan speed on any corpus size. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Int = 50, maxTokens: Int = 100000,
                  stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    df.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        length(regexp_replace(col(textCol), "\\s+", "")).cast("long")
          .as("sum_tok_chars"),
        stopwordCount(toks, stopwords).cast("long").as("stop_count"))
      .withColumn("mean_tok_len",
        when(col("n_tokens") > 0,
          col("sum_tok_chars").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("ok_len",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
          .cast("int"))
      .withColumn("ok_mean",
        (lit(3L) * col("n_tokens") <= col("sum_tok_chars") &&
         col("sum_tok_chars") <= lit(10L) * col("n_tokens")).cast("int"))
      .withColumn("ok_stop", (col("stop_count") >= 2L).cast("int"))
      .withColumn("pass",
        (col("ok_len") === 1 && col("ok_mean") === 1 && col("ok_stop") === 1)
          .cast("int"))
  }

  /** Gopher repetition signals at n-gram grain (Rae et al. 2021 §A1.1):
    * per document, the character share of the single most-covering n-gram
    * (`top_share` — the "fraction of characters in the most frequent
    * n-gram" family, made tiebreak-free by taking the max of
    * occurrences × gram-chars rather than picking one most-frequent gram)
    * and the character share of all DUPLICATED n-grams (`dup_frac` — the
    * "fraction of characters in duplicate n-grams" family; overlapping
    * occurrences each count, the documented upper-bound reading).
    *
    * Character weights count token characters only (gram length minus the
    * n−1 joiner spaces), so both shares are ratios of exact BIGINT sums —
    * one correctly-rounded division each, bit-identical cross-engine,
    * emitted unrounded. Documents with fewer than n tokens have no
    * n-grams and are absent from the output (mirrored by the oracle).
    *
    * Scale shape: explode n-grams → (doc, gram) count → per-doc aggregate,
    * both map-side combinable; no join, no all-pairs. The n-gram array is
    * built with `transform(sequence(...))` over slices — per-row, inside
    * codegen. */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 2): DataFrame = {
    require(n >= 2, s"need n >= 2, got $n")
    // materialize the token array in its own projection FIRST: inside the
    // interpreted transform lambda below, a raw normTokens expression
    // would re-run lower+regexp+split per ELEMENT (the O(n) pitfall
    // documented at Dedup.shinglesFromTokens) — measured 3.7 s → 0.6 s
    // steady on the sf0.1 corpus from this one aliasing
    val tk = col("_tk")
    val grams = when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", slice(tk, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), graft.dedup.Dedup.normTokens(col(textCol)).as("_tk"))
      .select(col(idCol), explode(grams).as("g"))
      .groupBy(idCol, "g")
      .agg(count(lit(1)).as("c"),
        (max(length(col("g"))) - (n - 1)).cast("long").as("glen"))
      .groupBy(idCol)
      .agg(sum("c").as("n_grams"),
        sum(col("c") * col("glen")).as("_tot"),
        max(col("c") * col("glen")).as("_top"),
        coalesce(sum(when(col("c") >= 2, col("c") * col("glen"))), lit(0L))
          .as("_dup"))
      .select(col(idCol), col("n_grams"),
        (col("_top").cast("double") / col("_tot").cast("double"))
          .as("top_share"),
        (col("_dup").cast("double") / col("_tot").cast("double"))
          .as("dup_frac"))
  }

  /** Quantized natural log: floor(ln·1e6 + 0.5) as a BIGINT micro-nat —
    * the Column face of the scalar contract at
    * [[graft.expressions.CharEntropyUtil.qln]] (same formula; keep them
    * in lockstep — the bitwise parity specs rest on it).
    * Probed bit-identical vs DuckDB `ln` after the same quantization for
    * every count ≤ 2e6 (see [[unigramSurprisal]]); all LM scoring below
    * carries surprisal as these exact integers and defers floats to one
    * final fixed expression. */
  private def qln(x: Column): Column =
    floor(log(x.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")

  /** Bigram-LM perplexity filter — the model-order-2 step up from
    * [[unigramSurprisal]] (KenLM analog): mean per-bigram surprisal in
    * nats under the corpus's own add-1-smoothed bigram model,
    * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V), with V the corpus unigram
    * vocabulary. Fluent text (bigrams the corpus has seen) scores low;
    * word salad scores near ln(c(w₁·)+V).
    *
    * Exactness: surprisal per bigram = qln(c(w₁·)+V) − qln(c(w₁w₂)+1) in
    * micro-nats; per-doc sums are exact BIGINTs; ssum/n/1e6 is the one
    * final double expression, identical operand order in the oracle.
    *
    * Scale shape: bigram formation is PER-ROW (zip of the token array
    * with its own 1-shift — no posexplode + self-join on position, which
    * would shuffle the whole corpus on (doc, pos)); then (doc,w₁,w₂) and
    * (w₁,w₂) counts (map-side combinable), a (w₁)-keyed marginal, a
    * 1-row V broadcast, and one token-keyed equi-join back — the same
    * minimum LM-scoring shape as unigram, one aggregate deeper. Docs
    * with < 2 tokens have no bigrams and emit no row (both engines). */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String,
                      checkpoint: DataFrame => DataFrame =
                        _.localCheckpoint(true)): DataFrame = {
    val tk = df.select(col(idCol), tokens(lower(col(textCol))).as("_tk"))
    val bg = tk.filter(size(col("_tk")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("_tk"), lit(1), size(col("_tk")) - 1),
        slice(col("_tk"), lit(2), size(col("_tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("_b"))
      .select(col(idCol), col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    // materialize per-doc bigram counts ONCE: bf feeds both the LM
    // cascade (c12 -> c1) and the final surprisal join — without the
    // checkpoint the tokenize+zip+explode+groupBy subtree runs twice
    // (round-19 jaccardVerify finding; size-gated by the caller)
    val bf = checkpoint(
      bg.groupBy(idCol, "w1", "w2").agg(count(lit(1)).as("tf")))
    val c12 = bf.groupBy("w1", "w2").agg(sum("tf").as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocabN = df.select(explode(tokens(lower(col(textCol)))).as("token"))
      .agg(countDistinct("token").as("v"))
    val lm = c12.join(c1, Seq("w1")).crossJoin(broadcast(vocabN))
      .select(col("w1"), col("w2"),
        (qln(col("c1") + col("v")) - qln(col("c12") + lit(1L))).as("surp_micro"))
    bf.join(lm, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(sum("tf").as("n_bigrams"),
        sum(col("tf") * col("surp_micro")).as("ssum"))
      .select(col(idCol), col("n_bigrams"),
        (col("ssum").cast("double") / col("n_bigrams").cast("double") /
          lit(1000000.0)).as("mean_surprisal_nats"))
  }

  /** Per-group distribution drift: KL(group ‖ corpus) over unigram token
    * distributions, the mixture-calibration read ("how far is each
    * source's token distribution from the blend") run before setting
    * sampling weights. KL = Σ_t p_g(t)·ln(p_g(t)/p(t)) with p_g = c_gt/n_g
    * and p = c_t/N — always ≥ 0 up to micro-nat quantization.
    *
    * Exactness: the log ratio splits into four individually-quantized
    * micro-nat terms, qln(c_gt) − qln(n_g) − qln(c_t) + qln(N), combined
    * and tf-weighted as exact BIGINTs; ssum/n_g/1e6 is the one final
    * double expression.
    *
    * Scale shape: (group, token) counts → a group marginal and a token
    * marginal (all map-side combinable), a 1-row N broadcast, and the
    * token-keyed equi-join of group counts against the token marginal —
    * the only wide join is keyed on the open-ended dimension (token),
    * never on all-pairs. Group cardinality (sources) is small by
    * construction, so the group marginal broadcasts. */
  def sourceDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gtf = df
      .select(col(groupCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(groupCol, "token").agg(count(lit(1)).as("cgt"))
    val ng = gtf.groupBy(groupCol).agg(sum("cgt").as("ng"))
    val ct = gtf.groupBy("token").agg(sum("cgt").as("ct"))
    val tot = ct.agg(sum("ct").as("n"))
    gtf.join(ct, Seq("token"))
      .join(broadcast(ng), Seq(groupCol))
      .crossJoin(broadcast(tot))
      .select(col(groupCol), col("ng"),
        (col("cgt") * (qln(col("cgt")) - qln(col("ng")) - qln(col("ct")) +
          qln(col("n")))).as("_w"))
      .groupBy(groupCol)
      .agg(max("ng").as("n_tokens"), sum("_w").as("ssum"))
      .select(col(groupCol), col("n_tokens"),
        (col("ssum").cast("double") / col("n_tokens").cast("double") /
          lit(1000000.0)).as("kl_nats"))
  }

  /** DSIR-style importance weights: per-document log-likelihood ratio of
    * an add-1-smoothed target unigram LM over the corpus (source) LM,
    * log w(d) = Σ_t tf_dt·(ln p_T(t) − ln p_S(t)), with
    * p_T(t) = (c_T(t)+1)/(N_T+V) over the `target` predicate's rows and
    * p_S(t) the same over the whole corpus — the "Data Selection via
    * Importance Resampling" score used to tilt a 100 TB crawl toward a
    * target domain. Positive = looks more like the target than the blend.
    *
    * Exactness: per-token ratio = (qln(c_T+1) − qln(N_T+V)) −
    * (qln(c_S+1) − qln(N_S+V)) in micro-nats, tf-weighted exact BIGINT
    * sums; logw = ssum/1e6 is a single exact-integer-to-double division.
    *
    * Scale shape: corpus token counts (map-side combinable), target
    * counts as a LEFT join of the corpus vocabulary against the
    * target-subset counts (absent → c_T = 0 — smoothing keeps the ratio
    * finite), two 1-row total broadcasts, one token-keyed scoring join.
    * The target is a filter of the same scan, not a second dataset pass. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        target: Column): DataFrame = {
    val tf = df
      .select(col(idCol), target.as("_t"),
        explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(idCol, "_t", "token").agg(count(lit(1)).as("tf"))
    val cs = tf.groupBy("token").agg(sum("tf").as("cs"))
    val ctg = tf.filter(col("_t")).groupBy("token").agg(sum("tf").as("ctg"))
    val vocabTot = cs.agg(count(lit(1)).as("v"), sum("cs").as("ns"))
    val ntg = ctg.agg(coalesce(sum("ctg"), lit(0L)).as("nt"))
    val lm = cs.join(ctg, Seq("token"), "left")
      .crossJoin(broadcast(vocabTot)).crossJoin(broadcast(ntg))
      .select(col("token"),
        ((qln(coalesce(col("ctg"), lit(0L)) + lit(1L)) -
          qln(col("nt") + col("v"))) -
         (qln(col("cs") + lit(1L)) - qln(col("ns") + col("v"))))
          .as("lr_micro"))
    tf.join(lm, Seq("token"))
      .groupBy(idCol)
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("lr_micro")).as("ssum"))
      .select(col(idCol), col("n_tokens"),
        (col("ssum").cast("double") / lit(1000000.0)).as("logw_nats"))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`k` vocabulary —
    * the tokenizer-coverage read run before (re)training a tokenizer:
    * documents whose mass falls outside the head vocabulary are the ones
    * a frozen tokenizer will shred into bytes. Vocabulary selection is
    * deterministic (count desc, token asc — the q_vocab_topk tiebreak).
    *
    * Exactness: integer counts; oov_rate = n_oov/n_tokens is one
    * correctly-rounded division of exact BIGINTs.
    *
    * Scale shape: (doc, token) counts → token marginal → global top-k
    * (TakeOrdered pushes partial top-k map-side; k is a constant) → the
    * k-row vocabulary BROADCASTS into a left join against the per-doc
    * counts (k is small by definition — this is the one join in the
    * family where forcing broadcast is correct) → per-doc aggregate. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              k: Int = 100): DataFrame = {
    val tf = df
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("token").agg(sum("tf").as("c"))
      .orderBy(col("c").desc, col("token")).limit(k)
      .select(col("token"), lit(1).as("_inv"))
    tf.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(idCol)
      .agg(sum("tf").as("n_tokens"),
        coalesce(sum(when(col("_inv").isNull, col("tf"))), lit(0L))
          .as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Per-document character-distribution entropy in nats — the gibberish/
    * binary-spill detector (natural text sits in a narrow entropy band;
    * base64 blobs and key-mash run high, repeated-char padding runs low).
    * H = ln n − (1/n)·Σ c·ln c over per-doc code-point counts.
    *
    * Exactness: H = (n·qln(n) − Σ c·qln(c)) / n / 1e6 with qln the
    * micro-nat integer log — the numerator is an exact BIGINT both
    * engines compute identically, then ONE double division chain.
    * Characters are code points on both sides (Spark `substr` indexes
    * code points, DuckDB splits per code point); the synthetic corpus is
    * BMP-only, where the two notions coincide.
    *
    * Scale shape: per-row code-point explode (n_chars rows — the scan
    * dominates), one (doc, char) count, one per-doc aggregate, both
    * map-side combinable; no join at all. */
  /** Kernel-dispatch face of [[charEntropy]]: when the
    * `graft_char_entropy` extension is registered, the whole computation
    * is ONE zero-shuffle scan expression (the compositional plan below
    * shuffles ~corpus-characters rows twice); values are bit-identical
    * (CharEntropySpec parity). Empty documents are absent either way
    * (the explode emits nothing; here an explicit filter mirrors it). */
  def charEntropyAuto(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hasKernel = scala.util.Try(
      df.sparkSession.catalog.functionExists("graft_char_entropy"))
      .getOrElse(false)
    if (hasKernel)
      df.filter(length(col(textCol)) > 0)
        .select(col(idCol),
          length(col(textCol)).cast("long").as("n_chars_cp"),
          call_function("graft_char_entropy", col(textCol)).as("entropy_nats"))
    else charEntropy(df, idCol, textCol)
  }

  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cf = df
      .select(col(idCol), col(textCol).as("_t"))
      .select(col(idCol), explode(
        // empty-text guard: sequence(1, 0) would DESCEND ([1, 0]), not
        // produce an empty array
        when(length(col("_t")) > 0, transform(
            sequence(lit(1), length(col("_t"))),
            i => col("_t").substr(i, lit(1))))
          .otherwise(array().cast("array<string>"))).as("ch"))
      .groupBy(idCol, "ch").agg(count(lit(1)).as("c"))
    cf.groupBy(idCol)
      .agg(sum("c").as("n_chars_cp"),
        sum(col("c") * qln(col("c"))).as("_ssum"))
      .select(col(idCol), col("n_chars_cp"),
        ((col("n_chars_cp") * qln(col("n_chars_cp")) - col("_ssum"))
          .cast("double") / col("n_chars_cp").cast("double") /
          lit(1000000.0)).as("entropy_nats"))
  }

  /** Distribution drift vs a FROZEN reference — the monitoring read (vs
    * [[sourceDivergence]]'s corpus-internal comparison): per `groupCol`
    * group of the SCORING rows (¬`refPred`), KL(group ‖ reference) where
    * the reference unigram LM is built from the `refPred` rows and
    * add-1-smoothed over its V+1-outcome support (V reference tokens +
    * one OOV bucket that absorbs every unseen token). The streaming twin
    * ([[graft.streaming.StreamingDrift]]) computes the identical
    * micro-nat integers incrementally; parity is asserted bitwise.
    *
    * Scale shape: reference counts are one aggregate of the same scan
    * (a filter, not a second pass); scoring tokens LEFT-join the
    * reference vocabulary (token-keyed — the only open-ended join),
    * collapse to support+OOV, and aggregate per (group, token) then per
    * group. Two 1-row broadcasts carry (N_ref, V). */
  def referenceDrift(df: DataFrame, groupCol: String, textCol: String,
                     refPred: Column): DataFrame = {
    // THE shared OOV sentinel (StreamingDrift.OovToken -- which the
    // q_drift_ref oracle's ' oov' literal mirrors): one definition, so the
    // batch path, the streaming twin, and the oracle can never silently
    // diverge on the bucket key.
    val oov = lit(graft.streaming.StreamingDrift.OovToken)
    val tok = df
      .select(col(groupCol), refPred.as("_r"),
        explode(tokens(lower(col(textCol)))).as("token"))
    val ref = tok.filter(col("_r")).groupBy("token").agg(count(lit(1)).as("rc"))
    val refTot = ref.agg(coalesce(sum("rc"), lit(0L)).as("nref"),
      count(lit(1)).as("v"))
    val sc0 = tok.filter(!col("_r"))
      .join(ref, Seq("token"), "left")
      .select(col(groupCol),
        when(col("rc").isNotNull, col("token")).otherwise(oov).as("k"))
    val kc = sc0.groupBy(groupCol, "k").agg(count(lit(1)).as("c"))
      .join(ref.withColumnRenamed("token", "k"), Seq("k"), "left")
      .withColumn("rc", coalesce(col("rc"), lit(0L)))
    val ng = kc.groupBy(groupCol).agg(sum("c").as("n"))
    kc.join(broadcast(ng), Seq(groupCol))
      .crossJoin(broadcast(refTot))
      .select(col(groupCol), col("n"),
        (col("c") * (qln(col("c")) - qln(col("n")) - qln(col("rc") + lit(1L)) +
          qln(col("nref") + col("v") + lit(1L)))).as("_w"))
      .groupBy(groupCol)
      .agg(max("n").as("n_tokens"), sum("_w").as("ssum"))
      .select(col(groupCol), col("n_tokens"),
        (col("ssum").cast("double") / col("n_tokens").cast("double") /
          lit(1000000.0)).as("kl_nats"))
  }

  /** Cross-document n-gram novelty: for each document, the fraction of
    * its DISTINCT k-gram shingles that no earlier document (smaller id)
    * contains — the "how much new text does this doc add" curation read,
    * the complement of boilerplate/duplication. A crawl snapshot ordered
    * by fetch time scores later recrawls near 0.
    *
    * Exactness: pure integer counts; novel_frac = (n_sh − n_seen)/n_sh
    * is one correctly-rounded division of exact BIGINTs.
    *
    * Scale shape: distinct shingles per doc (per-row, from the shared
    * [[graft.dedup.Dedup.shinglesFromTokens]] builder), one
    * shingle-keyed min-id aggregate (map-side combinable), one
    * shingle-keyed equi-join back, one per-doc aggregate. No all-pairs,
    * no window over the corpus — the min-id table plays the role a
    * first-occurrence index would. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3,
                   checkpoint: DataFrame => DataFrame =
                     _.localCheckpoint(true)): DataFrame = {
    import graft.dedup.Dedup
    // materialize the exploded shingle rows ONCE: sh feeds both the
    // first-seen index and the join back — the tokenize+shingle+explode
    // subtree otherwise runs twice (round-19 jaccardVerify finding;
    // size-gated by the caller — this IS a corpus-shingle-row table,
    // the duplicatedSpans checkpoint precedent)
    val sh = checkpoint(df
      .select(col(idCol), Dedup.normTokens(col(textCol)).as("_tk"))
      .select(col(idCol),
        explode(Dedup.shinglesFromTokens(col("_tk"), k)).as("shingle")))
    val first = sh.groupBy("shingle").agg(min(col(idCol)).as("_first"))
    sh.join(first, Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_first") < col(idCol), 1L).otherwise(0L)).as("n_seen"))
      .select(col(idCol), col("n_shingles"), col("n_seen"),
        ((col("n_shingles") - col("n_seen")).cast("double") /
          col("n_shingles").cast("double")).as("novel_frac"))
  }
}
