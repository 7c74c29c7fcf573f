package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the tokenizer-training kernel: repeat
  * "count adjacent symbol pairs, merge the most frequent" over the word
  * table. Classic BPE trains on (distinct word, frequency), so the state
  * is the deduplicated word table — millions of rows at 100 TB, never the
  * corpus — and each round is one distributed pair-count aggregation plus
  * a map-only merge application; the driver holds only the argmax pair
  * (one-row collect per round, the k-means loop pattern).
  *
  * Words are carried as COMMA-FORM strings: symbols joined with ",,",
  * the whole word wrapped in single commas (`cat` → `",c,,a,,t,,_,"`,
  * `_` the end-of-word marker). A merge of pair (a, b) is then the plain
  * substring replace of `",a,,b,"` with `",ab,"` — the single outer
  * commas borrow one comma from each ",," boundary, so non-overlapping
  * occurrences ALL merge in one left-to-right pass (greedy BPE exactly),
  * while a symbol whose text merely ends with `a` can never false-match
  * (its boundary has two commas). Plain `replace` semantics are identical
  * across engines, which is what makes the DuckDB round-by-round replay
  * bit-exact.
  */
object Bpe {

  final case class Merge(step: Int, pair: String, cnt: Long)

  /** Comma-form word-frequency table (s, cnt) over lowercase `[a-z]+`
    * tokens (pure-ASCII filter keeps char splitting engine-agnostic). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextStats.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(","),
        regexp_replace(col("w"), "(.)", "$1,,"), lit("_,")).as("s"),
        col("cnt"))

  /** Adjacent symbol pairs of a comma-form word as "a b" labels. */
  private def pairsCol = {
    val l = filter(split(col("s"), ","), y => y =!= lit(""))
    zip_with(l, slice(l, lit(2), greatest(size(l) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Encode: per-document BPE token counts after applying `merges` once
    * each, in training order (the deterministic encoding the trainer's own
    * merge applications define — each merge is one global greedy pass).
    * Output: (idCol, bpe_tokens, n_words); merges ride as literals in the
    * chained replace expressions, so the plan is scan + per-row string
    * work + one aggregate. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(TextStats.tokens(lower(col(textCol))))
        .as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    // Kernel dispatch (session contract like ExactPercentiles.pctl,
    // checked on the DataFrame's own session): graft_bpe_count collapses
    // the per-word comma-form chain — one regexp_replace per char, one
    // whole-string replace PER MERGE, a regex split and an interpreted
    // HOF filter — into a single symbol-array pass per merge.
    // Left-to-right non-overlapping equivalence with Spark's `replace`
    // and the comma framing is spec-pinned in BpeCountSpec; unregistered
    // sessions keep the expression chain — identical counts either way.
    val useKernel = scala.util.Try(docs.sparkSession.catalog
      .functionExists("graft_bpe_count")).getOrElse(false)
    val nSym =
      if (useKernel) {
        val mergesArr =
          if (merges.isEmpty) typedLit(Array.empty[String])
          else array(merges.map(m => lit(m.pair)): _*)
        words.select(col(idCol),
          call_function("graft_bpe_count", col("w"), mergesArr).as("n_sym"))
      } else {
        var df = words.select(col(idCol), concat(lit(","),
          regexp_replace(col("w"), "(.)", "$1,,"), lit("_,")).as("s"))
        merges.foreach { m =>
          val Array(a, b) = m.pair.split(" ")
          df = df.select(col(idCol),
            expr(s"replace(s, ',$a,,$b,', ',$a$b,')").as("s"))
        }
        df.select(col(idCol),
          size(filter(split(col("s"), ","), y => y =!= lit(""))).as("n_sym"))
      }
    nSym.groupBy(idCol)
      .agg(sum("n_sym").as("bpe_tokens"), count(lit(1)).as("n_words"))
  }

  /** Word-count rows up to which [[train]] collects the vocabulary and
    * folds the merge rounds driver-side (a distinct-word table is bounded
    * — it saturates in the low millions regardless of corpus size — and
    * 200k comma-form words are a few MB). Above it, the distributed
    * per-round aggregation loop runs. The same two-tier rule as
    * `TextStats.ContaminationInSetLimit`. */
  val DriverVocabLimit: Int = 200000

  /** Run up to `n` merge rounds; stops early when no pair remains.
    * Two-tier on the vocabulary's actual size: driver fold under
    * [[DriverVocabLimit]] (the common case — measured 2.4 s → ~0.4 s for
    * the 8-round train at sf0.1), distributed loop above it. Both tiers
    * are the same algorithm to the tiebreak (parity-asserted in BpeSpec):
    * adjacent-pair counts weighted by word frequency, argmax by
    * (count desc, pair asc), one global non-overlapping left-to-right
    * replace per round. */
  def train(words0: DataFrame, n: Int): Seq[Merge] = {
    // persist BEFORE the probe: above the limit, the probe's partial
    // evaluation is cached and trainDistributed's round-0 base reuses it
    // instead of re-running the whole tokenize/count pipeline (its own
    // persist of the same frame is a no-op); under the limit the persist
    // is dropped right after the one collect that populated it
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val mat = words0.persist(sl)
    val probe = mat.limit(DriverVocabLimit + 1).collect()
    if (probe.length <= DriverVocabLimit) {
      mat.unpersist(false)
      trainLocal(probe.map(r => (r.getString(0), r.getLong(1))), n)
    } else
      try trainDistributed(mat, n) finally mat.unpersist(false)
  }

  /** Driver tier: identical fold over the collected vocabulary. ASCII
    * symbols make Scala's string order equal UTF8String binary order, so
    * the (count desc, pair asc) tiebreak matches the distributed tier
    * exactly; `String.replace` is the same non-overlapping left-to-right
    * rule as Spark's `replace`. */
  private[text] def trainLocal(words0: Array[(String, Long)],
                               n: Int): Seq[Merge] = {
    var words = words0
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var step = 1
    var done = false
    while (step <= n && !done) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (s, cnt) =>
        val syms = s.split(",").filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          counts.update(p, counts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (p, c) = counts.minBy { case (k, v) => (-v, k) }
        out += Merge(step, p, c)
        val Array(a, b) = p.split(" ")
        words = words.map { case (s, cnt) =>
          (s.replace(s",$a,,$b,", s",$a$b,"), cnt)
        }
        step += 1
      }
    }
    out.toSeq
  }

  /** Distributed tier: per round one pair-count aggregation + a map-only
    * merge application over the persisted word table. */
  private[text] def trainDistributed(words0: DataFrame,
                                     n: Int): Seq[Merge] = {
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = words0.persist(sl)
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var step = 1
    var done = false
    while (step <= n && !done) {
      val top = words.select(col("cnt"), explode(pairsCol).as("p"))
        .filter(col("p").isNotNull)
        .groupBy("p").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("p").asc)
        .limit(1).collect() // exactly one row reaches the driver
      if (top.isEmpty) done = true
      else {
        val (p, c) = (top(0).getString(0), top(0).getLong(1))
        out += Merge(step, p, c)
        val Array(a, b) = p.split(" ")
        val next = words
          .select(expr(s"replace(s, ',$a,,$b,', ',$a$b,')").as("s"),
            col("cnt"))
          .persist(sl)
        next.count()
        words.unpersist(false)
        words = next
        step += 1
      }
    }
    words.unpersist(false)
    out.toSeq
  }
}
