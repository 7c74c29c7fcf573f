package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor — the unbounded-stream face of
  * `graft.text.TextStats.referenceDrift`: per-source token counts are
  * maintained INCREMENTALLY against a frozen reference LM, and the
  * running KL(source ‖ reference) is emitted after every document. The
  * production read: "is this source's token distribution sliding away
  * from the distribution we trained/calibrated on" — on the live ingest
  * stream rather than a nightly batch.
  *
  * State per source is BOUNDED at |reference vocabulary| + 1 entries
  * regardless of stream length: tokens outside the reference support
  * collapse into one OOV bucket (exactly the batch operator's smoothing
  * support, which is what makes parity exact). Like every keyed stateful
  * op, the only shuffle is the groupByKey exchange and state shards
  * across executors by source.
  *
  * All surprisal math is the shared micro-nat integer quantization
  * ([[qln]]), so the streaming fold and the batch operator compute
  * IDENTICAL doubles — StreamingDriftSpec asserts bitwise parity of the
  * final point against `referenceDrift` on the same prefix. */
object StreamingDrift {

  /** One arriving document: source key, pre-tokenized text, ingest seq. */
  final case class Doc(source: String, tokens: Seq[String], seq: Long)

  /** Per-source counts over the reference support + OOV bucket. */
  final case class DriftState(counts: Map[String, Long], n: Long)

  /** Emitted after each doc: running token count + running KL. */
  final case class DriftPoint(source: String, seq: Long, nTokens: Long,
                              klNats: Double)

  /** The OOV bucket key — contains a space, which whitespace tokenization
    * can never produce, so it cannot collide with a real token. THE single
    * shared definition: the batch twin ([[graft.text.TextStats
    * .referenceDrift]]) uses this constant and the q_drift_ref DuckDB
    * oracle mirrors it as the literal `' oov'` — change all three
    * together or the bitwise batch/stream/oracle parity breaks. */
  val OovToken = " oov"

  /** The shared scalar micro-nat log
    * ([[graft.expressions.CharEntropyUtil.qln]]) — one definition, so
    * batch and stream agree bitwise by construction. */
  def qln(x: Long): Long = graft.expressions.CharEntropyUtil.qln(x)

  /** KL(counts ‖ ref) in nats from exact integer counts; the reference is
    * add-1-smoothed over its V+1-outcome support (V tokens + OOV). Pure —
    * the single definition both the streaming fold and the spec's batch
    * replica call. */
  def klNats(counts: Map[String, Long], n: Long,
             ref: Map[String, Long], refTotal: Long): Double = {
    if (n <= 0L) return 0.0
    val denom = qln(refTotal + ref.size + 1L)
    var ssum = 0L
    counts.foreach { case (t, c) =>
      val rc = ref.getOrElse(t, 0L) // OovToken never appears in ref
      ssum += c * (qln(c) - qln(n) - qln(rc + 1L) + denom)
    }
    ssum.toDouble / n / 1e6
  }

  /** Incremental drift over an unbounded doc stream. `ref` is the frozen
    * reference token→count table (broadcast once; reference LMs are
    * vocabulary-sized, the broadcastable side by construction). Docs fold
    * in `seq` order within each micro-batch, so replays are
    * deterministic. */
  def drift(docs: Dataset[Doc], ref: Map[String, Long],
            refTotal: Long): Dataset[DriftPoint] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcRef = spark.sparkContext.broadcast(ref)

    def update(source: String, batch: Iterator[Doc],
               state: GroupState[DriftState]): Iterator[DriftPoint] = {
      val refMap = bcRef.value
      var st = state.getOption.getOrElse(DriftState(Map.empty, 0L))
      val out = scala.collection.mutable.ArrayBuffer[DriftPoint]()
      batch.toSeq.sortBy(_.seq).foreach { d =>
        var counts = st.counts
        var n = st.n
        d.tokens.foreach { t =>
          val k = if (refMap.contains(t)) t else OovToken
          counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
          n += 1L
        }
        st = DriftState(counts, n)
        out += DriftPoint(source, d.seq, n,
          klNats(counts, n, refMap, refTotal))
      }
      state.update(st)
      out.iterator
    }

    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
