package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding-distribution drift — the unbounded-stream face of
  * `graft.sim.Ann.embeddingDrift`: the per-dimension mean of the
  * arriving vectors is maintained incrementally on the same exact
  * ⌊v·10⁶⌋ integer grid and compared after every arrival against a
  * FROZEN reference mean vector (the batch that trained the encoder /
  * built the quantizers). The production read: "is the live embedding
  * stream sliding away from the distribution the index was built on" —
  * the signal that triggers a quantizer refresh, emitted per arrival
  * instead of per nightly batch.
  *
  * State is dims integer sums + one count — CONSTANT-size regardless of
  * stream length, the strongest state bound in the streaming family.
  * The single-group form keeps one state shard (dims longs — trivial);
  * partition by a source key upstream if per-source drift is wanted.
  *
  * Parity: sums are exact integers, each mean is one double division,
  * and each delta rounds EXACTLY like the batch operator's delta column
  * (round(cur − ref, 6) with unrounded operands) — the spec asserts the
  * final point bitwise against a driver replica of the batch
  * arithmetic on the same prefix. */
object StreamingEmbedDrift {

  /** One arriving vector with its ingest sequence number. */
  final case class Vec(id: Long, vec: Seq[Float], seq: Long)
  /** Exact running state: per-dim ⌊v·10⁶⌋ sums and the arrival count. */
  final case class EmbedState(sums: Seq[Long], n: Long)
  /** Emitted per arrival: running count, the largest per-dim |delta|,
    * and the l2 norm of the delta vector (dims-ascending fold order —
    * deterministic, spec-replayable). */
  final case class EmbedPoint(seq: Long, n: Long, maxAbsDelta: Double,
                              l2Delta: Double)

  /** The batch grid: ⌊v·10⁶⌋ as Long — one definition for stream and
    * spec replica. */
  def grid(v: Float): Long = math.floor(v.toDouble * 1e6).toLong

  /** Deltas vs the reference means for exact state (sums, n), mirroring
    * the batch operator's op order: round(sum/n/1e6 − ref, 6). */
  def deltas(sums: Seq[Long], n: Long, refMeans: Array[Double]): Array[Double] =
    Array.tabulate(refMeans.length) { d =>
      val cur = sums(d).toDouble / n / 1e6
      BigDecimal(cur - refMeans(d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  /** Summary of a delta vector: (max |delta|, l2) — ascending-dim fold. */
  def summarize(ds: Array[Double]): (Double, Double) = {
    var mx = 0.0; var ss = 0.0
    var d = 0
    while (d < ds.length) {
      mx = math.max(mx, math.abs(ds(d)))
      ss += ds(d) * ds(d)
      d += 1
    }
    (mx, math.sqrt(ss))
  }

  /** Incremental drift over an unbounded vector stream. `refMeans` are
    * the frozen reference per-dim means computed with the batch
    * arithmetic (exact grid sums / n / 1e6, UNROUNDED — rounding happens
    * at the delta, as in the batch operator). Vectors fold in `seq`
    * order within each micro-batch for deterministic replays. */
  def drift(vecs: Dataset[Vec], refMeans: Array[Double]): Dataset[EmbedPoint] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dims = refMeans.length
    val bcRef = spark.sparkContext.broadcast(refMeans)

    def update(key: Int, batch: Iterator[Vec],
               state: GroupState[EmbedState]): Iterator[EmbedPoint] = {
      val ref = bcRef.value
      var st = state.getOption.getOrElse(EmbedState(Seq.fill(dims)(0L), 0L))
      var sums = st.sums.toArray
      var n = st.n
      val out = scala.collection.mutable.ArrayBuffer[EmbedPoint]()
      batch.toSeq.sortBy(_.seq).foreach { v =>
        require(v.vec.length == dims,
          s"vector length ${v.vec.length} != dims $dims")
        var d = 0
        while (d < dims) { sums(d) += grid(v.vec(d)); d += 1 }
        n += 1
        val (mx, l2) = summarize(deltas(sums, n, ref))
        out += EmbedPoint(v.seq, n, mx, l2)
      }
      state.update(EmbedState(sums.toSeq, n))
      out.iterator
    }

    vecs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
