package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sim.Ann

/** Streaming SemDeDup — embedding dedup AT INGEST, the streaming face of
  * [[Ann.semDedupAutoIncremental]]: the survivor index is not a
  * materialized table but keyed state that accumulates as the stream
  * runs. Completes the dedup-at-ingest matrix: exact fingerprints have
  * `StreamingDetector.dedupStream`, MinHash bands have
  * [[StreamingDedup]], embeddings land here.
  *
  * The quantizer is FROZEN at stream start (`bits` — [[Ann.autoBits]] of
  * the expected corpus scale, exactly as the incremental batch path
  * freezes it at index build): cell assignment is the same md5-plane
  * sign-LSH projection as the batch family, computed per arriving row
  * with zero shuffle, and the stream is then keyed by cell. A
  * `flatMapGroupsWithState` keeps the cell's ADMITTED SURVIVORS; an
  * arrival with cosine ≥ `threshold` against any of them is dropped,
  * anything else is admitted, appended to state, and emitted.
  *
  * Semantics: the greedy survivor chain — each arrival is compared
  * against RETAINED representatives only, which is the published
  * SemDeDup keeper rule ("drop near-duplicates of the kept exemplar")
  * and the only rule whose state is the survivor set. The batch
  * registry rows use the non-transitive min-id rule instead (a dropped
  * vector still kills later neighbors) because that is what a DuckDB
  * oracle can replay without a recursive chain; the two rules differ
  * only on chains where a DROPPED vector is within threshold of a
  * later vector that no SURVIVOR covers. StreamingSemDedupSpec pins
  * the greedy reference and the arrival-order invariance.
  *
  * Scale shape: per-row work is the projection expression plus one
  * cosine pass over the cell's survivors (expected ≤ targetCell when
  * `bits` is sized by [[Ann.autoBits]] — the same capacity argument as
  * the batch operator); state per cell is the survivor vectors,
  * sharded across executors like all keyed state. For bounded
  * retention under cell drift pass `ttlMs > 0`: cells idle longer than
  * the TTL are evicted wholesale and re-accumulate from the next
  * arrival (the [[StreamingDedup]] trade, per cell instead of per
  * bucket).
  *
  * Throughput: size the STATE partition count to the active cell set,
  * not the core count — start the query inside
  * [[StreamingConf.withStatePartitions]] (32 → 4 partitions measured
  * 2.5–3.5× rows/s on this op; rationale there).
  */
object StreamingSemDedup {

  /** One admitted (surviving) vector with its cell. */
  final case class Admitted(id: Long, cell: Long)
  /** Per-cell state: admitted survivor ids + vectors, in admission order. */
  final case class CellState(ids: List[Long], vecs: List[Array[Float]])

  /** Bit-identical JVM replica of the batch cosine composition
    * (`Ann.cosine` fallback form: left-to-right double folds, then
    * dot / (sqrt·sqrt)) — the parity contract with the batch prune.
    * NaN (zero-norm inputs) compares FALSE against the threshold on
    * both sides: Spark SQL's `GreaterThanOrEqual` codegen emits the raw
    * primitive `>=` (the "NaN largest" rule applies to sorting/grouping,
    * NOT comparison operators — pinned by the zero-vector spec test), so
    * the JVM `>=` here is already bit-parity and zero-norm vectors are
    * ADMITTED by both paths. */
  private[streaming] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** (id, vec, cell) rows for a streaming (or batch) vector frame — the
    * same frozen-bits md5-plane cell family as the batch operators.
    * Pure per-row expressions, no shuffle. This Catalyst form is the
    * PARITY REFERENCE; [[admittedStream]] assigns cells with the JVM
    * replica instead (see below), and StreamingSemDedupSpec pins the two
    * equal over real embeddings. */
  def cellRows(vecs: DataFrame, idCol: String, vecCol: String,
               bits: Int, dims: Int = 64): DataFrame = {
    require(bits >= 0 && bits <= 32, "bits must be in 0..32")
    val cell = if (bits == 0) lit(0L) else Ann.lshBucketMd5(col(vecCol), bits, dims)
    vecs.select(col(idCol).cast("long").as("_id"),
      col(vecCol).cast("array<float>").as("_v"), cell.as("_cell"))
  }

  /** JVM cell assignment for the streaming path (round-13 order #6): the
    * frozen quantizer rides ONCE as a closure-captured bits×dims long
    * matrix instead of a bits×dims-LITERAL Catalyst HOF tree. In
    * Structured Streaming every micro-batch re-analyzes and re-plans the
    * logical plan — with autoBits-sized quantizers (10+ planes × 64 dims
    * = 640+ literals inside interpreted aggregate/zip_with lambdas) the
    * probe measured the semdedup row at 174 rows/s, ~5× slower than its
    * state-store-only floor, all of it per-batch planning + per-row
    * lambda interpretation. [[Ann.cellOfMd5]] is bit-identical (exact
    * integer arithmetic, same floor(v·10⁶) quantization), so admission
    * semantics and batch parity are unchanged. */
  private[streaming] def cellRowsJvm(vecs: DataFrame, idCol: String,
                                     vecCol: String, bits: Int, dims: Int)
      : Dataset[(Long, Seq[Float], Long)] = {
    require(bits >= 0 && bits <= 32, "bits must be in 0..32")
    val spark = vecs.sparkSession
    import spark.implicits._
    val planes = Ann.md5PlaneMatrix(bits, dims) // bits×dims longs — a few KB
    vecs.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, Ann.cellOfMd5(v.toArray, planes)) }
  }

  /** The admitted-survivor stream over (id, vec) rows. Within one batch
    * of a cell, arrivals are processed in ascending id (determinism under
    * shuffled delivery); across batches, admission order is arrival
    * order — the streaming contract. */
  def admittedStream(vecs: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bits: Int, dims: Int = 64,
                     ttlMs: Long = 0L): Dataset[Admitted] = {
    require(ttlMs >= 0, "ttlMs must be >= 0 (0 = no eviction)")
    val spark = vecs.sparkSession
    import spark.implicits._

    def update(cell: Long, batch: Iterator[(Long, Seq[Float], Long)],
               state: GroupState[CellState]): Iterator[Admitted] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val out = scala.collection.mutable.ArrayBuffer[Admitted]()
        var st = state.getOption.getOrElse(CellState(Nil, Nil))
        // survivors in admission order; prepend + final reverse keeps the
        // fold O(1) per admission
        var ids = st.ids.reverse
        var vs = st.vecs.reverse
        batch.toSeq.sortBy(_._1).foreach { case (id, v, _) =>
          val vec = v.toArray
          val dup = ids.nonEmpty && ids.contains(id) ||
            vs.exists(s => cosine(s, vec) >= threshold)
          if (!dup) {
            ids = id :: ids
            vs = vec :: vs
            out += Admitted(id, cell)
          }
        }
        st = CellState(ids.reverse, vs.reverse)
        state.update(st)
        if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        out.iterator
      }
    }

    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    cellRowsJvm(vecs, idCol, vecCol, bits, dims)
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(update)
  }
}
