package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the PromQL range-function family
  * (`graft.operators.Rates`): per-series counter rate and EWMA computed
  * INCREMENTALLY over an unbounded sample stream, instead of per re-fetched
  * window the way the reference's 30 s poll loop does
  * (`realtime_detector.py:159` re-queries `/api/v1/query_range` each
  * cycle; here each sample is consumed once).
  *
  * Both operators are `flatMapGroupsWithState` over the series key:
  * per-series state is O(1) (a handful of longs/doubles), sharded across
  * executors like all keyed state — at 100 TB/day of samples the state
  * size tracks ACTIVE SERIES COUNT, not stream length, and the only
  * shuffle is the keyed exchange every stateful op pays. Within a
  * micro-batch, samples are folded in (tsUs, seq) order, so replays and
  * out-of-order arrival inside a batch are deterministic; cross-batch
  * regressions in event time are counted as counter resets, same as a
  * Prometheus scrape target restarting.
  *
  * Throughput: size the STATE partition count to the active key set, not
  * the core count — start the query inside
  * [[StreamingConf.withStatePartitions]] (32 → 4 partitions measured
  * 2.6–3.5× rows/s on this family at ≤85k keys; rationale there).
  */
object StreamingRates {

  /** One input sample: series key, event-time µs, integer milli value,
    * and a unique tiebreaker (ingest sequence / event id). */
  final case class Sample(key: String, tsUs: Long, v: Long, seq: Long)

  /** Counter-rate state: last seen sample + running increase + first ts. */
  final case class RateState(lastTs: Long, lastV: Long, increase: Long,
                             firstTs: Long)

  /** One emitted rate point: cumulative reset-aware `increase` and the
    * overall per-second rate since the series' first sample (NaN-free:
    * zero-span series emit rate 0.0). */
  final case class RatePoint(key: String, tsUs: Long, v: Long,
                             increase: Long, ratePerSec: Double)

  /** Prometheus counter semantics, incrementally: a drop means the counter
    * restarted, so the post-reset value IS the increase (the same rule as
    * the batch `q_counter_rate`; parity asserted in StreamingRatesSpec).
    * Emits one [[RatePoint]] per input sample. */
  def counterRate(samples: Dataset[Sample]): Dataset[RatePoint] = {
    val spark = samples.sparkSession
    import spark.implicits._

    def update(key: String, batch: Iterator[Sample],
               state: GroupState[RateState]): Iterator[RatePoint] = {
      val out = scala.collection.mutable.ArrayBuffer[RatePoint]()
      var st = state.getOption.orNull
      batch.toSeq.sortBy(s => (s.tsUs, s.seq)).foreach { s =>
        st =
          if (st == null) RateState(s.tsUs, s.v, 0L, s.tsUs)
          else {
            val inc = if (s.v < st.lastV) s.v else s.v - st.lastV
            RateState(s.tsUs, s.v, st.increase + inc, st.firstTs)
          }
        val span = st.lastTs - st.firstTs
        val rate =
          if (span <= 0L) 0.0 else st.increase * 1000000.0 / span
        out += RatePoint(key, s.tsUs, s.v, st.increase, rate)
      }
      if (st != null) state.update(st)
      out.iterator
    }

    samples.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** EWMA state: the unnormalized numerator/denominator of the
    * adjust=True form (`num = Σ (1−α)^age · x`, `den = Σ (1−α)^age`). */
  final case class EwmaState(num: Double, den: Double)

  /** One emitted smoothed point (`ewma` in milli-units, like the input). */
  final case class EwmaPoint(key: String, tsUs: Long, v: Long, ewma: Double)

  /** Streaming EWMA — the EXACT (untruncated) pandas-adjust=True form as a
    * two-double recurrence: `num ← (1−α)·num + x`, `den ← (1−α)·den + 1`,
    * `ewma = num/den`. The batch twin (`Rates.ewma`) truncates the same
    * series at k lags, so the two agree to within `(1−α)^k · range` —
    * asserted in the spec. Emits one [[EwmaPoint]] per input sample. */
  def ewma(samples: Dataset[Sample], alpha: Double): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0, 1)")
    val spark = samples.sparkSession
    import spark.implicits._
    val oneMinus = 1.0 - alpha

    def update(key: String, batch: Iterator[Sample],
               state: GroupState[EwmaState]): Iterator[EwmaPoint] = {
      val out = scala.collection.mutable.ArrayBuffer[EwmaPoint]()
      var st = state.getOption.getOrElse(EwmaState(0.0, 0.0))
      batch.toSeq.sortBy(s => (s.tsUs, s.seq)).foreach { s =>
        st = EwmaState(oneMinus * st.num + s.v, oneMinus * st.den + 1.0)
        out += EwmaPoint(key, s.tsUs, s.v, st.num / st.den)
      }
      state.update(st)
      out.iterator
    }

    samples.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Holt-Winters state: sample count + previous level/trend. */
  final case class HwState(n: Long, s: Double, b: Double)

  /** One smoothed point; level/trend are NaN-free options — the first
    * sample of a series emits `None` (recurrence needs two points). */
  final case class HwPoint(key: String, tsUs: Long, v: Long,
                           level: Option[Double], trend: Option[Double])

  /** Streaming `holt_winters()` — the same Prometheus recurrence as the
    * batch `Rates.holtWinters`, folded incrementally with three scalars of
    * state per series (exact batch parity asserted in the spec: identical
    * fp op order, so the match is bitwise across micro-batches). */
  def holtWinters(samples: Dataset[Sample], sf: Double,
                  tf: Double): Dataset[HwPoint] = {
    require(sf > 0.0 && sf < 1.0, "sf must be in (0, 1)")
    require(tf > 0.0 && tf < 1.0, "tf must be in (0, 1)")
    val spark = samples.sparkSession
    import spark.implicits._
    val omSf = 1.0 - sf
    val omTf = 1.0 - tf

    def update(key: String, batch: Iterator[Sample],
               state: GroupState[HwState]): Iterator[HwPoint] = {
      val out = scala.collection.mutable.ArrayBuffer[HwPoint]()
      var st = state.getOption.getOrElse(HwState(0L, 0.0, 0.0))
      batch.toSeq.sortBy(s => (s.tsUs, s.seq)).foreach { smp =>
        val x = smp.v.toDouble
        st =
          if (st.n == 0L) HwState(1L, x, 0.0)
          else {
            val b0 = if (st.n == 1L) x - st.s else st.b
            val s1 = sf * x + omSf * (st.s + b0)
            val b1 = tf * (s1 - st.s) + omTf * b0
            HwState(st.n + 1L, s1, b1)
          }
        out += (if (st.n == 1L) HwPoint(key, smp.tsUs, smp.v, None, None)
                else HwPoint(key, smp.tsUs, smp.v, Some(st.s), Some(st.b)))
      }
      state.update(st)
      out.iterator
    }

    samples.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Trailing-window z-score state: the retained samples inside the range
    * window (parallel ts/value arrays, arrival-ordered) and their EXACT
    * integer sums — add and evict are long arithmetic, so the sums are
    * bit-identical to the batch RANGE frame's, at any eviction history. */
  final case class ZScoreState(ts: Seq[Long], vs: Seq[Long],
                               sum: Long, sumsq: Long)

  /** One scored point: trailing-window count, z (None when the window has
    * < 2 samples or zero spread — the batch NULL), and the |z| > 3 flag. */
  final case class ZPoint(key: String, tsUs: Long, v: Long, cnt: Long,
                          z: Option[Double], anom: Long)

  /** Streaming rolling z-score anomaly detector — the incremental twin of
    * the batch `q_zscore` composition (`Rates.overTime` + fixed z
    * expression): for every sample, z over the trailing `[ts − rangeUs,
    * ts]` window of its series, flagged at |z| > 3. This is the
    * PromQL-recipe analog of the reference's poll loop
    * (realtime_detector.py re-scores a trailing window every 30 s); here
    * each sample is consumed once and the window state is incremental.
    *
    * Exactness: the window's count/sum/sum-of-squares are maintained as
    * longs under append and eviction, and the final double expression
    * (mean, clamped variance, 6-dp rounds) is evaluated in the identical
    * op order as the batch SQL — so parity with the batch plan is bitwise
    * (spec-asserted), not approximate. Ties at one timestamp are admitted
    * to the window together before any of them is scored, matching RANGE
    * frame tie semantics.
    *
    * Contract: event time must not regress ACROSS micro-batches (a
    * Prometheus series never emits duplicate or descending scrape times;
    * within-batch disorder is sorted). State per series is bounded by the
    * sample count inside one range window — samples/sec × rangeUs, not
    * stream length.
    *
    * Scale: one keyed exchange (the stateful op's), state sharded by
    * series across executors like [[counterRate]]. */
  def zscore(samples: Dataset[Sample], rangeUs: Long): Dataset[ZPoint] = {
    require(rangeUs > 0, "rangeUs must be positive")
    val spark = samples.sparkSession
    import spark.implicits._

    // Spark's round(x, 6) for doubles (HALF_UP on the decimal string
    // form), verbatim, so the fold is bitwise equal to the batch
    // expression. A function VALUE, not an object method: the closure
    // must not capture the (non-serializable) enclosing object.
    val round6: Double => Double = x =>
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

    def update(key: String, batch: Iterator[Sample],
               state: GroupState[ZScoreState]): Iterator[ZPoint] = {
      var tsQ = Vector.empty[Long]; var vQ = Vector.empty[Long]
      var sum = 0L; var sumsq = 0L
      state.getOption.foreach { st =>
        tsQ = st.ts.toVector; vQ = st.vs.toVector
        sum = st.sum; sumsq = st.sumsq
      }
      val out = scala.collection.mutable.ArrayBuffer[ZPoint]()
      val ordered = batch.toSeq.sortBy(s => (s.tsUs, s.seq)).toVector
      var i = 0
      while (i < ordered.size) {
        val t = ordered(i).tsUs
        var j = i
        while (j < ordered.size && ordered(j).tsUs == t) j += 1
        val group = ordered.slice(i, j)
        // evict strictly-older-than-frame rows (frame is inclusive at
        // ts − rangeUs, same as rangeBetween(-rangeUs, 0))
        while (tsQ.nonEmpty && tsQ.head < t - rangeUs) {
          sum -= vQ.head; sumsq -= vQ.head * vQ.head
          tsQ = tsQ.tail; vQ = vQ.tail
        }
        // all ties join the frame BEFORE any is scored (RANGE semantics)
        group.foreach { s =>
          tsQ :+= s.tsUs; vQ :+= s.v
          sum += s.v; sumsq += s.v * s.v
        }
        val cnt = tsQ.size.toLong
        // identical op order as the batch SQL: mean = sum/cnt;
        // avg = round(mean/1000); std = round(sqrt(max(E[v²]−mean², 0))/1000)
        val mean = sum.toDouble / cnt
        val avgOt = round6(mean / 1000.0)
        val stdOt = round6(
          math.sqrt(math.max(sumsq.toDouble / cnt - mean * mean, 0.0))
            / 1000.0)
        group.foreach { s =>
          val z =
            if (cnt < 2 || stdOt == 0.0) None
            else Some(round6((s.v.toDouble / 1000.0 - avgOt) / stdOt))
          val anom = z match {
            case Some(zz) if math.abs(zz) > 3.0 => 1L
            case _ => 0L
          }
          out += ZPoint(key, s.tsUs, s.v, cnt, z, anom)
        }
        i = j
      }
      state.update(ZScoreState(tsQ, vQ, sum, sumsq))
      out.iterator
    }

    samples.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
