package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition sizing for the stateful streaming operators
  * ([[StreamingRates]], [[StreamingDedup]], [[StreamingSemDedup]],
  * [[StreamingDrift]], [[StreamingEmbedDrift]], [[StreamingSessions]]).
  *
  * Why this knob exists (round-14 probe, `bench/r14/STREAMPROBE_*`):
  * every state partition opens, updates and COMMITS its store on every
  * micro-batch, data or not, so the stateful family's per-batch floor
  * scales with the state partition count, not with rows. A session
  * provisioned for batch shuffles (32 partitions on 32 cores) pays that
  * commit fan-out even when the active key set is small: re-sizing
  * 32 → 4 measured 2.6–3.5× rows/s on ewma/counter_rate/zscore, 2.5× on
  * semdedup and 2.3× on TTL dedup at 100–85k active keys, with
  * bit-identical state. Guidance: state partitions ≈ active keys per
  * core's worth of state work — for key counts up to the low hundreds
  * of thousands on one machine, a handful of partitions beats the core
  * count; reserve core-count state partitions for key sets that are
  * themselves executor-scale (hundreds of millions at 100 TB).
  *
  * Why it is start-scoped and not a Dataset parameter: Spark sizes a
  * stateful operator from `spark.sql.shuffle.partitions` AS OF QUERY
  * START — `StreamExecution` clones the STREAM'S OWN session
  * (`df.sparkSession`) at `start()` and the value is pinned into the
  * checkpoint's offset metadata for the life of the query (a restart
  * keeps the original count regardless of the conf). A `repartition(n)`
  * on the input does NOT do this: the stateful operator adds its own
  * keyed exchange at the session default.
  *
  * Why the block RECEIVES a session instead of mutating the caller's
  * (round-16 order #6): the previous shape set the conf on the shared
  * session and restored it in a `finally`, which raced concurrent batch
  * planning and concurrent `withStatePartitions` calls during the
  * window. This shape never mutates shared state at all: the knob hands
  * the block a `newSession()` clone (same `SparkContext`, `SharedState`
  * and extensions; its own conf) with `spark.sql.shuffle.partitions`
  * pre-set to `n`, and the block must BUILD and START the stream from
  * that session — the pinning reads `df.sparkSession`'s conf, so a
  * stream built from the caller's session would silently get the
  * session default (see the spec's control assertion).
  *
  * {{{
  * val q = StreamingConf.withStatePartitions(spark, 4) { scoped =>
  *   StreamingRates.ewma(samplesFrom(scoped), 0.3).writeStream
  *     .format("noop").option("checkpointLocation", ckpt)
  *     .trigger(Trigger.AvailableNow()).start()
  * }
  * // q.lastProgress.stateOperators.head.numShufflePartitions == 4
  * // spark.conf was never touched — concurrent readers see the default
  * }}}
  */
object StreamingConf {

  val ShufflePartitionsKey = "spark.sql.shuffle.partitions"

  /** Build and start a streaming query with its state sharded across `n`
    * partitions (spec-asserted via `StateOperatorProgress
    * .numShufflePartitions`). The block receives a SCOPED session clone
    * whose shuffle-partition conf is `n`; the source and the `start()`
    * must both go through it. The caller's session conf is never
    * mutated, so there is no restore step and nothing to race.
    *
    * The clone CARRIES the caller's current runtime SQL confs:
    * `newSession()` alone initializes from builder-time options only, so
    * anything the caller `spark.conf.set(...)` after startup (timezone,
    * ANSI tweaks, codegen flags) would be silently absent from the
    * session the stream is planned from — every modifiable conf is copied
    * onto the clone first, then the one knob this scope exists for is
    * overridden (spec-asserted). Extensions (the graft function registry)
    * ride along via `newSession()` itself. */
  def withStatePartitions[T](spark: SparkSession, n: Int)
      (start: SparkSession => T): T = {
    require(n > 0, s"state partitions must be positive, got $n")
    val scoped = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      if (scoped.conf.isModifiable(k)) scoped.conf.set(k, v)
    }
    scoped.conf.set(ShufflePartitionsKey, n.toString)
    start(scoped)
  }
}
