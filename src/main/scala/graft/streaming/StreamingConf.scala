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
  * START — `StreamExecution` clones the session at `start()` and the
  * value is pinned into the checkpoint's offset metadata for the life
  * of the query (a restart keeps the original count regardless of the
  * conf). A `repartition(n)` on the input does NOT do this: the
  * stateful operator adds its own keyed exchange at the session
  * default. So the knob wraps the `start()` call, sets the conf for
  * exactly that window, and restores it — concurrent BATCH work in the
  * same session only races the conf during query construction, never
  * after.
  *
  * {{{
  * val q = StreamingConf.withStatePartitions(spark, 4) {
  *   StreamingRates.ewma(samples, 0.3).writeStream
  *     .format("noop").option("checkpointLocation", ckpt)
  *     .trigger(Trigger.AvailableNow()).start()
  * }
  * // q.lastProgress.stateOperators.head.numShufflePartitions == 4
  * }}}
  */
object StreamingConf {

  val ShufflePartitionsKey = "spark.sql.shuffle.partitions"

  /** Build and start a streaming query with its state sharded across `n`
    * partitions (spec-asserted via `StateOperatorProgress
    * .numShufflePartitions`); the session's batch shuffle setting is
    * restored before returning. `start` must both construct AND start
    * the query — a query started after this scope closes gets the
    * restored session default. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(start: => T): T = {
    require(n > 0, s"state partitions must be positive, got $n")
    val prev = spark.conf.get(ShufflePartitionsKey)
    spark.conf.set(ShufflePartitionsKey, n.toString)
    try start
    finally spark.conf.set(ShufflePartitionsKey, prev)
  }
}
