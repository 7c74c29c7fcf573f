package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The state-partition knob (round-15 order #5): proves
  * [[StreamingConf.withStatePartitions]] actually changes the STATE
  * STORE partition count of a stateful query (the engine's own
  * `StateOperatorProgress.numShufflePartitions`, not a conf echo),
  * restores the session's batch setting, and does not change results —
  * the r14 probe measured the 32→4 re-size bit-identical, this pins the
  * API path to the same contract. */
class StreamingConfSpec extends SparkSpec {
  import StreamingRates._

  private val samples = Seq(
    Sample("a", 1000000L, 5L, 0L), Sample("a", 2000000L, 9L, 1L),
    Sample("b", 1000000L, 4L, 2L), Sample("c", 3000000L, 7L, 3L))

  private def runRate(name: String, parts: Option[Int])
      : (Seq[RatePoint], Long) = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sample]
    def start() = counterRate(input.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    val q = parts.fold(start())(n =>
      StreamingConf.withStatePartitions(spark, n)(start()))
    try {
      input.addData(samples)
      q.processAllAvailable()
      val got = spark.table(name).as[RatePoint].collect()
        .sortBy(p => (p.key, p.tsUs)).toSeq
      (got, q.lastProgress.stateOperators.head.numShufflePartitions)
    } finally q.stop()
  }

  test("withStatePartitions pins the state-store partition count; session conf restored; results unchanged") {
    val before = spark.conf.get(StreamingConf.ShufflePartitionsKey)
    val (defaultRows, defaultParts) = runRate("sc_default", None)
    assert(defaultParts == before.toLong,
      s"control query should shard state at the session default ($before), got $defaultParts")
    val (knobRows, knobParts) = runRate("sc_knob", Some(2))
    assert(knobParts == 2L,
      s"knob query should shard state across 2 partitions, got $knobParts")
    assert(spark.conf.get(StreamingConf.ShufflePartitionsKey) == before,
      "session batch shuffle setting must be restored after start()")
    assert(knobRows == defaultRows,
      "re-sizing state partitions must not change results")
  }

  test("withStatePartitions restores the conf when start() throws, and rejects n <= 0") {
    val before = spark.conf.get(StreamingConf.ShufflePartitionsKey)
    intercept[RuntimeException] {
      StreamingConf.withStatePartitions(spark, 2)(
        throw new RuntimeException("boom"))
    }
    assert(spark.conf.get(StreamingConf.ShufflePartitionsKey) == before)
    intercept[IllegalArgumentException] {
      StreamingConf.withStatePartitions(spark, 0)(())
    }
  }
}
