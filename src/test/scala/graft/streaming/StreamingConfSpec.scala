package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The state-partition knob (round-15 order #5, reshaped by round-16
  * order #6): proves [[StreamingConf.withStatePartitions]] actually
  * changes the STATE STORE partition count of a stateful query (the
  * engine's own `StateOperatorProgress.numShufflePartitions`, not a
  * conf echo), does not change results, and — the round-16 contract —
  * NEVER mutates the caller's session: a concurrent conf read during
  * the scope sees the session default, because the knob hands the block
  * a `newSession()` clone instead of set-then-restore on shared state. */
class StreamingConfSpec extends SparkSpec {
  import StreamingRates._

  private val samples = Seq(
    Sample("a", 1000000L, 5L, 0L), Sample("a", 2000000L, 9L, 1L),
    Sample("b", 1000000L, 4L, 2L), Sample("c", 3000000L, 7L, 3L))

  // builds the stream FROM the given session (the knob's contract: the
  // pinning reads df.sparkSession's conf), runs it to completion on the
  // memory sink, returns (rows, state partition count the engine used)
  private def runRate(name: String)(s: SparkSession)
      : (Seq[RatePoint], Long) = {
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Sample]
    val q = counterRate(input.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    try {
      input.addData(samples)
      q.processAllAvailable()
      val got = s.table(name).as[RatePoint].collect()
        .sortBy(p => (p.key, p.tsUs)).toSeq
      (got, q.lastProgress.stateOperators.head.numShufflePartitions)
    } finally q.stop()
  }

  test("withStatePartitions pins the state-store partition count; results unchanged") {
    val before = spark.conf.get(StreamingConf.ShufflePartitionsKey)
    val (defaultRows, defaultParts) = runRate("sc_default")(spark)
    assert(defaultParts == before.toLong,
      s"control query should shard state at the session default ($before), got $defaultParts")
    val (knobRows, knobParts) =
      StreamingConf.withStatePartitions(spark, 2)(runRate("sc_knob"))
    assert(knobParts == 2L,
      s"knob query should shard state across 2 partitions, got $knobParts")
    assert(spark.conf.get(StreamingConf.ShufflePartitionsKey) == before,
      "caller session's batch shuffle setting must be untouched")
    assert(knobRows == defaultRows,
      "re-sizing state partitions must not change results")
  }

  test("a concurrent conf read during the scope sees the session default") {
    val before = spark.conf.get(StreamingConf.ShufflePartitionsKey)
    StreamingConf.withStatePartitions(spark, 3) { scoped =>
      assert(scoped ne spark, "the block must receive a session clone")
      assert(scoped.conf.get(StreamingConf.ShufflePartitionsKey) == "3")
      // the round-16 order's DONE criterion: nothing a concurrent batch
      // planner could read on the shared session ever shows the knob
      assert(spark.conf.get(StreamingConf.ShufflePartitionsKey) == before,
        "the caller session's conf must read the default DURING the scope")
      assert(scoped.sparkContext eq spark.sparkContext,
        "the clone must share the SparkContext (same executors/state dirs)")
    }
    assert(spark.conf.get(StreamingConf.ShufflePartitionsKey) == before)
  }

  test("runtime confs set AFTER startup ride onto the scoped clone (r16 ADVICE)") {
    // newSession() alone starts from builder-time options — a caller's
    // later spark.conf.set would be silently absent from the session the
    // stream is planned from. The knob copies modifiable runtime confs.
    val key = "spark.sql.session.timeZone"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      StreamingConf.withStatePartitions(spark, 2) { scoped =>
        assert(scoped.conf.get(key) == "America/New_York",
          "a runtime conf set on the caller must be visible on the clone")
        assert(scoped.conf.get(StreamingConf.ShufflePartitionsKey) == "2",
          "the knob override must win over the copied caller value")
        // the clone also keeps the graft extension registry (newSession
        // re-applies spark.sql.extensions): the Ann/cosine kernel dispatch
        // pattern this knob composes with keeps working on the clone
        assert(scoped.catalog.functionExists("graft_int8_report"),
          "extension-injected functions must exist on the scoped clone")
      }
    } finally spark.conf.set(key, before)
  }

  test("caller conf untouched when the block throws, and rejects n <= 0") {
    val before = spark.conf.get(StreamingConf.ShufflePartitionsKey)
    intercept[RuntimeException] {
      StreamingConf.withStatePartitions(spark, 2)(_ =>
        throw new RuntimeException("boom"))
    }
    assert(spark.conf.get(StreamingConf.ShufflePartitionsKey) == before)
    intercept[IllegalArgumentException] {
      StreamingConf.withStatePartitions(spark, 0)(_ => ())
    }
  }
}
