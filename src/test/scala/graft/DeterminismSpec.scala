package graft

/** The driver's DuckDB compare hashes rows IN ORDER, so any
  * run-to-run nondeterminism in a query's output (an under-specified
  * ORDER BY, a tie broken by partition layout, an uncommitted random
  * source) would flake the round's correctness gate. This sweep executes
  * every registry query twice and requires byte-identical output
  * (toJSON: schema-ordered fields, base64 binary, stable array
  * rendering — Row.equals would miss raw byte arrays). */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registry query is row-for-row deterministic across executions") {
    Queries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val a = fn(spark, dir).toJSON.collect().toSeq
      val b = fn(spark, dir).toJSON.collect().toSeq
      assert(a == b, s"$name output differs between two executions")
    }
  }

  /** Round-9 drill (VERDICT r8 item 4): the heaviest / most seed-sensitive
    * queries re-run with Tables.chaosFirstAttempt on — every scan-stage
    * task FAILS its first attempt and is re-executed by Spark (the test
    * session runs `local[4, 2]`). Anything seeded per-partition-ATTEMPT,
    * ordered by task completion, or accumulating across attempts would
    * diverge here; the md5-seeded k-means, window tiebreaks, and the
    * write-path index queries must not. Cluster analog: preemption /
    * speculative re-execution on 1000 executors. */
  test("task-retry determinism: heavy queries are byte-identical when every scan task fails once") {
    val heavy = Seq(
      // the five most expensive solo rows (VERDICT r8 plan audit)
      "q_minhash_lsh_md5", "q_scale_robust", "q_mm_jpeg", "q_dup_spans",
      "q_pq_topk",
      // seeded / tiebreak-sensitive machinery
      "q_ann_ivf_kmeans", "q_semdedup", "q_simhash_pairs",
      "q_neardup_clusters", "q_window_w2_partitioned", "q_ffill_bfill_w1",
      // writes parquet mid-query: exercises the commit protocol under retry
      "q_ann_ivf_append")
    heavy.foreach { name =>
      val clean = Queries.queries(name)(spark, dir).toJSON.collect().toSeq
      val before = Tables.chaosInjected.get()
      Tables.chaosFirstAttempt = true
      try {
        val chaotic = Queries.queries(name)(spark, dir).toJSON.collect().toSeq
        assert(chaotic == clean, s"$name output changed under task retry")
      } finally Tables.chaosFirstAttempt = false
      // non-vacuous: the shim must have actually killed at least one task
      assert(Tables.chaosInjected.get() > before,
        s"$name: chaos shim injected no failures — drill is vacuous")
    }
  }
}
