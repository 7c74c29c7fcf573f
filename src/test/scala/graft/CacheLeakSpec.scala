package graft

/** No query may leave a pinned CacheManager entry behind: a long-lived
  * user session running the registry repeatedly must not accumulate
  * cached blocks it can never drop. The operators that materialize an
  * intermediate across a self-join (Hamming pair family, MinHash-LSH band
  * table, anchored-shingle spans, histogram quantiles, near-dup
  * clustering) all use eager localCheckpoint — reference-tracked RDD
  * blocks the ContextCleaner reclaims once the frame is garbage — exactly
  * because a `persist` inside a one-shot helper pins an entry no caller
  * can unpersist (the Windows.scala rule; round-6 ADVICE found four
  * violations, fixed this round). This spec is the regression fence. */
class CacheLeakSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose operators historically persisted (or still internally
    * persist-then-unpersist) shared intermediates. */
  private val affected = Seq(
    "q_simhash_pairs", "q_simhash32_saturation",
    "q_phash_pairs", "q_ahash_pairs", "q_vhash_pairs",
    "q_minhash_lsh_md5", "q_dup_spans", "q_hist_quantile",
    "q_neardup_clusters", "q_bpe_merges")

  test("SQL cache is empty after building and executing each materializing query") {
    spark.catalog.clearCache() // isolate from other suites in the shared session
    affected.foreach { name =>
      Queries.queries(name)(spark, dir).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the CacheManager")
    }
  }

  test("registry-wide: EVERY query leaves the CacheManager empty") {
    // the per-list test above pins the historical offenders with a sharp
    // failure message; this sweep fences every FUTURE operator too
    spark.catalog.clearCache()
    Queries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, dir).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the CacheManager")
    }
  }

}
