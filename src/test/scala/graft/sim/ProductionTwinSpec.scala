package graft.sim

import graft.{Queries, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Execution coverage for the xxhash64-basis PRODUCTION variants of the
  * four hash-twin families (MinHash-LSH candidates, SimHash fingerprints,
  * LSH ANN, cosine near-dup). These used to sit in the registry as
  * rows-only entries — DuckDB cannot replay xxhash64, so they could never
  * be oracle-green. The md5 twins stay in the registry and carry the full
  * value-level oracle; THIS spec keeps the production paths executing
  * end-to-end on real testdata and pins the contracts the two bases must
  * share regardless of hash family:
  *   - exact-duplicate texts collide in EVERY band under ANY minwise hash,
  *     so the exact-dup pair set is a subset of both candidate sets;
  *   - identical token streams get identical SimHash fingerprints;
  *   - candidate generation is an equi-join on bucket keys — never a
  *     cartesian product;
  *   - top-k output is rank-contiguous with k as the per-query cap.
  */
class ProductionTwinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  /** Corpus unioned with an id-shifted copy of itself: every doc has an
    * exact twin at doc_id+Shift, so the exact-dup ground truth is known by
    * construction (sf0.001 carries no natural duplicates). */
  private val Shift = 1000000L
  private lazy val docs = {
    val base = Tables.documents(spark, dir)
    base.unionByName(base.withColumn("doc_id", col("doc_id") + Shift))
  }
  private lazy val emb = Tables.embeddings(spark, dir)

  private def assertNoCartesian(df: org.apache.spark.sql.DataFrame,
                                what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"$what plans an all-pairs join:\n$plan")
  }

  /** Pairs of docs whose normalized texts are bit-identical — at minimum
    * every (id, id+Shift) planted pair, plus any natural collisions. */
  private lazy val exactDupPairs: Set[(Long, Long)] = {
    val fp = docs.select(col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("f"))
    val a = fp.select(col("doc_id").as("id1"), col("f"))
    val b = fp.select(col("doc_id").as("id2"), col("f"))
    a.join(b, "f").filter(col("id1") < col("id2"))
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("xxhash64 minhashCandidates: ordered pairs, no cartesian, catches every exact dup") {
    val c = graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 2, numHashes = 32, bands = 16)
    assertNoCartesian(c, "minhashCandidates(xxhash64)")
    val pairs = c.select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "no candidates on a corpus with known duplicates")
    assert(pairs.forall { case (i, j) => i < j }, "unordered or self pair")
    assert(exactDupPairs.nonEmpty, "fixture lost its exact duplicates")
    val missed = exactDupPairs -- pairs
    assert(missed.isEmpty,
      s"exact duplicates must collide in every band; missed: $missed")
  }

  test("xxhash64 SimHash: one fingerprint per doc; identical texts agree") {
    val fp = docs
      .select(col("doc_id"), graft.dedup.Dedup.tokenHashes(col("text")).as("_h"))
      .select(col("doc_id"),
        graft.dedup.Dedup.simhashFromHashes(col("_h")).as("simhash"))
    val n = fp.count()
    assert(n == docs.count(), "SimHash is a per-row projection")
    assert(fp.filter(col("simhash").isNull).count() == 0)
    // exact-dup docs tokenize identically → identical fingerprints
    val byId = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exactDupPairs.foreach { case (i, j) =>
      assert(byId(i) == byId(j), s"dup docs $i/$j disagree on simhash")
    }
  }

  test("xxhash64 lshTopK: rank-contiguous per query, capped at k, no cartesian") {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val r = Ann.lshTopK(q, "qid", "qv", emb, "vec_id", "embedding",
      k = 5, bits = 4)
    assertNoCartesian(r, "lshTopK(xxhash64)")
    val rows = r.select("qid", "rank", "cosine").collect()
    assert(rows.nonEmpty, "LSH found no neighbors at 4 bits on sf0.001")
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 5, s"query $qid returned ${rs.length} > k rows")
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to rs.length), s"query $qid ranks not contiguous")
      rs.foreach(row => assert(math.abs(row.getDouble(2)) <= 1.0 + 1e-9))
    }
  }

  test("float cosineNearDup: ordered distinct pairs above threshold, no cartesian") {
    val nd = Ann.cosineNearDup(emb, "vec_id", "embedding",
      threshold = 0.15, bits = 4)
    assertNoCartesian(nd, "cosineNearDup")
    val rows = nd.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "unordered or self pair")
      assert(r.getDouble(2) >= 0.15 - 1e-9, "pair below threshold surfaced")
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      == rows.length, "duplicate pairs")
  }

  test("xxhash64 SimHash-64 banded pairs: exact distance histogram, no cartesian") {
    // The q_simhash_pairs_prod twin's whole contract is pigeonhole-exact
    // recall at maxDist < nBands — so compare its (hamming, n_pairs)
    // histogram against a BRUTE-FORCE recount over the distinct
    // fingerprints (D is a few hundred at sf0.001; D²/2 pairs is cheap in
    // the test driver, and would be the all-pairs plan the banding exists
    // to avoid at scale).
    val twin = Queries.benchOnly("q_simhash_pairs_prod")(spark, dir)
    assertNoCartesian(twin, "q_simhash_pairs_prod")
    val got = twin.collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val base = Tables.documents(spark, dir)
    val corpus = base.select(col("doc_id"), col("text")).unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val fps = corpus
      .select(graft.dedup.Dedup.tokenHashes(col("text")).as("_h"))
      .select(graft.dedup.Dedup.simhashFromHashes(col("_h")).as("sh"))
      .groupBy("sh").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = scala.collection.mutable.Map.empty[Int, Long]
    for (i <- fps.indices) {
      val (hi, ci) = fps(i)
      if (ci >= 2) brute(0) = brute.getOrElse(0, 0L) + ci * (ci - 1) / 2
      for (j <- i + 1 until fps.length) {
        val (hj, cj) = fps(j)
        val dist = java.lang.Long.bitCount(hi ^ hj)
        if (dist <= 4) brute(dist) = brute.getOrElse(dist, 0L) + ci * cj
      }
    }
    assert(brute.getOrElse(0, 0L) > 0,
      "overlay fixture lost its exact duplicates (vacuous histogram)")
    assert(got == brute.toMap,
      s"banded histogram $got != brute-force ${brute.toMap}")
  }

  test("the registry carries the md5 twins and only oracle-checkable rows") {
    Seq("q_minhash_lsh_md5", "q_simhash_md5", "q_ann_lsh_md5",
        "q_cosine_neardup_md5").foreach { twin =>
      assert(Queries.queries.contains(twin) && Queries.oracleSql.contains(twin))
    }
    Seq("q_minhash_lsh", "q_simhash", "q_ann_lsh", "q_cosine_neardup")
      .foreach { retired =>
        assert(!Queries.queries.contains(retired),
          s"$retired is back in the registry without an oracle")
      }
  }
}
