package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "THE  QUICK  BROWN fox jumps over the lazy dog"), // normalized dup of 1
    (4L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (5L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exactDedup groups normalized duplicates, keeps min id, counts dups") {
    val d = Dedup.exactDedup(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(d.length == 3)
    assert(d(0).getAs[Long]("doc_id") == 1L && d(0).getAs[Long]("dup_count") == 3L)
    assert(d(1).getAs[Long]("doc_id") == 4L && d(1).getAs[Long]("dup_count") == 1L)
  }

  test("exactDedupSurvivorsByQuality keeps the best-scoring duplicate, ties to min id") {
    import org.apache.spark.sql.functions._
    // docs 1,2,3 normalize identically; give doc 2 the top score, and tie
    // docs 1 and 3 below it (tie must break to the smaller id = unused here)
    val scored = docs.withColumn("score",
      when(col("doc_id") === 2L, 10).otherwise(5))
    val kept = Dedup.exactDedupSurvivorsByQuality(scored, "doc_id", "text", "score")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 4L, 5L)) // 2 beats 1/3 on score; 4, 5 singletons
    // all-equal scores fall back to keep-first (min id) — matches exactDedup
    val uniform = Dedup.exactDedupSurvivorsByQuality(
      scored.withColumn("score", lit(1)), "doc_id", "text", "score")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(uniform == Seq(1L, 4L, 5L))
  }

  test("shingles: k-gram count and n<k degenerate case") {
    val df = Seq("a b c d", "a b").toDF("t")
    val sh = df.select(Dedup.shingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("a b")) // n<k: whole text as one shingle
  }

  test("jaccardVerify: identical docs 1.0, near dups high, disjoint 0") {
    val pairs = Seq((1L, 2L), (1L, 4L), (1L, 5L)).toDF("id1", "id2")
    val j = Dedup.jaccardVerify(pairs, docs, "doc_id", "text", 3, 0.0)
      .orderBy("id2").collect()
    assert(j(0).getAs[Double]("jaccard") == 1.0)
    assert(j(1).getAs[Double]("jaccard") > 0.5 && j(1).getAs[Double]("jaccard") < 1.0)
    assert(j(2).getAs[Double]("jaccard") == 0.0)
  }

  test("minhashCandidates surfaces exact and near duplicates, never self-pairs") {
    val c = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 2, numHashes = 32, bands = 16).collect()
    val pairs = c.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical docs always collide
    assert(pairs.contains((1L, 3L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("minhash candidate plan is a bucket equi-join, not a cartesian product") {
    val plan = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 2, numHashes = 32, bands = 16).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("exactDedupSurvivors keeps full rows of the min-id doc per group") {
    val s = Dedup.exactDedupSurvivors(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(s.map(_.getLong(0)).toSeq == Seq(1L, 4L, 5L))
    assert(s.head.getString(1).contains("quick brown fox")) // full row kept
  }

  test("nearDupClusters: connected components labeled by min member") {
    // chain 1-2, 2-3 plus isolated pair 7-8: components {1,2,3} and {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2")
    val c = Dedup.nearDupClusters(pairs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(c == Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L)))
  }

  test("distributed label propagation matches the driver union-find on a long chain") {
    // a 40-link chain exercises the pointer-jumping convergence
    val pairs = (1L to 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    val driver = Dedup.nearDupClusters(pairs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = Dedup.nearDupClustersDistributed(pairs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(driver == dist)
    assert(dist.forall(_._2 == 1L)) // one component rooted at 1
  }

  test("nearDupSurvivors: one doc per cluster survives, untouched docs stay") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val s = Dedup.nearDupSurvivors(docs, "doc_id", pairs)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(s == Seq(1L, 4L, 5L)) // 2,3 collapse into 1; 4,5 untouched
  }

  test("exactDedupIncremental: base hits dropped, keep-first within the batch") {
    import spark.implicits._
    val base = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "aa"),   // already in base -> dropped
      (11L, "cc"),   // new -> survives
      (12L, "cc"),   // within-batch dup of 11 -> dropped (keep-first)
      (13L, "dd"))   // new -> survives
      .toDF("doc_id", "text")
    val s = Dedup.exactDedupIncremental(batch, "doc_id", "text", base, "text")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(s == Seq(11L, 13L))
  }

  test("nearDupSurvivorsByQuality: best score wins the cluster, min id breaks ties") {
    import spark.implicits._
    val d = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val s = Dedup.nearDupSurvivorsByQuality(d, "doc_id", pairs, col("score"))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // cluster {1,2,3}: top score 9 shared by 2 and 3 -> min id 2 kept;
    // singleton 4 survives unconditionally
    assert(s == Seq(2L, 4L))
  }

  test("duplicatedSpans: exact shared token span found, boilerplate and short overlaps dropped") {
    val quote = "the quick brown fox jumps over the lazy sleeping dog" // 10 tokens
    val d = Seq(
      (1L, s"alpha beta $quote gamma delta"),
      (2L, s"unrelated prefix words here $quote and a suffix"),
      (3L, "alpha beta gamma delta epsilon zeta"),     // shares <5-token runs only
      (4L, "totally different content about nothing")).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3, maxDf = 5, minSpan = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // only the quoting pair survives, with the exact 10-token span, once
    assert(r.toSeq == Seq((1L, 2L, 10L, 1L)), r.mkString(","))
  }

  test("duplicatedSpans: rare-shingle anchoring drops spans made only of hot shingles") {
    // the same 6-token phrase in 7 docs -> every shingle has df 7 > maxDf 5
    val phrase = "one two three four five six"
    val d = (1L to 7L).map(i => (i, s"doc$i says $phrase end$i")).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3, maxDf = 5, minSpan = 5)
    assert(r.count() == 0)
    // raising maxDf re-anchors them: all 21 pairs share the 7-token span
    // ("says" + the 6-token phrase — "says" is common to every doc too)
    val r2 = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3, maxDf = 10, minSpan = 5)
      .collect()
    assert(r2.length == 21 && r2.forall(_.getLong(2) == 7L))
  }

  test("duplicatedSpans: two disjoint spans on the same pair count separately") {
    val a = "first shared span of six tokens"   // 6 tokens
    val b = "second shared run of seven more tokens" // 7 tokens
    val d = Seq(
      (1L, s"$a filler one $b"),
      (2L, s"$b other filler words entirely $a")).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3, maxDf = 5, minSpan = 5)
      .collect()(0)
    assert((r.getLong(2), r.getLong(3)) == ((7L, 2L)), r.toString)
  }

  test("duplicatedSpansChunked: pair set partitions exactly — result equals the one-join form at any chunk count") {
    val quote = "the quick brown fox jumps over the lazy sleeping dog"
    val a = "first shared span of six tokens"
    val d = Seq(
      (1L, s"alpha beta $quote gamma delta $a"),
      (2L, s"unrelated prefix words here $quote and a suffix"),
      (3L, s"$a trailing filler about other things entirely"),
      (4L, "totally different content about nothing")).toDF("doc_id", "text")
    val base = Dedup.duplicatedSpans(d, "doc_id", "text", k = 3, maxDf = 5,
        minSpan = 5)
      .orderBy("id1", "id2").collect().map(_.toSeq).toSeq
    for (c <- Seq(1, 3, 7)) {
      // chunkSink: the test materializes via localCheckpoint (the probe/
      // scale path writes parquet) — the parity under test is the hash
      // partitioning of the pair set, not the sink format
      val chunked = Dedup.duplicatedSpansChunked(d, "doc_id", "text", k = 3,
          maxDf = 5, minSpan = 5, chunks = c,
          checkpoint = _.localCheckpoint(true),
          chunkSink = (df, _) => df.localCheckpoint(true))
        .orderBy("id1", "id2").collect().map(_.toSeq).toSeq
      assert(chunked == base, s"chunks=$c: $chunked vs $base")
    }
  }

  test("simhash: identical texts equal, near texts close in Hamming distance") {
    val s = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(s(0) == s(1))
    val near = java.lang.Long.bitCount(s(0) ^ s(3))
    val far = java.lang.Long.bitCount(s(0) ^ s(4))
    assert(near < far, s"near=$near far=$far")
  }

  test("segmentDedup: hot segments removed everywhere, survivors rejoined in order") {
    val d = Seq(
      (1L, "a b c d e f"), // segs (k=2): [a b][c d][e f]
      (2L, "A  b x y"),    // [a b][x y] — normalization matches doc 1's head
      (3L, "z w q"),       // [z w][q] — final partial segment
      (6L, "p r q")        // [p r][q] — partial "q" hot with doc 3's
    ).toDF("doc_id", "text")
    val r = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2, minDf = 2)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 6L))
    // (n_segs, n_dup_segs, tokens_removed, cleaned)
    def row(i: Int) = (r(i).getLong(1), r(i).getLong(2), r(i).getLong(3),
      r(i).getString(4))
    assert(row(0) == ((3L, 1L, 2L, "c d e f")))
    assert(row(1) == ((2L, 1L, 2L, "x y")))
    assert(row(2) == ((2L, 1L, 1L, "z w"))) // partial "q" is removable too
    assert(row(3) == ((2L, 1L, 1L, "p r")))
  }

  test("segmentDedup: all-hot doc keeps an empty-string rewrite, whitespace-only doc absent") {
    val d = Seq(
      (1L, "a b longer tail here"),
      (2L, "a b"),      // its only segment is hot → cleaned = ""
      (3L, "   ")       // no tokens → no row
    ).toDF("doc_id", "text")
    val r = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2, minDf = 2)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r(1).getLong(2) == 1L && r(1).getString(4) == "")
    assert(r(0).getString(4) == "longer tail here")
  }

  test("segmentDedupIncremental equals full-corpus segmentDedup restricted to the batch") {
    val base = Seq(
      (2L, "a b c d"),      // contributes "a b" and "c d" to the base df
      (4L, "a b z z"),      // "a b" base df = 2 (hot from the base alone)
      (6L, "m m n n")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "a b fresh stuff"),   // "a b" hot via base
      (3L, "c d unique tail"),   // "c d" base df 1 + batch df 1 -> hot
      (5L, "m m p q"),           // "m m" same
      (7L, "only new words here")
    ).toDF("doc_id", "text")
    val inc = Dedup.segmentDedupIncremental(batch, "doc_id", "text",
        base, "doc_id", "text", segTokens = 2, minDf = 2)
      .orderBy("doc_id").collect()
    val full = Dedup.segmentDedup(base.union(batch), "doc_id", "text",
        segTokens = 2, minDf = 2)
      .filter(col("doc_id") % 2 === 1).orderBy("doc_id").collect()
    assert(inc.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    // and it is non-vacuous: doc 1 lost its base-hot head segment
    assert(inc(0).getString(4) == "fresh stuff")
  }

  test("segmentDedupIncremental: a re-ingested id supersedes its base copy") {
    // doc 2 exists in the base with a segment the batch version keeps:
    // the base copy must NOT count toward df (else "u v", unique in the
    // live corpus, would be deleted as a false duplicate)
    val base = Seq((2L, "u v old tail"), (8L, "x y stale")).toDF("doc_id", "text")
    val batch = Seq((2L, "u v new tail"), (9L, "x y fresh")).toDF("doc_id", "text")
    val inc = Dedup.segmentDedupIncremental(batch, "doc_id", "text",
        base, "doc_id", "text", segTokens = 2, minDf = 2)
      .orderBy("doc_id").collect()
    // "u v": batch df 1, base contribution excluded (re-ingest) -> kept
    assert(inc(0).getString(4) == "u v new tail")
    // "x y": base doc 8 (not re-ingested) + batch doc 9 -> hot, removed
    assert(inc(1).getString(4) == "fresh")
    // equivalence target: full run over (base without id 2) + batch
    val full = Dedup.segmentDedup(
        base.filter(col("doc_id") =!= 2L).union(batch), "doc_id", "text",
        segTokens = 2, minDf = 2)
      .filter(col("doc_id").isin(2L, 9L)).orderBy("doc_id").collect()
    assert(inc.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("segmentDedup: minDf binds on distinct docs, not occurrences") {
    // "a b" twice WITHIN doc 1 only — df=1, so minDf=2 keeps it
    val d = Seq((1L, "a b c c a b"), (2L, "x y z")).toDF("doc_id", "text")
    val r = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2, minDf = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 0L && r(0).getString(4) == "a b c c a b")
  }
}
