package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  test("graft_minhash64 is registered via SparkSessionExtensions") {
    assert(spark.catalog.functionExists("graft_minhash64"))
  }

  test("signature: fixed length, deterministic, identical docs collide") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "something else entirely here")).toDF("id", "text")
      .select($"id", graft.dedup.Dedup.normTokens($"text").as("tk"))
      .select($"id",
        call_function("graft_minhash64", $"tk", lit(2), lit(16)).as("sig"))
    val sigs = df.orderBy("id").collect()
      .map(r => r.getSeq[Long](r.fieldIndex("sig")))
    assert(sigs.forall(_.size == 16))
    assert(sigs(0) == sigs(1))          // identical docs: identical signature
    assert(sigs(0) != sigs(2))
    // near-dup shares many signature entries with its source
    val again = df.orderBy("id").collect()
      .map(r => r.getSeq[Long](r.fieldIndex("sig")))
    assert(again.toSeq == sigs.toSeq)   // deterministic across runs
  }

  test("n < k degenerates to one whole-text shingle (matches shinglesFromTokens)") {
    val df = Seq((1L, "only two")).toDF("id", "text")
      .select(graft.dedup.Dedup.normTokens($"text").as("tk"))
    val sig = df.select(
      call_function("graft_minhash64", $"tk", lit(5), lit(4)).as("sig"))
      .head().getSeq[Long](0)
    // one shingle -> every signature slot is that shingle's hash (no
    // Long.MaxValue sentinel may survive)
    assert(sig.forall(_ != Long.MaxValue))
  }

  test("minhashCandidates uses the native kernel and still finds exact dups") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "unrelated words appear in this document"))
      .toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 2, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) || !pairs.contains((2L, 3L)))
  }

  test("graft_minhash_md5 kernel is bit-identical to the HOF md5 composition") {
    // The oracle-checked query may take either path — they MUST agree.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "one"),
      (5L, " "),
      (6L, "a b")).toDF("id", "text")
    val tk = docs.select($"id", graft.dedup.Dedup.normTokens($"text").as("_tk"))
    val kernel = tk.select($"id",
        call_function("graft_minhash_md5", $"_tk", lit(2), lit(8)).as("sig"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toList)
    val hof = tk
      .select($"id", graft.dedup.Dedup.shinglesFromTokens($"_tk", 2).as("_sh"))
      .select($"id", graft.dedup.Dedup.md5HashPairs($"_sh").as("_hp"))
      .select($"id", graft.dedup.Dedup.minhashSignatureMd5($"_hp", 8).as("sig"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toList)
    assert(kernel.toList == hof.toList)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // needs a non-foldable source (a local Seq constant-folds to a
    // LocalTableScan before any codegen happens)
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.dedup.Dedup.normTokens($"text").as("tk"))
      .select(call_function("graft_minhash64", $"tk", lit(2), lit(8)).as("sig"))
    // the "*(n)" stage prefix marks WholeStageCodegen participation
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_minhash64"), plan)
    assert(df.count() == 500) // and it actually runs compiled
  }
}
