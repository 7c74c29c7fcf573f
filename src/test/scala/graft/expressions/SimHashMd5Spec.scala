package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashMd5Spec extends SparkSpec {
  import spark.implicits._

  test("graft_simhash_md5 is registered via SparkSessionExtensions") {
    assert(spark.catalog.functionExists("graft_simhash_md5"))
  }

  test("kernel is bit-identical to the HOF fallbacks at 32 and 64 bits") {
    // The oracle-checked queries may take either path — they MUST agree.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "one"),
      (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("id", "text")
    val tm = docs.select($"id", graft.dedup.Dedup.tokenMd5s($"text").as("_m"))
    for (bits <- Seq(32, 64)) {
      val kernel = tm
        .select($"id", call_function("graft_simhash_md5", $"_m", lit(bits)))
        .orderBy("id").collect().map(_.getLong(1)).toList
      val hof = tm
        .select($"id",
          (if (bits == 32) graft.dedup.Dedup.simhash32Md5($"_m")
           else graft.dedup.Dedup.simhash64Md5($"_m")).as("sh"))
        .orderBy("id").collect().map(_.getLong(1)).toList
      assert(kernel == hof, s"bits=$bits kernel=$kernel hof=$hof")
      // identical docs collide exactly; 64-bit uses high bits (a fingerprint
      // of ≥26 distinct tokens that never sets any bit ≥32 would mean the
      // wide basis silently degenerated)
      assert(kernel(0) == kernel(1))
      if (bits == 64) assert(kernel.exists(h => (h >>> 32) != 0L))
    }
  }

  test("graft_simhash64 (xxhash basis) is bit-identical to the HOF fallback") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "one"),
      (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("id", "text")
    assert(spark.catalog.functionExists("graft_simhash64"))
    val th = docs.select($"id", graft.dedup.Dedup.tokenHashes($"text").as("_h"))
    val kernel = th.select($"id", call_function("graft_simhash64", $"_h"))
      .orderBy("id").collect().map(_.getLong(1)).toList
    val hof = th.select($"id", graft.dedup.Dedup.simhashFromHashes($"_h"))
      .orderBy("id").collect().map(_.getLong(1)).toList
    assert(kernel == hof, s"kernel=$kernel hof=$hof")
    assert(kernel(0) == kernel(1), "identical docs must collide")
    assert(kernel.exists(h => (h >>> 32) != 0L), "high bits never set")
  }

  test("kernel rejects non-literal or unsupported nBits") {
    val tm = Seq((1L, "a b")).toDF("id", "text")
      .select($"id", graft.dedup.Dedup.tokenMd5s($"text").as("_m"))
    intercept[Exception] {
      tm.select(call_function("graft_simhash_md5", $"_m", lit(48))).collect()
    }
  }
}
