package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity spec for graft_bpe_count vs the comma-form replace chain it
  * replaces in Bpe.encode: one left-to-right non-overlapping merge pass
  * per trained pair. Fixtures chase the scan-resumption edges (adjacent
  * repeats "abab", self-pairs "aaa", merged-symbol pairs across rounds)
  * where a wrong resume index would drift the count. */
class BpeCountSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-19 comma-form chain, verbatim. */
  private def commaFormCounts(words: DataFrame,
                              merges: Seq[String]): Seq[(Long, Int)] = {
    var df = words.select(col("id"), concat(lit(","),
      regexp_replace(col("w"), "(.)", "$1,,"), lit("_,")).as("s"))
    merges.foreach { pair =>
      val Array(a, b) = pair.split(" ")
      df = df.select(col("id"),
        expr(s"replace(s, ',$a,,$b,', ',$a$b,')").as("s"))
    }
    df.select(col("id"),
        size(filter(split(col("s"), ","), y => y =!= lit(""))).as("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
  }

  private def kernelCounts(words: DataFrame,
                           merges: Seq[String]): Seq[(Long, Int)] = {
    val arr =
      if (merges.isEmpty) typedLit(Array.empty[String])
      else array(merges.map(lit(_)): _*)
    words.select(col("id"),
        call_function("graft_bpe_count", col("w"), arr).as("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
  }

  private def check(ws: Seq[String], merges: Seq[String]): Unit = {
    val words = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
    val got = kernelCounts(words, merges)
    val ref = commaFormCounts(words, merges)
    assert(got == ref, s"words=$ws merges=$merges: kernel $got vs ref $ref")
  }

  test("adjacent repeats, self-pairs, scan-resume edges") {
    check(Seq("abab", "aaa", "aaaa", "ababab", "ba", "b"),
      Seq("a b"))
    check(Seq("aaa", "aaaa", "aaaaa"), Seq("a a"))
    check(Seq("abc", "abcabc", "cab"), Seq("a b", "ab c"))
  }

  test("merged symbols pair with the end marker and chain across rounds") {
    // t+_ then a+t_ — second round's pair contains a first-round product
    check(Seq("cat", "at", "t", "hat", "catcat"),
      Seq("t _", "a t_", "c at_"))
  }

  test("empty merge list counts chars + end marker") {
    check(Seq("a", "xyz", "q"), Seq.empty)
  }

  test("single-char words and pairs that never match") {
    check(Seq("a", "b", "zzz"), Seq("q x", "a a"))
  }

  test("Bpe.encode kernel path == comma-form chain on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = graft.text.Bpe.train(
      graft.text.Bpe.wordTable(docs, "text"), 8)
    // kernel path (extension registered in TestSpark)
    val fast = graft.text.Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // independent reference: comma-form chain per word + same aggregate
    val words = docs.select(col("doc_id").as("id"),
      explode(graft.text.TextStats.tokens(lower(col("text")))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    var df = words.select(col("id"), concat(lit(","),
      regexp_replace(col("w"), "(.)", "$1,,"), lit("_,")).as("s"))
    merges.foreach { m =>
      val Array(a, b) = m.pair.split(" ")
      df = df.select(col("id"),
        expr(s"replace(s, ',$a,,$b,', ',$a$b,')").as("s"))
    }
    val ref = df.select(col("id"),
        size(filter(split(col("s"), ","), y => y =!= lit(""))).as("n_sym"))
      .groupBy("id")
      .agg(sum("n_sym").as("bpe_tokens"), count(lit(1)).as("n_words"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fast.nonEmpty && fast == ref)
  }
}
