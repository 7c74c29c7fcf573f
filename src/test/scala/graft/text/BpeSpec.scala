package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest").toDF("text")

  test("merge rounds pick the most frequent pair with deterministic tiebreak") {
    val merges = Bpe.train(Bpe.wordTable(corpus, "text"), 4)
      .map(m => (m.step, m.pair, m.cnt))
    // hand-checked: 'a t' (cat/sat/mat/ate/rat = 6) beats 't _' (6) on the
    // lexicographic tiebreak; then 'at _' ×5, 'e _' ×5 (ate/the), and once
    // e_ exists, 'h e_' ×4 from the four 'the's
    assert(merges == Seq((1, "a t", 6L), (2, "at _", 5L), (3, "e _", 5L),
      (4, "h e_", 4L)), merges.toString)
  }

  test("merges apply greedily left-to-right without crossing symbol boundaries") {
    // 'a a a a' -> merging 'a a' must pair greedily: (aa)(aa), not overlap;
    // and a word containing 'ta' must NOT be split by a 't a' merge applied
    // inside the merged symbol 'at' (boundary safety)
    val docs = Seq("aaaa aaaa aaa").toDF("text")
    val merges = Bpe.train(Bpe.wordTable(docs, "text"), 2)
      .map(m => (m.step, m.pair, m.cnt))
    // round 1: pairs of 'a a' in aaaa×2 (3 each) + aaa (2) = 8
    assert(merges.head == (1, "a a", 8L), merges.toString)
    // round 2 proves greedy non-overlap: aaaa -> (aa)(aa) ['aa aa','aa _'],
    // aaa -> (aa)a ['aa a','a _']; 'aa _' (2) ties 'aa aa' (2) and wins
    // the lexicographic tiebreak ('_' < 'a')
    assert(merges(1) == (2, "aa _", 2L), merges.toString)
  }

  test("driver tier and distributed tier produce identical merges") {
    // richer corpus so ties and multi-round interactions are exercised
    val docs = Seq(
      "the cat sat on the mat", "the cat ate the rat",
      "low lower lowest", "banana bandana ananas",
      "mississippi missive permission").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val local = Bpe.trainLocal(
      words.collect().map(r => (r.getString(0), r.getLong(1))), 8)
    val dist = Bpe.trainDistributed(words, 8)
    assert(local == dist,
      s"tier divergence:\nlocal $local\ndist  $dist")
    // and the public train() at this size routes to the driver tier
    assert(Bpe.train(words, 8) == local)
  }

  test("distributed tier unpersists its working tables") {
    // train() routes small vocabularies to the driver tier, so the
    // distributed loop's persist/unpersist handoff needs its own fence
    spark.catalog.clearCache()
    val words = Bpe.wordTable(
      Seq("the cat sat on the mat", "the cat ate").toDF("text"), "text")
    Bpe.trainDistributed(words, 3)
    assert(spark.sharedState.cacheManager.isEmpty,
      "trainDistributed left persisted word tables behind")
  }

  test("early stop when merges exhaust every pair, both tiers") {
    // one word "a": round 1 merges 'a _' -> the word is ONE symbol ->
    // round 2 finds no pair and stops, well before the 5-round budget
    val docs = Seq("a").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val want = Seq(Bpe.Merge(1, "a _", 1L))
    assert(Bpe.train(words, 5) == want)
    assert(Bpe.trainDistributed(words, 5) == want)
  }
}
