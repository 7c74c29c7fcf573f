package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, empty text yields empty array") {
    val df = Seq("  a  b\tc ", "", "   ").toDF("t")
    val r = df.select(size(TextStats.tokens(col("t")))).as[Int].collect().toSeq
    assert(r == Seq(3, 0, 0))
  }

  test("quality signals: ratios computed over tokens/chars") {
    val df = Seq((1L, "the cat, the hat!")).toDF("id", "text")
    val q = TextStats.withQualitySignals(df, "text").head()
    assert(q.getAs[Long]("n_tokens") == 4L)
    assert(q.getAs[Long]("n_chars_calc") == 17L)
    assert(math.abs(q.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-12)
    assert(math.abs(q.getAs[Double]("stopword_ratio") - 0.5) < 1e-12) // the, the
  }

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      "the cat and the dog of a house",  // en
      "der hund und die katze ist von",  // de
      "le chat et la maison est pour")   // fr
      .toDF("text")
    val r = df.select(TextStats.langId(col("text"))).as[String].collect().toSeq
    assert(r == Seq("en", "de", "fr"))
  }

  test("fingerprintMd5 is whitespace/case-normalized and stable") {
    val df = Seq("Hello  World", "hello world", "different").toDF("t")
    val fps = df.select(TextStats.fingerprintMd5(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }

  test("fingerprintRolling is order-sensitive") {
    val df = Seq("a b c", "c b a").toDF("t")
    val fps = df.select(TextStats.fingerprintRolling(col("t"))).as[Long].collect()
    assert(fps(0) != fps(1))
  }

  test("bpeTokens splits words, numbers and punctuation apart") {
    val df = Seq("don't stop2day!").toDF("t")
    val r = df.select(TextStats.bpeTokens(col("t"))).as[Seq[String]].head()
    assert(r.contains("don") && r.contains("'") && r.contains("t"))
    assert(r.contains("!") && r.contains("2"))
  }

  test("bpeTokens (extraction) == lookaround-split formulation, incl. edge cases") {
    val df = Seq(
      "don't stop2day!", "  spaced   out  ", "", "a1b2c3", "!!??..",
      "MiXeD CaSe 42x", "tab\tand\nnewline", "ctrlchar  nbsp",
      "unicode é ü 中文 ok", "1,234.56 dollars ($)")
      .toDF("t")
    val both = df.select(
      TextStats.bpeTokens(col("t")).as("ex"),
      TextStats.bpeTokensSplit(col("t")).as("sp"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (ex, sp) => assert(ex == sp, s"extract=$ex split=$sp") }
  }

  test("scrubPii masks emails and IPv4s, counts matches before masking") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and 192.168.0.1 twice 10.0.0.7"),
      (2L, "no pii here at all"),
      (3L, "version 1.2 is not an ip, 1.2.3.4 is")).toDF("id", "text")
    val r = TextStats.scrubPii(df, "id", "text").orderBy("id").collect()
    assert(r(0).getAs[Int]("n_emails") == 1 && r(0).getAs[Int]("n_ips") == 2)
    assert(r(0).getAs[String]("scrubbed") ==
      "mail <EMAIL> and <IP> twice <IP>")
    assert(r(1).getAs[Int]("n_emails") == 0 && r(1).getAs[Int]("n_ips") == 0)
    assert(r(1).getAs[String]("scrubbed") == "no pii here at all")
    assert(r(2).getAs[Int]("n_ips") == 1)
    assert(r(2).getAs[String]("scrubbed") == "version 1.2 is not an ip, <IP> is")
  }

  test("repetitionSignals: distinct ratio and top-token share per doc") {
    val df = Seq(
      (1L, "a a a b"),    // 4 tokens, 2 distinct, max tf 3
      (2L, "x y z"),      // no repetition
      (3L, "")).toDF("id", "text")
    val r = TextStats.repetitionSignals(df, "id", "text").orderBy("id").collect()
    assert(r.length == 2) // empty doc emits no row
    assert(r(0).getAs[Long]("n_tokens") == 4 && r(0).getAs[Long]("n_distinct") == 2)
    assert(r(0).getAs[Double]("distinct_ratio") == 0.5)
    assert(r(0).getAs[Double]("top_token_share") == 0.75)
    assert(r(1).getAs[Double]("distinct_ratio") == 1.0)
  }

  test("bigramFluency: common-bigram docs outscore rare-bigram docs; repeats weigh") {
    val df = Seq(
      (1L, "the cat sat"),   // bigrams: "the cat", "cat sat"
      (2L, "the cat ran"),   // shares "the cat"
      (3L, "zq xw vv"),      // unique bigrams only
      (4L, "one")).toDF("id", "text") // single token: no bigrams, no row
    val r = TextStats.bigramFluency(df, "id", "text").orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val fluency = r.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc 1: ("the cat" freq 2 + "cat sat" freq 1) / 2 = 1.5
    assert(fluency(1L) == 1.5)
    assert(fluency(3L) == 1.0) // all-unique bigrams floor at 1.0
    assert(fluency(1L) > fluency(3L))
    assert(r.find(_.getLong(0) == 1L).get.getLong(1) == 2L) // n_bigrams
  }

  test("unigramSurprisal: micro-nat exact values; rare vocabulary scores higher") {
    val df = Seq(
      (1L, "a a a a"),  // 4× the common token
      (2L, "b"),        // 1× a rare token
      (3L, "")).toDF("id", "text") // zero tokens: no row
    val r = TextStats.unigramSurprisal(df, "id", "text").orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // corpus: a→4, b→1, total 5; q(x) = floor(ln(x)·1e6 + 0.5)
    def q(x: Long) = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val expect1 = (q(5) - q(4)).toDouble / 1e6          // every token 'a'
    val expect2 = (q(5) - q(1)).toDouble / 1e6          // ln(5) ≈ 1.609438
    assert(r(0).getAs[Long]("n_tokens") == 4L)
    assert(r(0).getAs[Double]("mean_surprisal_nats") == expect1)
    assert(r(1).getAs[Double]("mean_surprisal_nats") == expect2)
    assert(expect2 > expect1) // rare vocabulary ⇒ higher surprisal
  }

  test("contamination counts shared distinct shingles vs the benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox sleeps"),   // shares 2 3-grams
      (2L, "entirely different words here"), // shares none
      // duplicated n-grams count ONCE: shares {quick brown fox, brown fox jumps}
      (3L, "quick brown fox jumps high quick brown fox jumps"))
      .toDF("id", "text")
    val r = TextStats.contamination(corpus, "id", "text", bench, k = 3)
      .orderBy("id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 2L))) // doc 2 absent: zero overlap
  }

  test("contamination: bloom+join tier (oversized benchmark) matches the InSet tier") {
    // Same data through both plans: inSetLimit=0 forces the bloom+equi-join
    // path a too-big-to-collect benchmark takes; results must be identical
    // (the exact join removes bloom false positives).
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox sleeps"),
      (2L, "entirely different words here"),
      (3L, "quick brown fox jumps high quick brown fox jumps"))
      .toDF("id", "text")
    def run(limit: Int) =
      TextStats.contamination(corpus, "id", "text", bench, k = 3, inSetLimit = limit)
        .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(run(0) == run(TextStats.ContaminationInSetLimit))
    assert(run(0) == Seq((1L, 2L), (3L, 2L)))
  }

  test("chunkTokens: overlapping windows cover every token, tail kept") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "only three tokens"), (3L, "")).toDF("id", "text")
    val out = TextStats.chunkTokens(df, "id", "text", chunkSize = 4, stride = 2)
      .orderBy("id", "chunk_no").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // starts 0,2,4,6 -> 4 chunks; last covers tokens 7..10
    assert(d1.map(_.getString(2)).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(d1.forall(_.getInt(3) == 4))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(2) == "only three tokens" &&
      d2.head.getInt(3) == 3)
    // empty text -> NO chunks (no phantom 1-token "" chunk)
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("boilerplate: hot-bigram coverage per doc; sub-k docs absent") {
    import spark.implicits._
    // bigram "click here" appears in docs 1-3 (df=3 >= minDf=3); every
    // other bigram is unique to its doc
    val df = Seq(
      (1L, "click here alpha beta"),    // bigrams: click-here, here-alpha, alpha-beta
      (2L, "click here gamma"),         // click-here, here-gamma
      (3L, "delta click here"),         // delta-click, click-here
      (4L, "epsilon zeta"),             // no hot bigram
      (5L, "solo")                      // <2 tokens: no bigrams at all
    ).toDF("id", "text")
    val out = TextStats.boilerplate(df, "id", "text", k = 2, minDf = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 0.333333), (2L, 2L, 1L, 0.5),
      (3L, 2L, 1L, 0.5), (4L, 1L, 0L, 0.0)))
  }

  test("gopherRules: exact-integer rule flags and conjunction") {
    import spark.implicits._
    val longOk = ("the word " * 30).trim           // 60 tokens, stops=30
    val shortDoc = "the of and tiny"               // 4 tokens: fails ok_len
    val noStops = ("word " * 60).trim              // 60 tokens, 0 stopwords
    val longWords = (("extraordinarily " * 60).trim) // mean len 15 > 10
    val df = Seq((1L, longOk), (2L, shortDoc), (3L, noStops), (4L, longWords))
      .toDF("doc_id", "text")
    val r = TextStats.gopherRules(df, "doc_id", "text").orderBy("doc_id")
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("ok_len"),
        x.getAs[Int]("ok_mean"), x.getAs[Int]("ok_stop"),
        x.getAs[Int]("pass")))
    assert(r.toSeq == Seq(
      (1L, 1, 1, 1, 1),   // all rules green
      (2L, 0, 1, 1, 0),   // too short; "the","of","and" >= 2 stops
      (3L, 1, 1, 0, 0),   // no stopwords
      (4L, 1, 0, 0, 0)))  // mean token length 15 > 10
    // mean_tok_len is exact: doc 1 has 30*3 + 30*4 = 210 chars / 60 tokens
    val m = TextStats.gopherRules(df, "doc_id", "text")
      .filter(col("doc_id") === 1L).head().getAs[Double]("mean_tok_len")
    assert(m == 3.5)
  }

  test("dupNgramStats: bigram char coverage, hand-computed") {
    import spark.implicits._
    // "ab cd ab cd ef": bigrams = ab-cd (x2), cd-ab (x1), cd-ef (x1)
    // glen = 4 for all; tot = 4*4+1*4+1*4 = 16 gram-chars... per-gram
    // c*glen: ab-cd 8, cd-ab 4, cd-ef 4 -> tot 16, top 8, dup 8
    val df = Seq((1L, "ab cd ab cd ef"), (2L, "xx yy"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = TextStats.dupNgramStats(df, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    // doc 3 has one token -> no bigrams -> absent
    assert(r.toSeq == Seq(
      (1L, 4L, 0.5, 0.5),
      (2L, 1L, 1.0, 0.0)))
  }

  test("dupNgramStats: trigram grain and sub-n docs absent") {
    import spark.implicits._
    val df = Seq((1L, "a b a b a b"), (2L, "x y")).toDF("doc_id", "text")
    // trigrams of doc 1: "a b a","b a b","a b a","b a b" -> each x2
    // glen = 3; tot = 4*3 = 12, dup = 12, top = 2*3 = 6
    val r = TextStats.dupNgramStats(df, "doc_id", "text", n = 3).collect()
    assert(r.length == 1) // doc 2 has < 3 tokens
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)) ==
      (1L, 4L, 0.5, 1.0))
  }

  test("bigramSurprisal: add-1 bigram LM, hand-computed micro-nats") {
    import spark.implicits._
    // corpus: doc1 "a b a b" (bigrams ab,ba,ab), doc2 "a b" (ab), doc3
    // "solo" (no bigrams but its token counts toward V: V={a,b,solo}=3)
    // c12: ab=3 ba=1; c1: a=3 b=1
    // qln micro: ln6->1791759, ln4->1386294, ln2->693147
    // surp(ab)=qln(3+3)-qln(3+1)=405465; surp(ba)=qln(1+3)-qln(1+1)=693147
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = TextStats.bigramSurprisal(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 2) // doc 3 has < 2 tokens -> no row
    assert(r(0).getLong(1) == 3L)
    assert(math.abs(r(0).getDouble(2) - (2 * 405465L + 693147L) / 3.0 / 1e6) < 1e-12)
    assert(r(1).getLong(1) == 1L)
    assert(math.abs(r(1).getDouble(2) - 0.405465) < 1e-12)
  }

  test("sourceDivergence: KL vs corpus matches the exact formula") {
    import spark.implicits._
    // s1: "a a b" (a=2,b=1, n=3); s2: "b b" (b=2, n=2); corpus a=2,b=3,N=5
    val df = Seq(("s1", "a a b"), ("s2", "b b")).toDF("source", "text")
    val r = TextStats.sourceDivergence(df, "source", "text")
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r(0)._2 == 3L && r(1)._2 == 2L)
    // true KL(s1)=2/3 ln(5/3)+1/3 ln(5/9)=0.1446215; micro-quantized 0.144622
    assert(math.abs(r(0)._3 - 0.144622) < 1e-9)
    // KL(s2)=ln(5/3)=0.5108256 -> 0.510826 after quantization
    assert(math.abs(r(1)._3 - 0.510826) < 1e-9)
    // KL is non-negative up to quantization on both rows
    assert(r.forall(_._3 > -1e-6))
  }

  test("importanceWeights: target-tilted docs score positive, others negative") {
    import spark.implicits._
    // target = doc 1 only. cs: a=2 b=2 c=1 (ns=5, V=3); ctg: a=2 b=1 (nt=3)
    // lr(a)=qln8-qln6=287683; lr(b)=-117782; lr(c)=-405464 micro-nats
    val df = Seq((1L, "a a b", "en"), (2L, "b c", "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextStats.importanceWeights(df, "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r(0) == ((1L, 3L, (2 * 287683L - 117782L) / 1e6)))
    assert(r(1) == ((2L, 2L, (-117782L - 405464L) / 1e6)))
    assert(r(0)._3 > 0 && r(1)._3 < 0)
  }

  test("oovRate: mass outside the deterministic top-k head") {
    import spark.implicits._
    // counts: b=3 a=2 c=1 d=1 -> top-2 = {b, a}
    val df = Seq((1L, "a a b c"), (2L, "b b d")).toDF("doc_id", "text")
    val r = TextStats.oovRate(df, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 3L, 1L, 1.0 / 3)))
  }

  test("charEntropy: micro-nat code-point entropy, unicode included") {
    import spark.implicits._
    // "aab": H = ln3 - (2/3)ln2 -> (3*qln3 - 2*qln2)/3e6 = 0.636514
    // "aaaa": H = 0 exactly; "中中文" mirrors "aab" per code point
    val df = Seq((1L, "aab"), (2L, "aaaa"), (3L, "中中文"))
      .toDF("doc_id", "text")
    val r = TextStats.charEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val h3 = (3L * 1098612L - 2L * 693147L) / 3.0 / 1e6
    assert(r(0) == ((1L, 3L, h3)))
    assert(r(1) == ((2L, 4L, 0.0)))
    assert(r(2) == ((3L, 3L, h3)))
  }

  test("ngramNovelty: first-seen shingles counted to the earliest doc") {
    import spark.implicits._
    // k=2: doc1 {a b, b c}; doc2 {b c, c d}; doc3 {a b}
    val df = Seq((1L, "a b c"), (2L, "b c d"), (3L, "a b"))
      .toDF("doc_id", "text")
    val r = TextStats.ngramNovelty(df, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, 2L, 0L, 1.0),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 1L, 0.0)))
  }
}
