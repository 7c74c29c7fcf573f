package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an N× scale-up of a testdata directory so scaling
  * claims can be MEASURED, not argued (VERDICT r7 item 1). The driver only
  * ships sf0.001/0.01/0.1; this derives sfX = N shifted copies of sf0.1
  * with keys remapped so every join/FK relationship survives:
  *
  *  - fact/dim keys shift by copy·(max+1) per key domain (orders↔lineitem,
  *    customer, supplier, part, events.user_id all stay consistent);
  *  - region/nation are genuine dims — copied once, never replicated;
  *  - events shift ts by copy·30d so the corpus's TIME SERIES grows N×
  *    (contiguous months), not N overlaid copies of the same month;
  *  - document TEXTS are perturbed per copy (every 2nd token gets a copy
  *    suffix) so the scale-up grows the corpus like new crawl data rather
  *    than planting every doc in a 10-way exact/near-dup clique that would
  *    make dedup queries measure data pathology instead of engine scaling.
  *    Every-4th was measured insufficient: SimHash-64 is robust to 25%
  *    token edits BY DESIGN, so copies stayed within Hamming 4 of their
  *    original (49.9k cross-copy pairs at 10×, 20× query blow-up); at 50%
  *    replacement every 2-shingle and most simhash bits diverge and the
  *    cross-copy clique disappears from both MinHash and SimHash candidate
  *    sets. n_chars is recomputed to stay = length(text);
  *  - embeddings get small deterministic per-copy, per-dim offsets —
  *    distinct vectors, clusters intact;
  *  - doc_id/vec_id shift by copy·10⁷, far above the +10⁶ twin-corpus
  *    offsets some queries build internally.
  *
  * An optional 4th arg selects the document-corpus PROFILE:
  *
  *  - `default` — the shifted-copy scheme above. The driver's base
  *    corpus is template-generated, so this profile is near-dup-heavy
  *    BY CONSTRUCTION (~7.1k natural SimHash-64 pairs on 5k sf0.1 docs)
  *    — the worst-case regime for pair miners, kept as the stress
  *    profile;
  *  - `lowdup` — the realistic-crawl profile (round-10 verdict item 3):
  *    every doc's tokens get a per-doc salt suffix, which decorrelates
  *    the generator's template siblings (no two distinct docs share a
  *    token, so fingerprints are independent), and a planted partner
  *    slice — every 50th doc re-emitted at doc_id+5·10⁶ with the SAME
  *    salt and 10% of tokens edited — gives a controlled ~2% natural
  *    near-dup pair rate (pairs, never cliques: partners are emitted
  *    once per source doc). Heavy-hitter token stats are deliberately
  *    sacrificed; this profile exists to measure pair-mining scale
  *    behavior free of the default profile's clustering pathology.
  *    Only `documents` differs between profiles.
  *
  * Usage: {{{ runMain graft.tools.MakeScale /root/testdata/sf0.1 /root/repo/.scratch/sf1 10 [default|lowdup] }}} */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: MakeScale <srcDir> <outDir> <copies> [default|lowdup]")
    val Array(src, out, copiesS) = args.take(3)
    val profile = args.lift(3).getOrElse("default")
    require(profile == "default" || profile == "lowdup", s"bad profile $profile")
    val copies = copiesS.toInt
    require(copies >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key)).cast("long")).collect()(0).getLong(0) + 1L

    // dims: copy once
    write(read("region"), "region")
    write(read("nation"), "nation")

    val custSpan = span(read("customer"), "c_custkey")
    val suppSpan = span(read("supplier"), "s_suppkey")
    val partSpan = span(read("part"), "p_partkey")
    val orderSpan = span(read("orders"), "o_orderkey")
    val eventSpan = span(read("events"), "event_id")
    val userSpan = span(read("events"), "user_id")

    /** Union `copies` shifted copies; `shifts` maps column → key-domain span. */
    def replicate(t: String, shifts: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (df, _) => df): DataFrame =
      (0 until copies).map { c =>
        val base = shifts.foldLeft(read(t)) { case (df, (k, s)) =>
          df.withColumn(k, col(k) + lit(c * s))
        }
        extra(base, c)
      }.reduce(_ unionByName _)

    write(replicate("customer", Map("c_custkey" -> custSpan)), "customer")
    write(replicate("supplier", Map("s_suppkey" -> suppSpan)), "supplier")
    write(replicate("part", Map("p_partkey" -> partSpan)), "part")
    write(replicate("orders",
      Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)), "orders")
    write(replicate("lineitem",
      Map("l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
        "l_suppkey" -> suppSpan)), "lineitem")
    // Copy c's events shift forward c×30 days (the base corpus spans
    // Jan 1–30), tiling the timeline contiguously: an N× corpus carries an
    // N×-LONGER time series, not N overlaid replicas of the same month.
    // Without this the per-minute aggregates every time-series query
    // (sessions, rates, detection quality) builds collapse to the base
    // corpus's length and a 10× events row adds no new scale evidence
    // (round-10 advisor finding on the sf1 q_detect_quality claim).
    write(replicate("events",
      Map("event_id" -> eventSpan, "user_id" -> userSpan),
      extra = (df, c) =>
        if (c == 0) df
        else df.withColumn("ts",
          col("ts") + expr(s"INTERVAL ${c.toLong * 30} DAYS"))), "events")

    if (profile == "default") {
      write(replicate("documents", Map("doc_id" -> 10000000L),
        extra = (df, c) =>
          if (c == 0) df
          else df
            .withColumn("text", when(length(trim(col("text"))) === 0, col("text"))
              .otherwise(concat_ws(" ",
              // every 2nd token gets a copy suffix: every 2-token shingle
              // and most simhash bits diverge across copies (measured — see
              // scaladoc), while half the token mass stays on the shared
              // vocabulary for realistic heavy-hitter stats
              zip_with(split(trim(col("text")), "\\s+"),
                sequence(lit(0), size(split(trim(col("text")), "\\s+")) - 1),
                (t, i) => when(pmod(i + lit(c), lit(2)) === 0,
                  concat(t, lit(c.toString))).otherwise(t)))))
            .withColumn("n_chars", length(col("text")).cast("long"))),
        "documents")
    } else {
      // lowdup profile (see object scaladoc): every token suffixed with a
      // per-doc salt ("s" + doc_id — unique across copies since doc_id is
      // already shifted), so distinct docs share NO tokens and template
      // clusters decorrelate; the partner slice re-emits every 50th doc
      // under the SAME salt with every 10th token edited ("x" suffix) —
      // 10% edits keep partners within SimHash-64 Hamming 4 of their
      // source (the 25%-robustness lesson, this file's scaladoc), so the
      // planted ~2% pair rate is what a banded miner should find.
      def saltTokens(partner: Boolean) = {
        val toks = split(trim(col("text")), "\\s+")
        when(length(trim(col("text"))) === 0, col("text"))
          .otherwise(concat_ws(" ",
            zip_with(toks, sequence(lit(0), size(toks) - 1),
              (t, i) =>
                if (!partner) concat(t, lit("s"), col("doc_id"))
                else when(pmod(i, lit(10)) === 0,
                    concat(t, lit("x"), col("doc_id")))
                  .otherwise(concat(t, lit("s"), col("doc_id"))))))
      }
      val base = replicate("documents", Map("doc_id" -> 10000000L))
      val saltedAll = base.withColumn("text", saltTokens(partner = false))
      val partners = base.filter(pmod(col("doc_id"), lit(50)) === 0)
        .withColumn("text", saltTokens(partner = true))
        // shift AFTER salting: the partner keeps its source's salt; +5·10⁶
        // stays inside the copy's 10⁷ id stripe and clear of the +10⁶
        // re-syndication overlay q_simhash_pairs adds on top
        .withColumn("doc_id", col("doc_id") + lit(5000000L))
      write(saltedAll.unionByName(partners)
        .withColumn("n_chars", length(col("text")).cast("long")),
        "documents")
    }

    write(replicate("embeddings", Map("vec_id" -> 10000000L),
      extra = (df, c) =>
        if (c == 0) df
        else df.withColumn("embedding",
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (e, i) => e + (pmod(lit(c * 31) + i * 17, lit(11)) - lit(5))
              .cast("float") * lit(0.01f)))),
      "embeddings")

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"[MakeScale] wrote $out (${copies}x $src): ${counts.mkString(", ")}")
    spark.stop()
  }
}
