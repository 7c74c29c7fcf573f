package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measured scaling evidence for the 100×-claims in SCALE.md.
  * Replicates the sf0.1 tables m ∈ {1, 4, 8} times with key/time offsets
  * (so group counts and join fan-outs scale, but per-key densities stay
  * realistic — naive duplication would instead synthesize a worst-case
  * near-dup corpus) and times the core shuffle/window shapes. Near-linear
  * wall-time growth at fixed parallelism is the pass signal.
  * Usage: {{{ sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 1,4,8" }}} */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1, 4, 8))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, m: Int, idCols: Seq[String],
                  idStride: Long, tsCol: Option[(String, Long)]): DataFrame =
      (0 until m).map { i =>
        val shifted = idCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * idStride)))
        tsCol.fold(shifted) { case (c, span) =>
          shifted.withColumn(c, col(c) + lit(i * span)) }
      }.reduce(_ unionByName _)

    // dev-only op filter (comma-separated label prefixes) so a new probe
    // row can be measured without re-running the whole battery
    val only = sys.env.get("SPARK_GRAFT_PROBE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def time(label: String, m: Int)(body: => Long): Unit =
      if (only.forall(_.exists(label.startsWith))) {
        val t0 = System.nanoTime()
        val rows = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"$label","scale":$m,"rows":$rows,"sec":$dt%.3f}""")
      }

    val events = graft.Tables.events(spark, dir)
    val tsSpan = 1L << 44 // >> the fixture's time span: replicas never merge
    val docs = graft.Tables.documents(spark, dir)
    val li = graft.Tables.lineitem(spark, dir)
    val ord = graft.Tables.orders(spark, dir)

    for (m <- scales) {
      val ev = replicate(events, m, Seq("event_id", "user_id"), 1L << 40,
        Some(("ts_us", tsSpan))).persist()
      ev.count() // materialize outside the timers
      time("shuffle_join_agg", m) {
        replicate(li, m, Seq("l_orderkey"), 1L << 40, None)
          .join(replicate(ord, m, Seq("o_orderkey"), 1L << 40, None),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
            count(lit(1))).count()
      }
      time("sessionize", m) {
        graft.operators.Sessions.sessionize(
          ev.select("user_id", "ts_us"), Seq("user_id"), "ts_us",
          1800000000L).count()
      }
      time("moving_range_window", m) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("ts_us"))
          .rangeBetween(-600000000L, 0L)
        ev.select(col("event_type"), col("ts_us"),
            expr("cast(round(value * 1000) as long)").as("v"))
          .withColumn("c", count(lit(1)).over(w))
          .withColumn("s", sum("v").over(w)).count()
      }
      time("exact_dedup", m) {
        graft.dedup.Dedup.exactDedupSurvivors(
          replicate(docs, m, Seq("doc_id"), 1L << 40, None),
          "doc_id", "text").count()
      }
      time("shard_assign_256", m) {
        // deterministic shard layout: one keyed exchange + per-shard rank
        // sort; shards ≫ cores is the realistic regime (per-shard sort
        // stays ~corpus/shards rows however large the corpus)
        graft.text.Sampling.shardAssign(
          replicate(docs, m, Seq("doc_id"), 1L << 40, None)
            .select("doc_id"), "doc_id", 256).count()
      }
      // PromQL function family: keyed by user_id so the SERIES COUNT
      // scales with replication (the Prometheus operating regime —
      // cardinality grows, per-series density stays fixed)
      time("rates_over_time", m) {
        graft.operators.Rates.overTime(
          ev.select(col("user_id"), col("ts_us"),
            expr("cast(round(value * 1000) as long)").as("v")),
          Seq("user_id"), "ts_us", "v", rangeUs = 900000000L).count()
      }
      time("rates_deriv_predict", m) {
        graft.operators.Rates.derivPredict(
          ev.select(col("user_id"), col("ts_us"),
            expr("cast(round(value * 1000) as long)").as("v")),
          Seq("user_id"), "ts_us", "v", horizonSec = 3600L).count()
      }
      time("rates_rate_window", m) {
        graft.operators.Rates.rateWindow(
          ev.select(col("user_id"), col("ts_us"), col("event_id"),
            expr("cast(round(value * 1000) as long)").as("v")),
          Seq("user_id"), "ts_us", "v", "event_id",
          rangeUs = 900000000L).count()
      }
      time("rates_ewma_k40", m) {
        graft.operators.Rates.ewma(
          ev.select(col("user_id"), col("ts_us"), col("event_id"),
            expr("cast(round(value * 1000) as long)").as("v")),
          Seq("user_id"), Seq("ts_us", "event_id"), "v",
          alpha = 0.3, k = 40).count()
      }
      time("holt_winters", m) {
        // per-key recurrence fold (VERDICT r7 item 8): keyed by user_id so
        // series cardinality scales m×; the shape is one keyed exchange +
        // external sort-within-partitions + an O(1)-state mapPartitions
        // fold — no per-key materialization anywhere, spill-clean by
        // construction. Near-linear growth is the pass bar.
        graft.operators.Rates.holtWinters(
          ev.select(col("user_id"), col("ts_us"),
            coalesce(col("value"), lit(0.0)).as("v")),
          "user_id", "ts_us", "v", sf = 0.3, tf = 0.1).count()
      }
      time("windows_partitioned", m) {
        val series = ev.filter(col("event_type") === "click")
          .groupBy(expr("ts_us div 60000000").as("ts_min"))
          .agg(avg("value").as("v"))
        graft.operators.Windows.slidingWindowsPartitioned(
          series, Seq("ts_min"), Seq("v"), 20, bucketSize = 4096).count()
      }
      ev.unpersist(false)

      // Dedup/LSH family: naive doc replication would synthesize a
      // worst-case near-dup corpus (every replica a clone), so each
      // replica's TOKENS are salted with a replica tag instead — the
      // within-replica similarity structure is preserved exactly while
      // replicas share no shingles: candidate counts scale m×, not m².
      val salted = (0 until m).map { i =>
        docs.select((col("doc_id") + lit(i.toLong << 40)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$i$$1").as("text"))
      }.reduce(_ unionByName _).persist()
      salted.count()
      time("minhash_lsh_md5", m) {
        graft.dedup.Dedup.minhashCandidatesMd5(
          salted, "doc_id", "text").count()
      }
      time("dup_spans", m) {
        graft.dedup.Dedup.duplicatedSpans(
          salted, "doc_id", "text", k = 3, maxDf = 5, minSpan = 5).count()
      }
      // LM scoring family on the SALTED corpus — the worst case for the
      // token-keyed joins: replica vocabularies are disjoint, so the
      // vocab/LM count tables grow m× alongside the corpus (a shared
      // vocabulary would only grow counts). Near-linear growth is the
      // pass bar; the scoring join itself is the open-ended-dimension
      // equi-join whose scale story the scaladocs claim.
      time("bigram_lm_salted", m) {
        graft.text.TextStats.bigramSurprisal(
          salted, "doc_id", "text").count()
      }
      time("dsir_weights_salted", m) {
        graft.text.TextStats.importanceWeights(
          salted, "doc_id", "text", col("doc_id") % 2 === 0).count()
      }
      time("reference_drift_salted", m) {
        graft.text.TextStats.referenceDrift(
          salted.withColumn("source", (col("doc_id") % 16).cast("string")),
          "source", "text", col("doc_id") % 2 === 0).count()
      }

      // Hamming pair family, claim 1 (corpus independence): UNSALTED
      // replication multiplies the corpus m× while the distinct-hash set
      // stays FIXED — the distinct-collapse must keep candidate count flat
      // (multiplicities ride along; a near-dup corpus concentrating on few
      // fingerprints is exactly the real operating regime).
      val dupTexts = (0 until m).map { i =>
        docs.select((col("doc_id") + lit(i.toLong << 40)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      val dupHashes = dupTexts
        .select(graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
        .select(graft.dedup.Dedup.simhash32Md5(col("_m")).as("sh"))
      time("hamming_pairs_dup_corpus", m) {
        // "rows" = total near-pairs found (grows ~m² from the duplicate
        // multiplicities — that's arithmetic expansion, not join work)
        graft.sim.Hamming.pairCounts(dupHashes, "sh", Seq(8, 8, 8, 8), 3)
          .agg(coalesce(sum("n_pairs"), lit(0L))).head().getLong(0)
      }
      // Claim 2 (band-width selectivity): SALTED replicas have disjoint
      // fingerprints, so D grows m× and random candidates follow
      // Σ_b D²/2^w_b/2 — measured for the shipped 4×8 banding vs the
      // former 8×4 to show the 16× constant, and vs the formula.
      val saltedHashes = salted
        .select(graft.dedup.Dedup.tokenMd5s(col("text")).as("_m"))
        .select(graft.dedup.Dedup.simhash32Md5(col("_m")).as("sh"))
      val grouped = graft.sim.Hamming.distinctHashes(saltedHashes, "sh")
      val dCount = grouped.count()
      // the 8×4 row exists only to demonstrate the former banding's
      // constant — at m>4 it would count hundreds of millions of junk
      // candidates (the very behavior the re-band removed), so cap it;
      // the salted 4×8 row caps at m≤8 (quadratic in D by construction)
      for ((label, widths) <- Seq(
          ("hamming_cand_4x8", Seq(8, 8, 8, 8)),
          ("hamming_cand_8x4", Seq(4, 4, 4, 4, 4, 4, 4, 4)))
          if (widths.head == 8 && m <= 8) || (widths.head == 4 && m <= 4)) {
        val predicted = widths.map(w => dCount.toDouble * dCount / (1L << w) / 2).sum
        time(s"$label(D=$dCount,predicted=${predicted.toLong})", m) {
          graft.sim.Hamming.bandedCandidates(grouped, widths).count()
        }
      }
      // Round-10: q_simhash32_saturation's registry row is now BOUNDED to
      // a fixed 2000-doc slice; the unbounded saturation curve (growing
      // distinct-hash count D against the 32-bit space — near-pair count
      // explodes as D approaches 2^16·√2 by birthday arithmetic) stays
      // reproducible here, on the salted (disjoint-fingerprint) corpus.
      time("simhash32_unbounded", m) {
        graft.sim.Hamming.pairCounts(saltedHashes, "sh", Seq(8, 8, 8, 8), 3)
          .agg(coalesce(sum("n_pairs"), lit(0L))).head().getLong(0)
      }
      salted.unpersist(false)

      // PQ family: codebook training is corpus-scan + k-fixed aggregates
      // (cost ∝ rows, driver traffic m·ksub rows/iter), coding map-only,
      // the reranked search a broadcast-queries × codes scan + tiny exact
      // stage — every stage must scale linearly in corpus size
      val emb = graft.Tables.embeddings(spark, dir)
      val embM = (0 until m).map { i =>
        emb.select((col("vec_id") + lit(i.toLong << 40)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _).persist()
      embM.count()
      time("pq_codes_4x4x1", m) {
        graft.sim.Ann.pqCodes(embM, "vec_id", "embedding",
          m = 4, ksub = 4, iters = 1, dims = 64).count()
      }
      time("pq_rerank_8x8x2", m) {
        val q = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        graft.sim.Ann.pqTopKRerank(q, "qid", "qv", embM, "vec_id",
          "embedding", k = 5, m = 8, ksub = 8, iters = 2, dims = 64,
          rerank = 50).count()
      }
      embM.unpersist(false)

      // SemDeDup in the operating regime: cell count GROWS with the
      // corpus (quantizer k scales with N), per-cell population fixed —
      // so the cell-keyed pair join must grow linearly. Replicas get
      // offset labels AND circularly-rotated embeddings (rotation
      // preserves within-replica geometry exactly while cross-replica
      // centroids land far apart, keeping assignments replica-local).
      // Fixed-k replication would grow Σ n_c² quadratically — that
      // regime is the quantizer-refresh trigger, not a probe target.
      val embSd = (0 until m).map { i =>
        val rot = i % 64
        val rotated = if (rot == 0) col("embedding")
          else concat(slice(col("embedding"), lit(rot + 1), lit(64 - rot)),
            slice(col("embedding"), lit(1), lit(rot)))
        emb.select((col("vec_id") + lit(i.toLong << 40)).as("vec_id"),
          rotated.as("embedding"), (col("label") + lit(i * 10)).as("label"))
      }.reduce(_ unionByName _)
      time("semdedup_k_scaled", m) {
        graft.sim.Ann.semDedup(embSd, "vec_id", "embedding", "label",
          threshold = 0.30).count()
      }
      // The self-tuning variant on the SAME rotated corpus: cell count
      // 2^autoBits(N) grows with N with no label column and no manual
      // quantizer refresh — near-linear wall is the pass signal, and
      // matching semdedup_k_scaled's shape shows auto-bits lands the
      // operating regime the fixed-k registry row only documents.
      time("semdedup_auto", m) {
        graft.sim.Ann.semDedupAuto(embSd, "vec_id", "embedding",
          threshold = 0.30).count()
      }
      // Round-10: q_semdedup_fixedk's registry row is now BOUNDED to a
      // fixed 1000-vector slice; the unbounded N²/k law (labels and
      // geometry UNCHANGED across replicas, so per-cell population grows
      // m× and the within-cell pair join grows m² — the quantizer-refresh
      // trigger regime) stays reproducible here.
      time("semdedup_fixedk_unbounded", m) {
        val embFixed = (0 until m).map { i =>
          emb.select((col("vec_id") + lit(i.toLong << 40)).as("vec_id"),
            col("embedding"), col("label"))
        }.reduce(_ unionByName _)
        graft.sim.Ann.semDedup(embFixed, "vec_id", "embedding", "label",
          threshold = 0.30).count()
      }
    }
    spark.stop()
  }
}
