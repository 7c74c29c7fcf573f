package graft

/** Plan-level regression guard over the ENTIRE query registry: the scale
  * properties the design depends on, asserted so a future edit cannot
  * silently regress them.
  *
  *  - No `CartesianProduct` anywhere (broadcast nested-loop joins of tiny
  *    sides are fine and appear as BroadcastNestedLoopJoin).
  *  - No no-partition `WindowExec` ("moves all data to a single
  *    partition") outside the documented faithful-semantics queries, each
  *    of which has an oracle-verified partitioned twin in the registry.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries that intentionally plan a global-order window: they mirror
    * the reference's pandas whole-frame semantics and each has a
    * scale-shaped twin proven result-equal (q_ffill_partitioned_w1,
    * q_window_w2_partitioned, q_window_mse_a6_partitioned,
    * q_running_anomaly_a10_partitioned). */
  private val globalWindowAllowed = Set(
    "q_ffill_bfill_w1", "q_fill_mean_a1", "q_fill_median_a2",
    "q_window_w2", "q_window_mse_a6", "q_running_anomaly_a10")

  /** Every node in the physical tree, descending through the AQE wrapper
    * (whose input plan is not reachable via `children`) AND into subquery
    * plans (a cartesian hidden inside a scalar subquery must not evade the
    * guard). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.inputPlan)
      case _ => p.children
    }
    p +: (kids ++ p.subqueries).flatMap(allNodes)
  }

  test("registry-wide: no CartesianProduct; single-partition windows only where documented") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val flaggedGlobal = scala.collection.mutable.Set[String]()
    Queries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nodes = allNodes(fn(spark, dir).queryExecution.executedPlan)
      if (nodes.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.joins.CartesianProductExec]))
        offenders += s"$name: CartesianProduct"
      val noPartWindow = nodes.exists {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.isEmpty
        case _ => false
      }
      if (noPartWindow) {
        if (globalWindowAllowed.contains(name)) flaggedGlobal += name
        else offenders += s"$name: no-partition window"
      }
    }
    assert(offenders.isEmpty, s"plan regressions:\n${offenders.mkString("\n")}")
    // detector sanity: the documented global-window queries ARE detected
    // (if this stops firing, the detector went vacuous, not the plans clean)
    assert(flaggedGlobal.contains("q_window_w2") &&
      flaggedGlobal.contains("q_running_anomaly_a10"),
      s"detector only flagged: $flaggedGlobal")
  }

  test("bench-only production twins: candidate generation is an equi-join, never all-pairs") {
    // The xxhash/float twins are benched (production_total) but not
    // oracle-dumped, so the registry-wide sweep above never sees them —
    // pin the same no-cartesian contract here. BroadcastNestedLoopJoin is
    // banned too: these four are pair/bucket plans where a BNLJ would mean
    // the bucket key fell out of the join condition.
    Queries.benchOnly.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val nodes = allNodes(fn(spark, dir).queryExecution.executedPlan)
      assert(!nodes.exists(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
        s"$name plans an all-pairs join: ${nodes.map(_.nodeName).distinct}")
    }
    // substitution map hygiene: every twin substitutes a registered row
    Queries.productionSubstitutes.foreach { case (twin, md5Row) =>
      assert(Queries.benchOnly.contains(twin), s"$twin not in benchOnly")
      assert(Queries.queries.contains(md5Row),
        s"$twin substitutes unregistered row $md5Row")
    }
  }

  test("column pruning reaches the parquet scans (requiredSchema lists only referenced columns)") {
    // representative narrow projections over wide tables: a scan reading
    // all columns for a 2-column query is a pruning regression. Asserted
    // on the scan node's actual requiredSchema, not the explain text —
    // ReadSchema strings truncate at spark.sql.maxMetadataStringLength,
    // which would let a late-schema column slip past a substring check.
    val cases = Seq(
      // query -> a column that MUST be read / one that must NOT
      ("q_embed_norm", "embedding", "label"),
      ("q_fingerprint", "text", "lang"),
      ("q_json_s2", "props", "user_id"),
      ("q1_agg", "l_quantity", "l_partkey"))
    cases.foreach { case (q, mustRead, mustNotRead) =>
      val readCols = allNodes(
        Queries.queries(q)(spark, dir).queryExecution.executedPlan)
        .collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.requiredSchema.fieldNames.toSeq
        }.flatten.toSet
      assert(readCols.contains(mustRead), s"$q scan lost $mustRead: $readCols")
      assert(!readCols.contains(mustNotRead),
        s"$q scan reads unreferenced column $mustNotRead: $readCols")
    }
  }

  test("round-5 query contracts: plan shapes that must not silently regress") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)
    def partitionedWindowsOnly(q: String, nodes: Seq[SparkPlan]): Unit =
      nodes.foreach {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          assert(w.partitionSpec.nonEmpty, s"$q planned a single-partition window")
        case _ => ()
      }

    // q_pack_bins_bucketed: the carry-in join must broadcast its tiny
    // bucket-summary side, and every window must be partitioned (the whole
    // point of the twin is removing the single-task ceiling)
    val packNodes = nodesOf("q_pack_bins_bucketed")
    partitionedWindowsOnly("q_pack_bins_bucketed", packNodes)
    assert(packNodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "q_pack_bins_bucketed lost the broadcast carry join")

    // q_dup_spans: anchored-shingle table stays materialized across its
    // self-join (one upstream pipeline execution, not two — a
    // localCheckpoint, so both join sides scan the same RDD) and the span
    // assembly window is partitioned by (pair, diagonal)
    val spanNodes = nodesOf("q_dup_spans")
    partitionedWindowsOnly("q_dup_spans", spanNodes)
    assert(spanNodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.RDDScanExec]),
      "q_dup_spans no longer reads the checkpointed anchored-shingle table")

    // q_embed_quant: pure per-row expression pipeline — no join, no
    // aggregate exchange; the only shuffle allowed is the final sort
    val quantNodes = nodesOf("q_embed_quant")
    assert(!quantNodes.exists(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "q_embed_quant grew a join")
    assert(!quantNodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]),
      "q_embed_quant grew an aggregation")

    // q_mm_features_real reads the persisted media index (round 12): the
    // plan must scan ONLY (asset_id, features) from the index parquet —
    // never documents.text, never the sibling hash columns (a full-index
    // read means column pruning regressed), and never re-decode (no
    // documents scan at all once the index exists)
    val mmCols = nodesOf("q_mm_features_real").collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSeq
    }.flatten.toSet
    assert(mmCols.contains("asset_id") && mmCols.contains("features") &&
        !mmCols.contains("text") && !mmCols.contains("dhash"),
      s"q_mm_features_real scan columns regressed: $mmCols")
  }

  test("round-6 query contracts: plan shapes that must not silently regress") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)

    // q_asof_join: union + keyed window — the whole point is NO join node
    // (the naive formulation would plan a per-key range join)
    val asof = nodesOf("q_asof_join")
    assert(!asof.exists(_.nodeName.toLowerCase.contains("join")),
      s"q_asof_join grew a join: ${asof.map(_.nodeName).distinct}")
    asof.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        assert(w.partitionSpec.nonEmpty, "q_asof_join single-partition window")
      case _ => ()
    }

    // q_range_join: bucketed equi-join — never a nested loop / cartesian
    val rng = nodesOf("q_range_join")
    assert(!rng.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
      n.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      s"q_range_join nested loop: ${rng.map(_.nodeName).distinct}")

    // q_sessionize: keyed window only
    nodesOf("q_sessionize").foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        assert(w.partitionSpec.nonEmpty, "q_sessionize single-partition window")
      case _ => ()
    }

    // q_phash_pairs: the distinct-hash table is materialized (checkpointed)
    // across the banded self-join (decode runs once, not twice)
    assert(nodesOf("q_phash_pairs").exists(_.isInstanceOf[
        org.apache.spark.sql.execution.RDDScanExec]),
      "q_phash_pairs no longer reads the checkpointed distinct-hash table")
  }

  test("round-7 query contracts: the full Hamming pair family keeps its shape") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)

    // every q_*hash_pairs query: (a) reads the materialized distinct-hash
    // table on both sides of the self-join instead of re-running the
    // decode/fingerprint pipeline, (b) meets on a (band, band-value)
    // EQUI-join — never a nested loop over the hash pairs
    // q_interval_join: the time-range predicate must ride INSIDE a keyed
    // equi-join on user — a planner that lost the equi-key would fall back
    // to a nested loop over purchases × clicks
    val ij = nodesOf("q_interval_join")
    assert(!ij.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
      n.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      s"q_interval_join nested loop: ${ij.map(_.nodeName).distinct}")
    assert(ij.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
      n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec] ||
      n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"q_interval_join lost its equi-join: ${ij.map(_.nodeName).distinct}")

    Seq("q_phash_pairs", "q_ahash_pairs", "q_vhash_pairs",
        "q_simhash32_saturation", "q_simhash_pairs")
      .foreach { q =>
        val nodes = nodesOf(q)
        assert(nodes.exists(_.isInstanceOf[
            org.apache.spark.sql.execution.RDDScanExec]),
          s"$q no longer reads the checkpointed distinct-hash table")
        assert(!nodes.exists(n =>
          n.isInstanceOf[
            org.apache.spark.sql.execution.joins.CartesianProductExec] ||
          n.isInstanceOf[
            org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
          s"$q banded join degraded to a nested loop: " +
            nodes.map(_.nodeName).distinct.mkString(","))
        assert(nodes.exists(n =>
          n.isInstanceOf[
            org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
          n.isInstanceOf[
            org.apache.spark.sql.execution.joins.ShuffledHashJoinExec] ||
          n.isInstanceOf[
            org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
          s"$q lost its banded equi-join: " +
            nodes.map(_.nodeName).distinct.mkString(","))
      }
  }

  test("round-7 PromQL/curation contracts: single-shuffle windows, broadcast bounds") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)
    def hashExchanges(nodes: Seq[SparkPlan]): Int = nodes.count {
      case e: ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[HashPartitioning]
      case _ => false
    }
    def hasJoin(nodes: Seq[SparkPlan]): Boolean =
      nodes.exists(_.nodeName.toLowerCase.contains("join"))

    // q_deriv_predict: the keyed aggregate must REUSE the window's hash
    // exchange — one hash shuffle total (the final orderBy is a range
    // exchange, not counted), and no join anywhere
    // (at sf0.001 the single-partition scan satisfies the clustered
    // distribution outright, so 0 exchanges is also a pass — the contract
    // is "never MORE than one")
    val dp = nodesOf("q_deriv_predict")
    assert(hashExchanges(dp) <= 1,
      s"q_deriv_predict hash shuffles > 1: ${dp.map(_.nodeName).distinct}")
    assert(!hasJoin(dp), s"q_deriv_predict grew a join")

    // q_over_time / q_ewma / q_quantile_ot: ONE keyed window pass — a
    // single hash exchange, no join, no aggregate exchange
    Seq("q_over_time", "q_ewma", "q_quantile_ot").foreach { q =>
      val nodes = nodesOf(q)
      assert(hashExchanges(nodes) <= 1,
        s"$q hash shuffles > 1: ${nodes.map(_.nodeName).distinct}")
      assert(!hasJoin(nodes), s"$q grew a join")
    }

    // q_rate_window: two window passes over ONE keyed exchange
    val rwNodes = nodesOf("q_rate_window")
    assert(hashExchanges(rwNodes) <= 1,
      s"q_rate_window hash shuffles > 1: ${rwNodes.map(_.nodeName).distinct}")
    assert(!hasJoin(rwNodes), "q_rate_window grew a join")

    // q_holt_winters: the recurrence fold is ONE repartition exchange —
    // no join, no window, no aggregate beyond the source bucketing
    val hwNodes = nodesOf("q_holt_winters")
    assert(hashExchanges(hwNodes) <= 2, // source 10-min agg + repartition
      s"q_holt_winters hash shuffles > 2: ${hwNodes.map(_.nodeName).distinct}")
    assert(!hasJoin(hwNodes), "q_holt_winters grew a join")

    // q_winsorize: per-group bounds must come back as a BROADCAST hash
    // join — the fact table itself never shuffles for the clip
    val wz = nodesOf("q_winsorize")
    assert(wz.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"q_winsorize lost the broadcast bounds join: " +
        wz.map(_.nodeName).distinct.mkString(","))
    assert(!wz.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "q_winsorize bounds join degraded to sort-merge (fact-table shuffle)")

    // q_label_ops: pure projection — no shuffle other than the final
    // sort's range exchange, no aggregate, no join
    val lo = nodesOf("q_label_ops")
    assert(hashExchanges(lo) == 0 && !hasJoin(lo),
      s"q_label_ops stopped being projection-only: " +
        lo.map(_.nodeName).distinct.mkString(","))

    // q_zscore / q_count_values / q_shard_assign: ONE keyed exchange
    // (window or aggregate), no join
    Seq("q_zscore", "q_count_values", "q_shard_assign").foreach { q =>
      val nodes = nodesOf(q)
      assert(hashExchanges(nodes) <= 1,
        s"$q hash shuffles > 1: ${nodes.map(_.nodeName).distinct}")
      assert(!hasJoin(nodes), s"$q grew a join")
    }

    // q_group_mad: the per-group median table must come back as a
    // BROADCAST join (the sample scan never shuffles for it); the two
    // keyed aggregates are the only hash exchanges
    val gm = nodesOf("q_group_mad")
    assert(gm.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"q_group_mad lost the broadcast median join: " +
        gm.map(_.nodeName).distinct.mkString(","))
    assert(!gm.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "q_group_mad median join degraded to sort-merge")
    assert(hashExchanges(gm) <= 2,
      s"q_group_mad hash shuffles > 2: ${gm.map(_.nodeName).distinct}")
  }

  test("round-7 PQ contracts: map-only coding, no corpus reshuffle in search") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)

    // q_pq_codes: codebooks ride as plan literals, so the coded output is
    // a pure projection over the embeddings scan — zero joins, and the
    // only exchange is the output sort's range partitioning
    val codes = nodesOf("q_pq_codes")
    assert(!codes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]),
      s"q_pq_codes grew a join: ${codes.map(_.nodeName).distinct}")
    val exch = codes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(exch <= 1,
      s"q_pq_codes coding must be map-only (got $exch exchanges): " +
        codes.map(_.nodeName).distinct.mkString(", "))

    // q_pq_topk: the code table meets the query side only via broadcast —
    // a sort-merge or shuffled-hash join here would reshuffle the corpus
    val topk = nodesOf("q_pq_topk")
    assert(!topk.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
      n.isInstanceOf[
        org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      s"q_pq_topk reshuffles the corpus: ${topk.map(_.nodeName).distinct}")
  }

  test("round-7 LM/curation/semdedup contracts: scan-side apply, token-keyed joins only") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)

    // q_quality_logit: frozen-checkpoint apply is a pure projection —
    // no join, no hash exchange (the output sort's range exchange only)
    val ql = nodesOf("q_quality_logit")
    assert(!ql.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]),
      s"q_quality_logit grew a join: ${ql.map(_.nodeName).distinct}")
    assert(ql.count(n => n.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] &&
        n.asInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]
          .outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]) == 0,
      s"q_quality_logit apply must stay scan-side: ${ql.map(_.nodeName).distinct}")

    // q_bigram_ppl: bigram formation is per-row (Generate over the
    // zipped token array) — a positional self-join regression would show
    // up as a third shuffled join. Expect exactly the LM joins: bf ⋈ lm
    // and c12 ⋈ c1 (token-keyed), plus broadcast of the 1-row V.
    val bp = nodesOf("q_bigram_ppl")
    assert(bp.exists(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]),
      "q_bigram_ppl lost the per-row bigram Generate")
    val shuffledJoins = bp.count(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec] ||
      n.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec])
    assert(shuffledJoins <= 2,
      s"q_bigram_ppl grew a positional join ($shuffledJoins shuffled joins): " +
        bp.map(_.nodeName).distinct.mkString(", "))

    // q_semdedup_fixedk: assignment (with its broadcast centroid table) runs
    // inside the eager localCheckpoint — invisible to plan inspection,
    // the documented ivfTopK trade-off — so the visible contract is:
    // every consumer scans the checkpointed assignment (ExistingRDD,
    // never a recompute), the prune is joins (cell-keyed pair join +
    // id-keyed anti), and no window over the corpus
    val sd = nodesOf("q_semdedup_fixedk")
    assert(sd.count(_.isInstanceOf[org.apache.spark.sql.execution.RDDScanExec]) >= 2,
      "q_semdedup_fixedk must scan the checkpointed assignment, " +
        s"got: ${sd.map(_.nodeName).distinct}")
    assert(sd.count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) >= 2,
      s"q_semdedup_fixedk lost the pair/anti join pair: ${sd.map(_.nodeName).distinct}")
    assert(!sd.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_semdedup_fixedk grew a window: ${sd.map(_.nodeName).distinct}")

    // q_ngram_novelty: one shingle-keyed aggregate + join back + doc
    // aggregate — bounded exchanges, and a join must exist (the min-id
    // index is a join, not a window over the corpus)
    val nv = nodesOf("q_ngram_novelty")
    assert(nv.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "q_ngram_novelty lost the first-seen index join")
    assert(!nv.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_ngram_novelty grew a window over the corpus: ${nv.map(_.nodeName).distinct}")

    // q_oov_rate: the k-row vocabulary must come back BROADCAST — a
    // sort-merge join here would shuffle the whole per-doc count table
    // against a 100-row dimension
    val ov = nodesOf("q_oov_rate")
    assert(ov.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"q_oov_rate lost the broadcast vocabulary join: ${ov.map(_.nodeName).distinct}")

    // q_char_entropy: the codegen-kernel path is a pure scan — no join,
    // no hash exchange, and the kernel expression inside the projection
    val ce = nodesOf("q_char_entropy")
    assert(!ce.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]),
      s"q_char_entropy grew a join: ${ce.map(_.nodeName).distinct}")
    assert(!ce.exists(n => n.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] &&
        n.asInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]
          .outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]),
      s"q_char_entropy fell back off the zero-shuffle kernel: ${ce.map(_.nodeName).distinct}")

    // q_dedup_incremental: the base-corpus filter must be an ANTI join
    // (an inner+distinct or except formulation would widen and reshuffle)
    val di = nodesOf("q_dedup_incremental")
    assert(di.exists(n => n.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec] &&
        n.asInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]
          .joinType.toString.toLowerCase.contains("anti")),
      s"q_dedup_incremental lost the anti-join base filter: ${di.map(_.nodeName).distinct}")
  }

  test("q_join_skewed contract: salted sort-merge join, dim never broadcast") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      SortMergeJoinExec, ShuffledHashJoinExec}
    val nodes = allNodes(
      Queries.queries("q_join_skewed")(spark, dir).queryExecution.executedPlan)
    // the salt must be a join key (that IS the mitigation: the hot key's
    // rows hash-split across saltFactor sub-keys before the merge join)
    val shuffleJoins = nodes.collect {
      case s: SortMergeJoinExec => s.leftKeys.map(_.toString)
      case s: ShuffledHashJoinExec => s.leftKeys.map(_.toString)
    }
    assert(shuffleJoins.nonEmpty,
      s"q_join_skewed lost its shuffle join: ${nodes.map(_.nodeName).distinct}")
    assert(shuffleJoins.exists(_.exists(_.contains("_salt"))),
      s"salt left the join keys: $shuffleJoins")
    assert(!nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "dim side got broadcast — the skewed-shuffle demo is vacuous")
  }

  test("q_semdedup (auto-k, primary since round 9) contract: checkpointed assignment, cell-keyed prune, no window") {
    // Assignment (auto-bits LSH projection — map-only, no centroid
    // broadcast at all) runs inside the eager localCheckpoint, so the
    // visible contract mirrors q_semdedup_fixedk's: every consumer scans the
    // checkpointed assignment (never recomputes the plane projections),
    // the prune stays a join pair (cell-keyed pair join + id-keyed
    // anti-join), and no window over the corpus.
    val sa = allNodes(
      Queries.queries("q_semdedup")(spark, dir).queryExecution.executedPlan)
    assert(sa.count(_.isInstanceOf[org.apache.spark.sql.execution.RDDScanExec]) >= 2,
      "q_semdedup (auto-k) must scan the checkpointed assignment, " +
        s"got: ${sa.map(_.nodeName).distinct}")
    assert(sa.count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) >= 2,
      s"q_semdedup (auto-k) lost the pair/anti join pair: ${sa.map(_.nodeName).distinct}")
    assert(!sa.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_semdedup (auto-k) grew a window: ${sa.map(_.nodeName).distinct}")
  }

  test("round-8 incremental/coverage/PR contracts: cell-keyed prunes, TakeOrdered heads, scan-side sweep") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)

    // q_semdedup_incremental: three joins (vs-base prune, within-batch
    // prune, survivor anti) + the base-dedup pair/anti behind the
    // checkpoint; all cell- or id-keyed, no window, no cartesian
    // (registry-wide test covers cartesian — assert the join family and
    // the checkpointed batch scan here)
    val si = nodesOf("q_semdedup_incremental")
    assert(si.count(_.isInstanceOf[org.apache.spark.sql.execution.RDDScanExec]) >= 2,
      s"q_semdedup_incremental must scan the checkpointed batch: ${si.map(_.nodeName).distinct}")
    assert(si.count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) >= 3,
      s"q_semdedup_incremental lost a prune join: ${si.map(_.nodeName).distinct}")
    assert(!si.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_semdedup_incremental grew a window: ${si.map(_.nodeName).distinct}")

    // q_vocab_coverage: each head mass is a TakeOrdered over the
    // distinct-piece table — a global Sort over the vocabulary would be
    // the regression this pins against
    val vc = nodesOf("q_vocab_coverage")
    assert(vc.exists(_.nodeName.contains("TakeOrdered")),
      s"q_vocab_coverage lost its TakeOrdered heads: ${vc.map(_.nodeName).distinct}")
    // the only global sort allowed is the k-row OUTPUT ordering (it sits
    // above the 3-row Union); a global sort over the vocabulary would
    // appear below it, without a Union in its subtree
    val badSorts = vc.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global &&
        !allNodes(s).exists(_.isInstanceOf[org.apache.spark.sql.execution.UnionExec]) => s
    }
    assert(badSorts.isEmpty,
      s"q_vocab_coverage grew a global sort over the vocabulary: ${vc.map(_.nodeName).distinct}")

    // q_quality_pr: one broadcast of the 5-row threshold frame; the
    // score+truth join is doc-keyed; no corpus window
    val pr = nodesOf("q_quality_pr")
    assert(pr.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]) ||
      pr.exists(_.nodeName.contains("Broadcast")),
      s"q_quality_pr lost the broadcast threshold fan-out: ${pr.map(_.nodeName).distinct}")
    assert(!pr.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_quality_pr grew a window: ${pr.map(_.nodeName).distinct}")
  }

  test("round-8b segment-dedup/PCA contracts: fingerprint-keyed joins, no corpus window, broadcast rerank") {
    import org.apache.spark.sql.execution.SparkPlan
    def nodesOf(q: String): Seq[SparkPlan] =
      allNodes(Queries.queries(q)(spark, dir).queryExecution.executedPlan)

    // q_segment_dedup: the rewrite is aggregate-shaped — a hot-table join
    // (fingerprint-keyed, AQE decides broadcast) plus the doc-keyed
    // reassembly aggregate; a window over the segment table (a ranked
    // rewrite) would be the scale regression this pins against
    val sd = nodesOf("q_segment_dedup")
    assert(sd.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]),
      s"q_segment_dedup lost the hot-segment join: ${sd.map(_.nodeName).distinct}")
    assert(!sd.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_segment_dedup grew a window: ${sd.map(_.nodeName).distinct}")

    // incremental twin: one more join (the frozen base df table)
    val sdi = nodesOf("q_segment_dedup_incremental")
    assert(sdi.count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) >= 2,
      s"q_segment_dedup_incremental lost the base-table join: ${sdi.map(_.nodeName).distinct}")
    assert(!sdi.exists(_.nodeName.toLowerCase.contains("window")),
      s"q_segment_dedup_incremental grew a window: ${sdi.map(_.nodeName).distinct}")

    // q_ann_pca: both scans are broadcast fan-outs of the tiny query set
    // (BNLJ, the q_ann_brute family shape) — the corpus itself must never
    // be the build side of anything, and the only windows are qid-keyed
    // (registry-wide single-partition guard covers degenerate windows)
    val ap = nodesOf("q_ann_pca")
    assert(ap.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      s"q_ann_pca lost the broadcast query fan-out: ${ap.map(_.nodeName).distinct}")

    // q_neardup_clusters_dist (round 10): the oracle-certified scale path
    // must actually BE the distributed propagation — its result scans the
    // pointer-jumping loop's localCheckpoint (RDDScanExec); a driver-built
    // union-find result would surface as a LocalTableScan instead
    val ncd = nodesOf("q_neardup_clusters_dist")
    assert(ncd.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.RDDScanExec]),
      "q_neardup_clusters_dist must scan the distributed propagation's " +
        s"localCheckpoint: ${ncd.map(_.nodeName).distinct}")
    assert(!ncd.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.LocalTableScanExec]),
      "q_neardup_clusters_dist fell back to a driver-materialized cluster " +
        s"table: ${ncd.map(_.nodeName).distinct}")
  }

  test("hot scan-shaped queries run inside WholeStageCodegen") {
    // codegen stages (`*(n)` markers) only appear once AQE finalizes the
    // plan, so run the query (cheap at sf0.001) and inspect the final plan
    Seq("q1_agg", "q_threshold_p8", "q_text_stats", "q6_forecast_revenue")
      .foreach { q =>
        val df = Queries.queries(q)(spark, dir)
        df.collect() // count() would execute a DERIVED plan, not df's own
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("*("), s"$q fell out of whole-stage codegen:\n$plan")
      }
  }
}
