package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene fences — the conventions every query must keep for
  * the driver's DuckDB compare to stay meaningful (compare sorts columns
  * by name and hashes rows in order, so a missing ORDER BY or a stray
  * oracle key silently weakens the round's correctness gate). */
class RegistryLintSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val stray = Queries.oracleSql.keySet -- Queries.queries.keySet
    assert(stray.isEmpty, s"oracle entries without a query: $stray")
  }

  test("every registry query is oracle-checked — zero rows-only entries") {
    // The xxhash64-basis production variants live in ProductionTwinSpec,
    // not the registry: a registry row the driver can only count is a
    // permanently-yellow row, and the invariant here is total greenness.
    val missing = Queries.queries.keySet -- Queries.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }

  test("the md5 twins certifying the production hash paths stay registered") {
    Seq("q_ann_lsh_md5", "q_cosine_neardup_md5", "q_minhash_lsh_md5",
        "q_simhash_md5").foreach { twin =>
      assert(Queries.oracleSql.contains(twin),
        s"production-path certification twin $twin left the registry")
    }
  }

  /** Single-row global aggregates: row order is vacuous by construction
    * (the driver's hash sees exactly one row either way). */
  private val singleRow =
    Set("q_nan_report_a5", "q_sketch_bounds", "q6_forecast_revenue",
      "q_hist_stats", "q_bloom_bounds", "q_pca_cert", "q_ann_pca")

  test("every oracle ends in a deterministic ORDER BY (single-row aggregates exempt)") {
    val unordered = Queries.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") &&
        !singleRow.contains(name) => name
    }
    assert(unordered.isEmpty, s"oracles without ORDER BY: $unordered")
  }
}
