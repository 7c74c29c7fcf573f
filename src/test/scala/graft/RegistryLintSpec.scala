package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene fences — the conventions every query must keep for
  * the driver's DuckDB compare to stay meaningful (compare sorts columns
  * by name and hashes rows in order, so a missing ORDER BY or a stray
  * oracle key silently weakens the round's correctness gate). */
class RegistryLintSpec extends AnyFunSuite {

  /** The documented rows-only queries: xxhash64 bucket bases DuckDB can't
    * reproduce; each has an oracle-green md5-basis twin in the registry. */
  private val rowsOnly = Set(
    "q_ann_lsh", "q_cosine_neardup", "q_minhash_lsh", "q_simhash")

  test("every oracle key names a registered query") {
    val stray = Queries.oracleSql.keySet -- Queries.queries.keySet
    assert(stray.isEmpty, s"oracle entries without a query: $stray")
  }

  test("every query is oracle-checked except the documented rows-only set") {
    val missing = Queries.queries.keySet -- Queries.oracleSql.keySet
    assert(missing == rowsOnly,
      s"oracle coverage drifted: missing=$missing expected=$rowsOnly")
    // and each rows-only query's md5 twin IS oracle-checked
    rowsOnly.foreach { q =>
      val twin = q + "_md5"
      assert(Queries.oracleSql.contains(twin),
        s"$q lost its oracle-green twin $twin")
    }
  }

  /** Single-row global aggregates: row order is vacuous by construction
    * (the driver's hash sees exactly one row either way). */
  private val singleRow =
    Set("q_nan_report_a5", "q_sketch_bounds", "q6_forecast_revenue",
      "q_hist_stats", "q_bloom_bounds")

  test("every oracle ends in a deterministic ORDER BY (single-row aggregates exempt)") {
    val unordered = Queries.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") &&
        !singleRow.contains(name) => name
    }
    assert(unordered.isEmpty, s"oracles without ORDER BY: $unordered")
  }
}
