package graft

/** The driver's DuckDB compare hashes rows IN ORDER, so any
  * run-to-run nondeterminism in a query's output (an under-specified
  * ORDER BY, a tie broken by partition layout, an uncommitted random
  * source) would flake the round's correctness gate. This sweep executes
  * every registry query twice and requires byte-identical output
  * (toJSON: schema-ordered fields, base64 binary, stable array
  * rendering — Row.equals would miss raw byte arrays). */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registry query is row-for-row deterministic across executions") {
    Queries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val a = fn(spark, dir).toJSON.collect().toSeq
      val b = fn(spark, dir).toJSON.collect().toSeq
      assert(a == b, s"$name output differs between two executions")
    }
  }
}
