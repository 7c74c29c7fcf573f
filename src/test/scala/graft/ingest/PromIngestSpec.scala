package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixtures per FIXTURES.md §1 (shape from data_collector.py:57-77). */
class PromIngestSpec extends SparkSpec {
  import spark.implicits._

  private val single =
    """{"status":"success","data":{"resultType":"matrix","result":[
      |{"metric":{"__name__":"m1","job":"j"},
      | "values":[[1747994400,"1234"],[1747994520,"1250.5"],[1747994640,"not_a_number"]]}]}}"""
      .stripMargin.replace("\n", "")

  private val multi =
    """{"status":"success","data":{"resultType":"matrix","result":[
      |{"metric":{"s":"first"},"values":[[100,"1"]]},
      |{"metric":{"s":"second"},"values":[[100,"2"]]}]}}"""
      .stripMargin.replace("\n", "")

  private val empty = """{"status":"success","data":{"resultType":"matrix","result":[]}}"""
  private val error = """{"status":"error","errorType":"bad_data","error":"parse error"}"""

  private def decode(bodies: (String, String)*) =
    PromIngest.decodeResponses(bodies.toSeq.toDF("alias", "body"), "body", "alias")

  test("S2: values decode to (ts, value) rows; invalid numeric -> null") {
    val rows = decode("q1" -> single).orderBy("ts").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Double]("value") == 1234.0)
    assert(rows(1).getAs[Double]("value") == 1250.5)
    assert(rows(2).isNullAt(rows(2).fieldIndex("value"))) // coerce-to-null
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toInstant.getEpochSecond == 1747994400L)
  }

  test("S2: multi-series keeps only the FIRST series (data_collector.py:71-75)") {
    val rows = decode("q1" -> multi).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Map[String, String]]("labels") == Map("s" -> "first"))
    assert(rows.head.getAs[Double]("value") == 1.0)
  }

  test("S2: empty result and error responses yield no rows") {
    assert(decode("q1" -> empty, "q2" -> error).count() == 0)
  }

  test("P4: weekday is Monday=0 (pandas convention), not Spark dayofweek") {
    // 2024-01-01 is a Monday
    val df = Seq("2024-01-01 10:30:00", "2024-01-07 23:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val c = PromIngest.withCalendar(df, "ts").orderBy("ts").collect()
    assert(c(0).getAs[Int]("day_of_week") == 0) // Monday
    assert(c(1).getAs[Int]("day_of_week") == 6) // Sunday
    assert(c(0).getAs[Int]("hour_of_day") == 10)
  }

  test("chunkGrid splits [start,end) per query into hour cells (S1)") {
    val g = PromIngest.chunkGrid(Seq("a" -> "qa", "b" -> "qb"),
      0L, 7200L, 120L, chunkHours = 1)
    assert(g.size == 4) // 2 queries x 2 hours
    assert(g.head == PromIngest.Chunk("a", "qa", 0L, 3600L, 120L))
    assert(g(1) == PromIngest.Chunk("a", "qa", 3600L, 7200L, 120L))
  }

  test("fetchChunks: fetches via injected fn, caches, re-run hits cache only (S3)") {
    val dir = java.nio.file.Files.createTempDirectory("promcache").toString + "/cache"
    // the fetch lambda is shipped to executors: capture only local,
    // serializable state (a spec-class field would drag `this` along)
    val body = single
    var calls = 0
    val fetch: String => String = { _ => calls += 1; body }
    val chunks = PromIngest.chunkGrid(Seq("q1" -> "up"), 0L, 3600L, 120L)
    val r1 = PromIngest.fetchChunks(spark, "http://example", chunks,
      Some(dir), fetch)
    assert(r1.count() == 3)
    val callsAfterFirst = calls
    assert(callsAfterFirst >= 1)
    val r2 = PromIngest.fetchChunks(spark, "http://example", chunks,
      Some(dir), fetch)
    assert(r2.count() == 3)
    assert(calls == callsAfterFirst) // second run: pure cache read
  }

  test("assembleWide: dedup + pivot + totalize + sort + calendar end-to-end") {
    val long = Seq(
      ("m1", 1000L, 1.0, 1L), ("m1", 1000L, 9.0, 2L), // dup ts: keep arrival 1
      ("m2", 1000L, 2.0, 3L), ("m1", 61000L, 3.0, 4L))
      .toDF("alias", "epoch_ms", "value", "arrival")
      .select(col("alias"), timestamp_millis(col("epoch_ms")).as("ts"),
        col("value"), col("arrival"))
    val wide = PromIngest.assembleWide(long, Seq("m1", "m2", "m3"), "arrival")
    val rows = wide.orderBy("ts").collect()
    assert(wide.columns.toSeq ==
      Seq("ts", "m1", "m2", "m3", "day_of_week", "hour_of_day"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("m1") == 1.0) // keep-first
    assert(rows(0).isNullAt(3) && rows(1).isNullAt(3)) // m3 totalized null
  }
}
