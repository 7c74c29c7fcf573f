package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canned fetcher (reflection-instantiated on executors); counts fetched
  * URLs in a static set so tests can assert pushdown pruned the grid. */
class CannedFetcher extends Fetcher {
  override def fetch(url: String): String = {
    CannedFetcher.record(url)
    def param(k: String) =
      url.split("[?&]").find(_.startsWith(k + "=")).get.drop(k.length + 1)
    val start = param("start").toLong
    val end = param("end").toLong
    val step = param("step").toLong
    val values = (start until end by step)
      .map(t => s"""[$t,"${if ((t / step) % 5 == 0) "bad" else (t % 100).toString}"]""")
      .mkString(",")
    s"""{"status":"success","data":{"resultType":"matrix","result":[""" +
      s"""{"metric":{"job":"test"},"values":[$values]}]}}"""
  }
}

object CannedFetcher {
  private val urls = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def record(u: String): Unit = urls.add(u)
  def reset(): Unit = urls.clear()
  def count: Int = urls.size()
}

/** CannedFetcher that throws on the first `FlakyCannedFetcher.flaps` calls
  * per URL — the DSv2 twin of the PromFlakyFixture flaky endpoint. */
class FlakyCannedFetcher extends Fetcher {
  private val inner = new CannedFetcher
  override def fetch(url: String): String = {
    val n = FlakyCannedFetcher.calls.merge(url, 1, (a, b) => a + b)
    if (n <= FlakyCannedFetcher.flaps)
      throw new java.io.IOException(s"flap $n: $url")
    inner.fetch(url)
  }
}

object FlakyCannedFetcher {
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile var flaps = 2
  def reset(f: Int): Unit = { calls.clear(); flaps = f }
}

class PrometheusDataSourceSpec extends SparkSpec {

  private def reader = spark.read
    .format("graft.sources.PrometheusDataSource")
    .option("url", "http://prom.test")
    .option("queries", "cpu=rate(cpu[1m]);mem=mem_free")
    .option("start", "0").option("end", (4 * 3600).toString)
    .option("step", "120").option("chunkHours", "1")
    .option("fetcher", classOf[CannedFetcher].getName)

  test("DSv2 scan: schema, chunk-parallel fetch, coerce-to-null decode") {
    CannedFetcher.reset()
    val df = reader.load()
    assert(df.schema.fieldNames.toSeq == Seq("alias", "ts", "value", "labels"))
    val n = df.count()
    // 2 queries x 4 one-hour chunks fetched, 30 points each
    assert(CannedFetcher.count == 8)
    assert(n == 2 * 4 * 30)
    val bad = df.filter(col("value").isNull).count()
    assert(bad == 2 * 4 * 6) // every 5th point is "bad" -> null
    assert(df.select("labels").head().getMap[String, String](0)("job") == "test")
  }

  test("DSv2 reader retries flaky fetches per the retryAttempts option (S1 resilience)") {
    // every chunk URL flaps twice then serves; 3 attempts absorb it so the
    // scan completes with the exact same row count as the healthy fetcher
    FlakyCannedFetcher.reset(f = 2)
    val df = spark.read
      .format("graft.sources.PrometheusDataSource")
      .option("url", "http://prom.test")
      .option("queries", "cpu=rate(cpu[1m])")
      .option("start", "0").option("end", (2 * 3600).toString)
      .option("step", "120").option("chunkHours", "1")
      .option("fetcher", classOf[FlakyCannedFetcher].getName)
      .option("retryAttempts", "3").option("retryBaseMs", "1")
      .option("retryMaxMs", "2")
      .load()
    assert(df.count() == 2 * 30) // 2 chunks x 30 points — no data lost
    // and with retries exhausted below the flap count, the scan fails —
    // f = 4 outlasts BOTH in-reader retries of BOTH task attempts (the
    // test session runs maxFailures = 2)
    FlakyCannedFetcher.reset(f = 4)
    val dead = spark.read
      .format("graft.sources.PrometheusDataSource")
      .option("url", "http://prom.test")
      .option("queries", "cpu=rate(cpu[1m])")
      .option("start", "0").option("end", "3600")
      .option("step", "120").option("chunkHours", "1")
      .option("fetcher", classOf[FlakyCannedFetcher].getName)
      .option("retryAttempts", "2").option("retryBaseMs", "1")
      .option("retryMaxMs", "2")
      .load()
    val e = intercept[Exception](dead.count())
    assert(PromIngestCauseChain.hasIoException(e), e.toString)
  }

  test("ts range filters push into the fetch grid (fewer HTTP calls)") {
    CannedFetcher.reset()
    val df = reader.load()
      .filter(col("ts") >= to_timestamp(lit("1970-01-01 01:00:00")) &&
        col("ts") < to_timestamp(lit("1970-01-01 02:00:00")))
    val n = df.count()
    // only the second hour chunk per query is fetched: 2 calls, not 8
    assert(CannedFetcher.count == 2, s"fetched ${CannedFetcher.count} chunks")
    assert(n == 2 * 30)
    // and the plan advertises the pushed range
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PrometheusScan"), scan)
  }

  test("micro-batch admission control: maxSecondsPerBatch caps catch-up; open range tails the clock") {
    val props = Map("url" -> "http://prom.test", "queries" -> "cpu=q",
      "step" -> "120", "maxSecondsPerBatch" -> "3600")
    val s = new PromMicroBatchStream(props, 0L, 7200L)
    def adv(st: PromMicroBatchStream, from: Long): Long =
      st.latestOffset(PromOffset(from), st.getDefaultReadLimit)
        .asInstanceOf[PromOffset].sec
    // 2 h backlog with a 1 h cap: two bounded batches, not one
    assert(adv(s, 0L) == 3600L)
    assert(adv(s, 3600L) == 7200L)
    // no cap: the whole bounded range in one batch
    val uncapped = new PromMicroBatchStream(props - "maxSecondsPerBatch", 0L, 7200L)
    assert(adv(uncapped, 0L) == 7200L)
    // open range (no end): latest clamps to the step-aligned clock, not 0
    val open = new PromMicroBatchStream(props - "maxSecondsPerBatch", 0L, 0L)
    assert(adv(open, 0L) > 1700000000L)
  }

  test("empty effective range plans zero partitions") {
    CannedFetcher.reset()
    val df = reader.load()
      .filter(col("ts") >= to_timestamp(lit("2030-01-01 00:00:00")))
    assert(df.count() == 0)
    assert(CannedFetcher.count == 0)
  }
}

/** Cause-chain helper: Spark wraps task failures in SparkException layers. */
object PromIngestCauseChain {
  def hasIoException(e: Throwable): Boolean = {
    var cur = e
    while (cur != null) {
      if (cur.isInstanceOf[java.io.IOException]) return true
      cur = if (cur.getCause eq cur) null else cur.getCause
    }
    false
  }
}
