package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Prometheus `query_range` ingest: JSON decode (S2), chunked fetch with a
  * parquet chunk cache (S1/S3), and wide-table assembly (J1+U1+U2+W3+W4+P4).
  *
  * Reference behavior being reproduced (not ported):
  *  - JSON shape + coerce-to-null parse: `/root/reference/data_collector.py:57-77`
  *  - keep only the FIRST series of a multi-series result:
  *    `/root/reference/data_collector.py:71-75`
  *  - 1-hour chunked fetch memoized by (url, query, start, end, step):
  *    `/root/reference/data_collector.py:34-39,85-111,142-149`
  *  - dedup-keep-first + sort + calendar cols:
  *    `/root/reference/data_collector.py:120-127,222-227`
  *
  * Spark-first: the decode is `from_json` + `explode` (codegen'd, no UDF);
  * the cache is a partitioned parquet directory — existence probe = manual
  * partition pruning, and once written, re-runs read only missing chunks.
  * Fetches parallelize across (query × chunk) as a Dataset flatMap so a
  * 1000-executor cluster pulls chunks concurrently (driver-side loop only
  * assembles paths).
  */
object PromIngest {

  /** FIXTURES.md §1 / SURVEY S2 parse schema. */
  val responseSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("errorType", StringType),
    StructField("error", StringType),
    StructField("data", StructType(Seq(
      StructField("resultType", StringType),
      StructField("result", ArrayType(StructType(Seq(
        StructField("metric", MapType(StringType, StringType)),
        StructField("values", ArrayType(ArrayType(StringType)))
      ))))
    )))
  ))

  /** S2: decode a column of raw query_range JSON bodies into long rows
    * (`alias`, `labels`, `ts`, `value`). Per reference: only the first
    * series per response is kept; epoch strings → timestamp; non-numeric
    * values → null (pandas `errors='coerce'`); error responses yield no rows.
    * Labels are kept as a map (richer than the reference, which drops them). */
  def decodeResponses(df: DataFrame, jsonCol: String, aliasCol: String,
                      passthrough: Seq[String] = Nil): DataFrame = {
    val parsed = df.withColumn("_r", from_json(col(jsonCol), responseSchema))
    parsed
      .filter(col("_r.status") === "success" && size(col("_r.data.result")) > 0)
      .withColumn("_series", element_at(col("_r.data.result"), 1)) // first series only
      .withColumn("_pair", explode(col("_series.values")))
      .select(
        col(aliasCol).as("alias") +:
        col("_series.metric").as("labels") +:
        // try_cast: invalid numeric → null, matching pandas
        // to_numeric(errors='coerce') — ANSI-mode cast would throw instead.
        timestamp_seconds(element_at(col("_pair"), 1).try_cast("double")).as("ts") +:
        element_at(col("_pair"), 2).try_cast("double").as("value") +:
        passthrough.map(col): _*)
  }

  /** P4: pandas-convention calendar projection — `weekday()` is Monday=0
    * like pandas `dayofweek`; Spark's `dayofweek()` (Sunday=1) is the trap.
    * (`data_collector.py:226-227`). */
  def withCalendar(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("day_of_week", weekday(col(tsCol)))
      .withColumn("hour_of_day", hour(col(tsCol)))

  /** One fetchable unit: a (query alias, chunk) cell of the fetch grid. */
  final case class Chunk(alias: String, query: String,
                         startSec: Long, endSec: Long, stepSec: Long)

  /** S1 driver helper: split [start, end) into `chunkHours` cells per query
    * (`data_collector.py:93-111`). */
  def chunkGrid(queries: Seq[(String, String)], startSec: Long, endSec: Long,
                stepSec: Long, chunkHours: Int = 1): Seq[Chunk] = {
    val span = chunkHours * 3600L
    for {
      (alias, q) <- queries
      s <- startSec until endSec by span
    } yield Chunk(alias, q, s, math.min(s + span, endSec), stepSec)
  }

  /** Build the query_range URL for a chunk (public Prometheus HTTP API). */
  def chunkUrl(base: String, c: Chunk): String = {
    val q = java.net.URLEncoder.encode(c.query, "UTF-8")
    s"$base/api/v1/query_range?query=$q&start=${c.startSec}&end=${c.endSec}&step=${c.stepSec}"
  }

  /** Default fetcher over `java.net.http` (pluggable so tests inject fixtures). */
  def httpFetch(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** S1+S3: fetch all chunks (distributed: executors run `fetch` in
    * parallel across the grid), decode, and memoize per-chunk results in a
    * parquet cache partitioned by (alias, chunk_start). On re-runs, cached
    * (alias, chunk) cells are read back instead of fetched — the same
    * manual partition pruning the reference's diskcache does. */
  def fetchChunks(spark: SparkSession, base: String, chunks: Seq[Chunk],
                  cacheDir: Option[String] = None,
                  fetch: String => String = httpFetch): DataFrame = {
    import spark.implicits._
    val cached: Option[DataFrame] = cacheDir.filter { d =>
      new java.io.File(d).exists()
    }.flatMap(d => scala.util.Try(spark.read.parquet(d)
      // partition-dir columns are type-inferred on read (int for small
      // epochs) — normalize back to long before compare/union
      .withColumn("chunk_start", col("chunk_start").cast("long"))).toOption)
      // (a cache dir holding only _SUCCESS — e.g. a first run whose fetches
      // all decoded to zero rows — fails schema inference; treat as absent
      // instead of permanently breaking the collect stage)
    val have: Set[(String, Long)] = cached match {
      case Some(c) => c.select("alias", "chunk_start").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      case None => Set.empty
    }
    val missing = chunks.filterNot(c => have.contains((c.alias, c.startSec)))

    def decodeMissing(): DataFrame = {
      val urls = missing.map(c => (c.alias, c.startSec, chunkUrl(base, c)))
      val raw = spark.createDataset(urls)
        .toDF("alias", "chunk_start", "url")
        .repartition(math.min(missing.size, 64))
        .withColumn("body", udf(fetch).apply(col("url")))
      decodeResponses(raw, "body", "alias", Seq("chunk_start"))
    }

    def emptyDecoded: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], decodedSchema)

    cacheDir match {
      case Some(d) =>
        // Write-then-read-back: the cache write is the ONE action that runs
        // the HTTP fetch; everything downstream reads the parquet just
        // written, so (a) no chunk is fetched twice, (b) the returned data
        // is byte-identical to the cache (a re-fetch near now() would
        // differ), and (c) no persisted RDD leaks out of this call.
        if (missing.nonEmpty)
          decodeMissing().write.mode("append")
            .partitionBy("alias", "chunk_start").parquet(d)
        // Try: the dir may be unreadable — nonexistent (zero chunks ever
        // fetched) or _SUCCESS-only (every fetch decoded to zero rows, e.g.
        // empty result arrays) — which fails parquet schema inference.
        scala.util.Try(spark.read.parquet(d)
            .withColumn("chunk_start", col("chunk_start").cast("long")))
          .map { all =>
            // only the REQUESTED chunks (the dir may hold other ranges)
            val wanted = spark
              .createDataset(chunks.map(c => (c.alias, c.startSec)))
              .toDF("alias", "chunk_start")
            all.join(broadcast(wanted), Seq("alias", "chunk_start"), "left_semi")
          }
          .getOrElse(emptyDecoded)
      case None =>
        // No cache: single-lineage result; callers that consume it more
        // than once persist it themselves (Detector.runCycle does).
        if (missing.nonEmpty) decodeMissing() else emptyDecoded
    }
  }

  /** Output schema of [[decodeResponses]] with the `chunk_start`
    * passthrough — the single source of truth for empty frames. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("alias", StringType),
    StructField("labels", MapType(StringType, StringType)),
    StructField("ts", TimestampType),
    StructField("value", DoubleType),
    StructField("chunk_start", LongType)))

  /** Full assembly: long rows → dedup-keep-first per (alias, ts) → pivot to
    * wide → totalize missing aliases → sort → calendar cols.
    * (`data_collector.py:118-127,222-227`.) One shuffle for the pivot, one
    * for the dedup window, one global sort — each on uniformly-distributed
    * timestamp keys, skew-free at scale. */
  def assembleWide(long: DataFrame, aliases: Seq[String],
                   tiebreakCol: String): DataFrame = {
    val deduped = graft.operators.Windows.dedupKeepFirst(
      long, Seq("alias", "ts"), Seq(tiebreakCol))
    val wide = graft.operators.Align.pivotAlignOuter(
      deduped, "ts", "alias", "value", aliases, tiebreakCol)
    val total = graft.operators.Align.totalize(wide, aliases)
    withCalendar(total.orderBy("ts"), "ts")
  }
}
