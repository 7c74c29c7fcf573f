package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a first-class DataSource V2 `TableProvider`: a Prometheus
  * `query_range` table with **time-range predicate pushdown** — filters on
  * `ts` shrink (and clip) the (query × chunk) fetch grid before any HTTP
  * call happens, which is the manual "fetch only the needed range" trick of
  * the reference (`data_collector.py:42`) expressed as a Catalyst-visible
  * `SupportsPushDownFilters`.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PrometheusDataSource")
  *   .option("url", "http://prom:9090")
  *   .option("queries", "cpu=rate(cpu_total[1m]);mem=mem_free_bytes")
  *   .option("start", "1704067200").option("end", "1704153600")
  *   .option("step", "120").option("chunkHours", "1")
  *   .load()
  *   .filter($"ts" >= lit(...) && $"ts" < lit(...))  // pushed into fetch grid
  * }}}
  *
  * Each (alias, chunk) cell is one `InputPartition`, so a 1000-executor
  * cluster fetches chunks concurrently; decode happens in the partition
  * reader (Jackson, executor-side), not on the driver. The fetcher is
  * pluggable via the `fetcher` option (class name implementing [[Fetcher]])
  * so tests inject fixtures.
  */
class PrometheusDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PrometheusDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PromTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object PrometheusDataSource {
  val schema: StructType = StructType(Seq(
    StructField("alias", StringType, nullable = false),
    StructField("ts", TimestampType),
    StructField("value", DoubleType),
    StructField("labels", MapType(StringType, StringType))))
}

/** Pluggable HTTP boundary (reflection-instantiated on executors). */
trait Fetcher extends Serializable {
  def fetch(url: String): String
}

final class HttpFetcher extends Fetcher {
  override def fetch(url: String): String = graft.ingest.PromIngest.httpFetch(url)
}

private[sources] class PromTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"prometheus(${props.getOrElse("url", "?")})"
  override def schema(): StructType = PrometheusDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PromScanBuilder(props ++ options.asScala)
}

private[sources] class PromScanBuilder(props: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var tsLowerSec: Long = props.getOrElse("start", "0").toLong
  private var tsUpperSec: Long = props.getOrElse("end", "0").toLong
  private var pushed: Array[Filter] = Array.empty

  /** (floor epoch-sec, has-subsecond-part). */
  private def toEpochSec(v: Any): Option[(Long, Boolean)] = v match {
    case t: java.sql.Timestamp =>
      Some((Math.floorDiv(t.getTime, 1000L), Math.floorMod(t.getTime, 1000L) != 0))
    case i: java.time.Instant =>
      Some((i.getEpochSecond, i.getNano != 0))
    case _ => None
  }

  /** Accept ts range filters to clip the fetch grid, but return ALL filters
    * for Spark to re-evaluate post-scan (advisory pushdown): the grid
    * bounds are coarse — epoch-second granularity and Prometheus's
    * inclusive range ends — so the source alone cannot guarantee exact
    * predicate semantics. Spark applying the residual filter makes the
    * result exact while the pushdown still prunes the HTTP calls. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case GreaterThan("ts", v) => toEpochSec(v).exists { case (s, sub) =>
        tsLowerSec = math.max(tsLowerSec, if (sub) s else s + 1); true }
      case GreaterThanOrEqual("ts", v) => toEpochSec(v).exists { case (s, _) =>
        tsLowerSec = math.max(tsLowerSec, s); true }
      case LessThan("ts", v) => toEpochSec(v).exists { case (s, sub) =>
        tsUpperSec = math.min(tsUpperSec, if (sub) s + 1 else s); true }
      case LessThanOrEqual("ts", v) => toEpochSec(v).exists { case (s, _) =>
        tsUpperSec = math.min(tsUpperSec, s + 1); true }
      case _ => false
    }
    pushed = accepted
    filters // residual = everything: Spark enforces exact bounds post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PromScan(props, tsLowerSec, tsUpperSec)
}

private[sources] case class PromChunkPartition(alias: String, url: String)
    extends InputPartition

private[sources] class PromScan(props: Map[String, String],
                                startSec: Long, endSec: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = PrometheusDataSource.schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PromMicroBatchStream(props, startSec, endSec)
  override def description(): String =
    s"PrometheusScan(range=[$startSec,$endSec), pushed ts bounds applied)"

  override def planInputPartitions(): Array[InputPartition] =
    PromScan.planRange(props, startSec, endSec)

  override def createReaderFactory(): PartitionReaderFactory =
    PromReaderFactory.fromProps(props)
}

private[sources] object PromScan {
  /** The (alias × chunk) fetch grid for [startSec, endSec) — shared by the
    * batch scan and each streaming micro-batch. */
  def planRange(props: Map[String, String], startSec: Long,
                endSec: Long): Array[InputPartition] = {
    val base = props.getOrElse("url", "http://localhost:9090")
    val step = props.getOrElse("step", "120").toLong
    val chunkHours = props.getOrElse("chunkHours", "1").toInt
    val queries = props.getOrElse("queries", "").split(";").toSeq
      .filter(_.contains("=")).map { q =>
        val Array(a, p) = q.split("=", 2); (a, p)
      }
    if (endSec <= startSec) Array.empty
    else graft.ingest.PromIngest
      .chunkGrid(queries, startSec, endSec, step, chunkHours)
      // Prometheus query_range is INCLUSIVE of its end instant, so adjacent
      // chunks sharing a boundary would both return the boundary sample;
      // fetch each chunk as [start, end−1] to keep cells disjoint
      // (integer-second steps; the overall range end stays exclusive, as
      // the residual ts filter enforces exact bounds anyway).
      .map(c => PromChunkPartition(c.alias,
        graft.ingest.PromIngest.chunkUrl(base, c.copy(endSec = c.endSec - 1)))
        : InputPartition)
      .toArray
  }
}

/** Epoch-second stream position (half-open: rows < sec are consumed). */
private[sources] case class PromOffset(sec: Long) extends Offset {
  override def json(): String = sec.toString
}

/** S1's streaming face — the incremental path reads the SAME table
  * abstraction as the batch scan. Offsets are epoch seconds; each
  * micro-batch covers [lastOffset, latestOffset) where `latest` is wall
  * clock floored to a step boundary (the reference's step-aligned fetch
  * discipline, `realtime_detector.py:148-153`) and clamped into the
  * configured [start, end) window — so a bounded historical range replays
  * chunk-parallel and terminates, while an open range keeps tailing one
  * step per trigger. Partition planning and the executor-side HTTP/decode
  * readers are exactly the batch ones.
  *
  * Admission control: an open range whose start is far in the past would
  * otherwise plan ONE enormous catch-up batch (weeks of chunk fetches in a
  * single micro-batch — a straggler/retry-amplification hazard). The
  * `maxSecondsPerBatch` option caps each micro-batch's time span, so the
  * stream catches up over several bounded batches instead. */
private[sources] class PromMicroBatchStream(props: Map[String, String],
                                            startSec: Long, endSec: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val step = math.max(1L, props.getOrElse("step", "120").toLong)
  // No (or non-positive) `end` option means an OPEN range: tail the clock
  // indefinitely. (The batch scan treats the same case as an empty range —
  // correct for a bounded read, wrong for a stream.)
  private val boundSec = if (endSec > startSec) endSec else Long.MaxValue
  private val maxSpanSec = props.get("maxSecondsPerBatch").map { v =>
    try v.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"maxSecondsPerBatch must be an integer number of seconds, got '$v'")
    }
  }

  override def initialOffset(): Offset = PromOffset(startSec)

  // Monotonic floor for emitted offsets: a wall clock stepped BACK (NTP)
  // between triggers must not produce an offset earlier than one already
  // committed — Spark would re-emit rows into an append sink. Tracks the
  // highest offset this instance has handed out.
  @volatile private var highWater: Long = startSec

  private def clockEnd(): Long = {
    val now = System.currentTimeMillis() / 1000
    val aligned = now - Math.floorMod(now, step)
    math.max(startSec, math.min(boundSec, aligned))
  }

  private def monotonic(sec: Long): Long = {
    val v = math.max(highWater, sec)
    highWater = v
    v
  }

  override def latestOffset(): Offset = PromOffset(monotonic(clockEnd()))

  /** Capped batch ends stay on the startSec-anchored step grid: Prometheus
    * anchors query_range samples at each request's own `start`, so a batch
    * boundary off the grid would phase-shift every subsequent sample
    * relative to the uncapped replay. Saturating span arithmetic (compare,
    * don't add) keeps a huge cap from overflowing; a cap smaller than one
    * step still advances by a full step so the stream always progresses. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PromOffset].sec
    // clamp: a regressed clock (end < from) must return `from` (empty
    // batch), never an offset earlier than the one already committed
    val end = math.max(from, clockEnd())
    PromOffset(monotonic(maxSpanSec match {
      case Some(span) =>
        if (span >= end - from) end
        else {
          val rawCap = from + span
          val floored = rawCap - Math.floorMod(rawCap - startSec, step)
          if (floored <= from) math.min(end, from + step) else floored
        }
      case None => end
    }))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The TRUE latest available offset (ignores the per-batch cap) — lets
    * Trigger.AvailableNow snapshot the real catch-up target and drain it
    * over several capped batches instead of stopping after one. READ-ONLY
    * on the high-water mark: reporting must not advance `highWater`, or a
    * report of the uncapped end would defeat the per-batch cap inside
    * `monotonic` on the next `latestOffset` call. */
  override def reportLatestOffset(): Offset =
    PromOffset(math.max(highWater, clockEnd()))

  override def deserializeOffset(json: String): Offset = PromOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    PromScan.planRange(props, start.asInstanceOf[PromOffset].sec,
      end.asInstanceOf[PromOffset].sec)

  override def createReaderFactory(): PartitionReaderFactory =
    PromReaderFactory.fromProps(props)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object PromReaderFactory {
  /** Retry knobs ride as reader options (`retryAttempts`, `retryBaseMs`,
    * `retryMaxMs`) so batch and streaming scans share one posture. */
  def fromProps(props: Map[String, String]): PromReaderFactory =
    new PromReaderFactory(
      props.getOrElse("fetcher", classOf[HttpFetcher].getName),
      props.getOrElse("retryAttempts", "3").toInt,
      props.getOrElse("retryBaseMs", "100").toLong,
      props.getOrElse("retryMaxMs", "2000").toLong)
}

private[sources] class PromReaderFactory(fetcherClass: String,
    retryAttempts: Int = 3, retryBaseMs: Long = 100, retryMaxMs: Long = 2000)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PromChunkPartition]
    val fetcher = Class.forName(fetcherClass).getDeclaredConstructor()
      .newInstance().asInstanceOf[Fetcher]
    // same bounded-retry + jittered-backoff wrapper as PromIngest (the
    // two S1 surfaces share one resilience posture); exhaustion fails the
    // task, layering under Spark's own task retry
    val policy = graft.ingest.PromIngest.RetryPolicy(
      retryAttempts, retryBaseMs, retryMaxMs)
    val resilient = graft.ingest.PromIngest.withRetry(fetcher.fetch, policy)
    new PromPartitionReader(p, resilient)
  }
}

/** Executor-side chunk reader: one HTTP GET, Jackson decode (first series
  * only, coerce-to-null values — `data_collector.py:59-75` semantics). */
private[sources] class PromPartitionReader(p: PromChunkPartition,
    fetch: String => String)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(fetch(p.url))
    if (root.path("status").asText() != "success") Iterator.empty
    else {
      val result = root.path("data").path("result")
      if (!result.isArray || result.size() == 0) Iterator.empty
      else {
        val series = result.get(0) // first series only
        val labels = series.path("metric")
        val keyNames = labels.fieldNames().asScala.toArray
        val keys = keyNames.map(k => UTF8String.fromString(k): Any)
        val labelVals = keyNames.map(k =>
          UTF8String.fromString(labels.get(k).asText()): Any)
        val labelMap = new ArrayBasedMapData(
          new GenericArrayData(keys), new GenericArrayData(labelVals))
        val alias = UTF8String.fromString(p.alias)
        series.path("values").elements().asScala.map { pair =>
          val tsMicros = (pair.get(0).asDouble() * 1e6).toLong
          val raw = pair.get(1).asText()
          val value: Any =
            try java.lang.Double.valueOf(raw)
            catch { case _: NumberFormatException => null }
          new GenericInternalRow(
            Array[Any](alias, tsMicros, value, labelMap)): InternalRow
        }
      }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
