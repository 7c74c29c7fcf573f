package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Scale notes: all loads are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, and at cluster scale the same paths
  * would be directory-partitioned so partition pruning applies unchanged.
  */
object Tables {

  /** TEST-ONLY retry-determinism hook (DeterminismSpec): when set, every
    * loader appends a mapPartitions shim that throws on the FIRST attempt
    * of each task in the scan stage, so Spark re-executes the task — the
    * cluster reality (preemption, OOM-kill, speculative execution) that
    * local[n] never exercises by default. Every oracle row must produce
    * byte-identical output with this on (the session needs
    * maxFailures ≥ 2, e.g. master `local[4, 2]`). Off in production: the
    * flag is a plain volatile read at PLAN-BUILD time — zero cost and no
    * plan change when false. */
  @volatile var chaosFirstAttempt: Boolean = false

  /** Injected first-attempt failures, for the drill's non-vacuousness
    * check (a chaos run that never actually failed a task proves
    * nothing). JVM-static: tasks run in-process under local mode. */
  val chaosInjected = new java.util.concurrent.atomic.AtomicLong(0)

  private def chaos(df: DataFrame): DataFrame =
    if (!chaosFirstAttempt) df
    else {
      val enc = org.apache.spark.sql.Encoders.row(df.schema)
      df.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0) {
          chaosInjected.incrementAndGet()
          throw new RuntimeException(
            "graft chaos: injected first-attempt task failure")
        }
        it
      }(enc)
    }

  /** `events.parquet` carries a nanosecond-precision INT64 timestamp, which
    * Spark 4 refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). We read
    * it as raw nanos via `spark.sql.legacy.parquet.nanosAsLong` and derive:
    *   - `ts_us`  microseconds-since-epoch LONG (DuckDB's read of the same
    *              file truncates ns→µs identically, so this is the
    *              cross-engine-stable key),
    *   - `ts`     TIMESTAMP_NTZ at µs precision (naive, session-TZ-free —
    *              matches DuckDB's naive TIMESTAMP semantics).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-level conf is also set by Verify/Bench/test builders; this is a
    // safety net for ad-hoc sessions (idempotent). The timeZone pin matters
    // for the µs branch below: its NTZ→TZ cast feeding unix_micros reads the
    // session zone, and only UTC makes ts_us equal DuckDB's epoch_us.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    chaos(raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns-precision INT64 layout: Spark 4 refuses it as a timestamp, so
        // nanosAsLong reads raw nanos. Integer division: ns epochs
        // (~1.7e18) exceed double's 2^53 exact range, so float `/` would
        // drift ±1µs vs DuckDB's exact ns→µs truncation of the same file.
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
      case _ =>
        // µs-precision naive-timestamp layout (isAdjustedToUTC=false →
        // TIMESTAMP_NTZ): unix_micros over the UTC-pinned session (every
        // entry point sets spark.sql.session.timeZone=UTC) equals DuckDB's
        // epoch_us(ts) of the same file exactly; ts_ns is the ×1000 view
        // (µs payloads, so no precision is invented).
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
    })
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/lineitem.parquet"))
  def orders(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/orders.parquet"))
  def customer(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/customer.parquet"))
  def supplier(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/supplier.parquet"))
  def part(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/part.parquet"))
  def nation(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/nation.parquet"))
  def region(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/region.parquet"))
  def documents(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/documents.parquet"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    chaos(spark.read.parquet(s"$dir/embeddings.parquet"))

  /** The five event_type series keys, fixed so pivots are single-pass (no
    * distinct-scan) and oracle SQL can mirror them with FILTER clauses. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
}
