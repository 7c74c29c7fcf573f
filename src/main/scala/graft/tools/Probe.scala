package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for environment behavior (nanosecond parquet timestamps etc). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), col("ts"),
        timestamp_micros((col("ts") / 1000).cast("long")).as("ts_us"))
      .show(5, false)
    // lineitem has ms timestamps — check those read fine as TimestampType
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    li.select(col("l_shipdate")).show(2, false)
    spark.stop()
  }
}
