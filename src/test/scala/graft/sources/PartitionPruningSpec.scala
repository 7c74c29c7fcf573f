package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the SCALE.md scan-layer claim: when the corpus is laid out
  * directory-partitioned (the cluster-scale layout), a predicate on the
  * partition column prunes partitions at planning time — no code change
  * to any operator. */
class PartitionPruningSpec extends SparkSpec {

  test("lang-partitioned layout: a lang predicate prunes to one directory") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = back.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec")
    // the lang predicate must be a PARTITION filter (planning-time prune),
    // not a post-scan data filter
    assert(scan.head.partitionFilters.exists(_.toString.contains("lang")),
      s"partitionFilters=${scan.head.partitionFilters}")
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture must have multiple languages")
    // only the en/ directory is read
    assert(scan.head.relation.location.listFiles(
      scan.head.partitionFilters, Nil).size == 1,
      "exactly one partition directory must survive pruning")
    // and the result matches the unpartitioned filter
    assert(back.count() == docs.filter(col("lang") === "en").count())
  }

  test("an operator over the partitioned layout keeps the prune (no code change)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-part2").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    // run a real operator from the library over the pruned scan
    val q = graft.text.TextStats.withQualitySignals(
      spark.read.parquet(dir).filter(col("lang") === "en"), "text")
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.head.partitionFilters.exists(_.toString.contains("lang")))
    assert(q.count() > 0)
  }
}
