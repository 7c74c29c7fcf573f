package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the storage-side half of shuffle elimination at
  * 100 TB: writing both sides of a recurring join bucketed AND sorted on
  * the join key lets every subsequent join read co-located buckets with
  * ZERO exchanges (SortMergeJoin consumes the on-disk order directly).
  * One shuffle at write time is amortized over every downstream join /
  * aggregation on the key — the classic warehouse layout for fact tables
  * joined daily.
  *
  * Spark-first note: this is metadata-driven (`bucketBy` + `saveAsTable`),
  * so Catalyst proves the co-location and drops the Exchange on its own —
  * no manual partitioning tricks. `BucketingSpec` asserts the zero-shuffle
  * plan and result equality against the plain join.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed and sorted by `key`.
    * `buckets` must match on both sides of an intended co-located join
    * (Spark also tolerates ratio-compatible bucket counts via bucket
    * coalescing). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
