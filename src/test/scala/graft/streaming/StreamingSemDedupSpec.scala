package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSemDedupSpec extends SparkSpec {
  import StreamingSemDedup._

  test("admitted stream: greedy survivor chain across micro-batches, replay-safe") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Seq[Float])]
    val q = admittedStream(input.toDF().toDF("id", "vec"), "id", "vec",
        threshold = 0.9, bits = 0)
      .writeStream.format("memory").queryName("ssd1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((0L, Seq(1.0f, 0.0f)), (5L, Seq(0.0f, 1.0f)))
      q.processAllAvailable()
      assert(spark.table("ssd1").as[Admitted].collect().map(_.id).sorted.toSeq
        == Seq(0L, 5L))
      // near-dup of survivor 0 arriving later: dropped, nothing emitted
      input.addData(Seq((7L, Seq(1.0f, 0.01f))))
      q.processAllAvailable()
      assert(spark.table("ssd1").count() == 2)
      // novel direction admitted
      input.addData(Seq((9L, Seq(0.7f, -0.7f))))
      q.processAllAvailable()
      assert(spark.table("ssd1").as[Admitted].collect().map(_.id).sorted.toSeq
        == Seq(0L, 5L, 9L))
      // exact replay of an admitted survivor is not re-admitted
      input.addData(Seq((0L, Seq(1.0f, 0.0f))))
      q.processAllAvailable()
      assert(spark.table("ssd1").count() == 3)
    } finally q.stop()
  }

  test("within-batch determinism: shuffled delivery admits the ascending-id greedy set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 20-degree fan: each vector is within threshold of its angular
    // neighbors — greedy on ascending id keeps 0 and every second step
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val rows = Seq(3L -> v(60), 0L -> v(0), 2L -> v(40), 1L -> v(20),
      4L -> v(80)) // deliberately shuffled
    // local greedy reference in ascending id with the SAME cosine
    val sorted = rows.sortBy(_._1)
    val ref = scala.collection.mutable.ArrayBuffer[Long]()
    val kept = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    sorted.foreach { case (id, s) =>
      val a = s.toArray
      if (!kept.exists(k => StreamingSemDedup.cosine(k, a) >= 0.9)) {
        ref += id; kept += a
      }
    }
    val input = MemoryStream[(Long, Seq[Float])]
    val q = admittedStream(input.toDF().toDF("id", "vec"), "id", "vec",
        threshold = 0.9, bits = 0)
      .writeStream.format("memory").queryName("ssd2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      assert(spark.table("ssd2").as[Admitted].collect().map(_.id).sorted.toSeq
        == ref.sorted.toSeq, s"expected ${ref.toSeq}")
    } finally q.stop()
  }

  test("semantics pin: greedy admits what the batch min-id rule drops (documented divergence)") {
    import spark.implicits._
    // chain: v1 is a near-dup of v0 (dropped by both rules); v2 is within
    // threshold of DROPPED v1 but not of survivor v0 — the batch
    // non-transitive rule kills v2, the greedy survivor rule admits it
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val rows = Seq(0L -> v(0), 1L -> v(20), 2L -> v(40))
    val batch = graft.sim.Ann.semDedupAuto(rows.toDF("id", "vec"), "id", "vec",
      threshold = 0.9).collect().map(_.getLong(0)).sorted.toSeq
    assert(batch == Seq(0L), s"batch rule must keep only v0, got $batch")

    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = admittedStream(input.toDF().toDF("id", "vec"), "id", "vec",
        threshold = 0.9, bits = 0)
      .writeStream.format("memory").queryName("ssd3")
      .outputMode(OutputMode.Append()).start()
    try {
      rows.foreach { r => input.addData(Seq(r)); q.processAllAvailable() }
      assert(spark.table("ssd3").as[Admitted].collect().map(_.id).sorted.toSeq
        == Seq(0L, 2L))
    } finally q.stop()
  }

  test("chain-free corpora: streaming admitted set equals batch semDedupAuto survivors") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // identical-copy groups cannot form divergent chains (every dropped
    // vector is identical to a survivor), so the two rules coincide —
    // including the cell split at bits > 0
    val dirs = Seq(
      Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f, 0.0f),
      Seq(0.0f, 0.0f, 1.0f, 0.0f), Seq(0.0f, 0.0f, 0.0f, 1.0f))
    val rows = for (g <- 0 until 4; j <- 0 until 10)
      yield ((g * 10 + j).toLong, dirs(g))
    val batch = graft.sim.Ann.semDedupAuto(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.9, targetCell = 16, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val input = MemoryStream[(Long, Seq[Float])]
    val q = admittedStream(input.toDF().toDF("id", "vec"), "id", "vec",
        threshold = 0.9, bits = graft.sim.Ann.autoBits(rows.size, 16), dims = 4)
      .writeStream.format("memory").queryName("ssd4")
      .outputMode(OutputMode.Append()).start()
    try {
      rows.grouped(7).foreach { batchRows =>
        input.addData(batchRows); q.processAllAvailable()
      }
      val streamed = spark.table("ssd4").as[Admitted].collect()
        .map(a => (a.id, a.cell)).sorted.toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("NaN cosine (zero-norm vectors): both paths ADMIT — comparison ops are not nan-safe") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // Spark SQL's "NaN largest" rule applies to sorting/grouping, NOT to
    // comparison operators: GreaterThanOrEqual codegen emits the raw
    // primitive >=, so NaN >= threshold is FALSE and zero-norm pairs are
    // never pruned. This pins the semantics so neither path can silently
    // change its mind about it.
    val rows = Seq(0L -> Seq(0.0f, 0.0f), 1L -> Seq(0.0f, 0.0f))
    val batch = graft.sim.Ann.semDedupAuto(rows.toDF("id", "vec"), "id", "vec",
      threshold = 0.9).collect().map(_.getLong(0)).sorted.toSeq
    assert(batch == Seq(0L, 1L), s"batch must admit both zero vectors, got $batch")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = admittedStream(input.toDF().toDF("id", "vec"), "id", "vec",
        threshold = 0.9, bits = 0)
      .writeStream.format("memory").queryName("ssd_nan")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      assert(spark.table("ssd_nan").as[Admitted].collect().map(_.id).sorted.toSeq
        == Seq(0L, 1L))
    } finally q.stop()
  }

  test("survivor state survives a checkpointed restart (drop-at-ingest across crashes)") {
    import scala.jdk.CollectionConverters._
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssd_ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    def start() = admittedStream(input.toDF().toDF("id", "vec"), "id", "vec",
        threshold = 0.9, bits = 0)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Admitted], bid: Long) =>
        got.put(bid, ds.collect().toSeq.map(_.id)); ()
      }.start()
    val q1 = start()
    try { input.addData(Seq((0L, Seq(1.0f, 0.0f)))); q1.processAllAvailable() }
    finally q1.stop()
    // a near-dup of the admitted survivor arrives while the query is down
    input.addData(Seq((5L, Seq(1.0f, 0.01f))))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the restarted query still holds survivor 0's vector: 5 is dropped
    val admitted = got.values().asScala.flatten.toSeq.distinct.sorted
    assert(admitted == Seq(0L), admitted.toString)
  }

  test("JVM cell assignment (cellRowsJvm) equals the Catalyst parity reference over real embeddings") {
    // admittedStream keys state by cellRowsJvm's cells; any divergence
    // from the batch family's lshBucketMd5 cells would silently change
    // which survivors an arrival is compared against.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val viaExpr = StreamingSemDedup.cellRows(emb, "vec_id", "embedding",
        bits = 10, dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaJvm = StreamingSemDedup.cellRowsJvm(emb, "vec_id", "embedding",
        bits = 10, dims = 64)
      .collect().map(t => t._1 -> t._3).toMap
    assert(viaJvm.nonEmpty && viaJvm == viaExpr)
  }
}
