package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import scala.jdk.CollectionConverters._

class StreamingDedupSpec extends SparkSpec {
  import StreamingDedup._

  private val dupA  = "the quick brown fox jumps over the lazy dog again and again"
  private val dupA2 = "the quick brown fox jumps over the lazy dog again and again today"
  private val other = "completely unrelated text about distributed stream processing"

  test("near-dup candidates stream: later arrivals pair with the first-arrived representative") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val cands = nearDupCandidates(input.toDF().toDF("id", "text"), "id", "text")
    val q = cands.writeStream.format("memory").queryName("sd1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, dupA), (5L, other))
      q.processAllAvailable()
      assert(spark.table("sd1").count() == 0) // nothing collides yet
      // a near-dup arriving in a LATER micro-batch pairs with doc 1
      input.addData(Seq((2L, dupA2)))
      q.processAllAvailable()
      val pairs = spark.table("sd1").as[Candidate].collect()
        .map(c => (c.id1, c.id2)).distinct.toSeq
      assert(pairs == Seq((1L, 2L)), pairs.toString)
      // an exact replay of the representative emits nothing new
      input.addData(Seq((1L, dupA)))
      q.processAllAvailable()
      assert(spark.table("sd1").as[Candidate].collect()
        .map(c => (c.id1, c.id2)).distinct.toSeq == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("streaming star matches the batch clique's connectivity (same md5 band family)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Seq((1L, dupA), (2L, dupA2), (3L, dupA), (9L, other))
    // batch candidates: full clique among {1,2,3}
    val batch = graft.dedup.Dedup.minhashCandidatesMd5(
        docs.toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((1L, 2L), (1L, 3L), (2L, 3L)), batch.toString)
    // streaming: star anchored at the first arrival — same connected set
    val input = MemoryStream[(Long, String)]
    val q = nearDupCandidates(input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("sd2")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.foreach { d => input.addData(Seq(d)); q.processAllAvailable() }
      val star = spark.table("sd2").as[Candidate].collect()
        .map(c => (c.id1, c.id2)).distinct.toSet
      assert(star == Set((1L, 2L), (1L, 3L)), star.toString)
    } finally q.stop()
  }

  test("TTL-expired buckets re-admit: a stale representative stops pairing") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val cands = nearDupCandidates(input.toDF().toDF("id", "text"), "id", "text",
      ttlMs = 100L)
    val q = cands.writeStream.format("memory").queryName("sd_ttl")
      .outputMode(OutputMode.Append()).start()
    // With ProcessingTimeTimeout armed, `shouldRunAnotherBatch` is always
    // true (the state op may need a batch just to fire timeouts), so the
    // stream never reports no-new-data and processAllAvailable NEVER
    // RETURNS. Sequence batches by polling the processed source offset in
    // the progress events instead (MemoryStream offsets count addData
    // calls; endOffset is monotonic across the continuous empty batches).
    def awaitCommitted(nAdds: Long): Unit = {
      // MemoryStream offsets are 0-based: after k addData calls the
      // processed endOffset reaches k-1
      val deadline = System.currentTimeMillis + 60000
      def committed = Option(q.lastProgress).exists(p =>
        p.sources.nonEmpty && Option(p.sources(0).endOffset)
          .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
          .exists(_ >= nAdds - 1))
      while (!committed && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(committed, s"addData #$nAdds not processed after 60s; lastProgress=" +
        Option(q.lastProgress).map(_.json).orNull)
    }
    try {
      input.addData(Seq((1L, dupA)))
      awaitCommitted(1)
      // let doc 1's bucket deadlines lapse with wide margin — the
      // continuous timeout-check batches evict the state along the way
      Thread.sleep(2500)
      // docs 2 and 3 are near-dups of doc 1, arriving TOGETHER (one
      // micro-batch, so no TTL race between them): the expired buckets
      // re-admit doc 2 as the new representative (no pair with doc 1)
      // and doc 3 pairs with doc 2, not the long-gone original
      input.addData(Seq((2L, dupA2), (3L, dupA)))
      awaitCommitted(2)
      val pairs = spark.table("sd_ttl").as[Candidate].collect()
        .map(c => (c.id1, c.id2)).distinct.toSeq
      assert(pairs == Seq((2L, 3L)), pairs.toString)
    } finally q.stop()
  }

  test("bucket state survives a checkpointed restart (drop-at-ingest across crashes)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Long)]]()
    def start() = nearDupCandidates(input.toDF().toDF("id", "text"), "id", "text")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Candidate], bid: Long) =>
        got.put(bid, ds.collect().toSeq.map(c => (c.id1, c.id2))); ()
      }.start()
    val q1 = start()
    try { input.addData(Seq((1L, dupA))); q1.processAllAvailable() }
    finally q1.stop()
    input.addData(Seq((2L, dupA2))) // arrives while the query is down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the restarted query still knows doc 1 owns the buckets
    val pairs = got.values().asScala.flatten.toSeq.distinct
    assert(pairs == Seq((1L, 2L)), pairs.toString)
  }

  test("TTL state tracks recently-ACTIVE buckets and drains when idle; " +
      "the exact path tracks stream length (the SCALE.md asymmetry, pinned)") {
    // The r14 wall-clock-TTL finding, until now prose in SCALE.md: on the
    // TTL'd path `state_rows_end` is a function of how many buckets were
    // touched within one TTL window — NOT of how many the stream has ever
    // seen — and idle buckets DRAIN. On the exact (ttlMs = 0) path state is
    // monotone in distinct buckets. Both invariants asserted from the
    // engine's own StateOperatorProgress.numRowsTotal.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def doc(i: Int): (Long, String) =
      (i.toLong, s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i " +
        s"golf$i hotel$i india$i juliet$i kilo$i lima$i")
    def rowsTotal(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.apply(0).numRowsTotal).getOrElse(-1L)

    // --- TTL'd path: drain when idle ---
    val in1 = MemoryStream[(Long, String)]
    // ttl 500 ms (not 100): the >0 progress window must span several
    // 50 ms polls — with a 100 ms TTL a post-eviction batch could
    // overwrite the one numRowsTotal>0 snapshot before any poll saw it,
    // a 60-s-timeout flake (r18 ADVICE item 4)
    val q1 = nearDupCandidates(in1.toDF().toDF("id", "text"), "id", "text",
        ttlMs = 500L)
      .writeStream.format("memory").queryName("sd_ttl_rows")
      .outputMode(OutputMode.Append()).start()
    try {
      in1.addData((1 to 10).map(doc))
      // ProcessingTimeTimeout keeps the stream running empty batches, so
      // processAllAvailable never returns (see the re-admit test above) —
      // poll progress instead, tracking the PEAK across every poll in ONE
      // loop (the peak and the drain race otherwise)
      val deadline = System.currentTimeMillis + 60000
      var peak = -1L
      while ((peak <= 0 || rowsTotal(q1) != 0) &&
        System.currentTimeMillis < deadline) {
        peak = math.max(peak, rowsTotal(q1))
        Thread.sleep(50)
      }
      assert(peak > 0, s"no state rows observed; progress=" +
        Option(q1.lastProgress).map(_.json).orNull)
      // all ten docs now idle past the TTL: the continuous timeout-check
      // batches must have EVICTED their buckets (the loop above only
      // exits with peak>0 once state is back to zero)
      assert(rowsTotal(q1) == 0,
        s"TTL state did not drain below peak=$peak after idle; " +
          s"rows=${rowsTotal(q1)}")
    } finally q1.stop()

    // --- exact path: monotone, tracks every bucket ever seen ---
    val in2 = MemoryStream[(Long, String)]
    val q2 = nearDupCandidates(in2.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("sd_exact_rows")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData((1 to 10).map(doc)); q2.processAllAvailable()
      val afterTen = rowsTotal(q2)
      Thread.sleep(700) // longer than the TTL'd path's horizon (500 ms)
      in2.addData(Seq(doc(11))); q2.processAllAvailable()
      val afterEleven = rowsTotal(q2)
      assert(afterTen > 0 && afterEleven > afterTen,
        s"exact path state must grow with distinct buckets and never " +
          s"drain: $afterTen -> $afterEleven")
    } finally q2.stop()
  }
}
