package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingDriftSpec extends SparkSpec {
  import StreamingDrift._

  private val ref = Map("a" -> 3L, "b" -> 1L) // refTotal 4, V 2
  private val refTotal = 4L

  private val docs = Seq(
    Doc("s1", Seq("a", "a", "b"), 0L),
    Doc("s2", Seq("b", "zzz"), 1L),   // zzz -> OOV bucket
    Doc("s1", Seq("a", "qqq"), 2L),   // qqq -> OOV bucket
    Doc("s2", Seq("b", "b"), 3L))

  private def driverFold(ds: Seq[Doc]): Map[String, (Long, Double)] =
    ds.groupBy(_.source).map { case (s, g) =>
      var counts = Map.empty[String, Long]
      var n = 0L
      g.sortBy(_.seq).foreach(_.tokens.foreach { t =>
        val k = if (ref.contains(t)) t else OovToken
        counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
        n += 1L
      })
      s -> ((n, klNats(counts, n, ref, refTotal)))
    }

  test("running KL across micro-batches: final point equals the driver fold bitwise") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = drift(input.toDS(), ref, refTotal).writeStream.format("memory")
      .queryName("sd1").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(docs(1), docs(0))) // out of order within the batch
      q.processAllAvailable()
      input.addData(Seq(docs(2), docs(3)))
      q.processAllAvailable()
      val got = spark.table("sd1").as[DriftPoint].collect()
      // one point per doc
      assert(got.length == docs.length)
      val finals = got.groupBy(_.source)
        .map { case (s, ps) => s -> ps.maxBy(_.seq) }
      val want = driverFold(docs)
      want.foreach { case (s, (n, kl)) =>
        assert(finals(s).nTokens == n, s"$s token count")
        assert(finals(s).klNats == kl, s"$s KL not bitwise-equal")
      }
      // state boundedness semantics: OOV mass collapsed, so s2's counts
      // support is {b, oov} and its KL is strictly positive (b-heavy vs
      // the a-heavy reference)
      assert(finals("s2").klNats > 0.0)
    } finally q.stop()
  }

  test("streaming final point == batch referenceDrift on the same split (bitwise)") {
    import spark.implicits._
    // batch frame: reference rows (doc_id even) build the SAME ref table
    // {a:3, b:1}; scoring rows are the streamed docs
    val rows = Seq(
      (0L, "ref", "a a a b"),          // even -> reference: a=3 b=1
      (1L, "s1", "a a b"),
      (3L, "s2", "b zzz"),
      (5L, "s1", "a qqq"),
      (7L, "s2", "b b")).toDF("doc_id", "source", "text")
    val batch = graft.text.TextStats.referenceDrift(
        rows, "source", "text", col("doc_id") % 2 === 0)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = driverFold(docs)
    // the 'ref' group itself scores no rows (all its rows are reference)
    assert(batch.keySet == Set("s1", "s2"))
    Seq("s1", "s2").foreach { s =>
      assert(batch(s)._1 == want(s)._1, s"$s n_tokens")
      assert(batch(s)._2 == want(s)._2, s"$s KL: batch vs streaming fold")
    }
  }
}
