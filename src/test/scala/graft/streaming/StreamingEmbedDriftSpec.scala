package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingEmbedDriftSpec extends SparkSpec {
  import StreamingEmbedDrift._
  import spark.implicits._

  private val dims = 8
  private def vec(id: Long): Seq[Float] =
    Seq.tabulate(dims)(d => (((id * 31 + d * 17) % 100) / 100.0f) - 0.5f)

  test("streaming final point matches the batch operator's deltas bitwise") {
    implicit val sq = spark.sqlContext
    val ids = (0L until 40L)
    val refIds = ids.filter(_ % 2 == 0)
    val curIds = ids.filter(_ % 2 == 1)
    // frozen reference means with the batch arithmetic: exact grid sums
    val refMeans = Array.tabulate(dims) { d =>
      refIds.map(i => grid(vec(i)(d))).sum.toDouble / refIds.size / 1e6
    }
    // batch truth: Ann.embeddingDrift over the combined frame
    val all = ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val batchDeltas = graft.sim.Ann.embeddingDrift(all, "embedding",
        refPred = pmod(col("vec_id"), lit(2)) === 0, dims = dims)
      .orderBy("pos").collect().map(_.getAs[Double]("delta"))
    val (bMx, bL2) = summarize(batchDeltas)

    val input = MemoryStream[Vec]
    val q = drift(input.toDS(), refMeans)
      .writeStream.format("memory").queryName("sed1")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = curIds.zipWithIndex.map { case (id, s) =>
        Vec(id, vec(id), s.toLong)
      }.splitAt(7)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      val pts = spark.table("sed1").as[EmbedPoint].collect().sortBy(_.seq)
      assert(pts.length == curIds.size)
      assert(pts.last.n == curIds.size)
      assert(pts.last.maxAbsDelta == bMx,
        s"stream ${pts.last.maxAbsDelta} vs batch $bMx")
      assert(pts.last.l2Delta == bL2, s"stream ${pts.last.l2Delta} vs batch $bL2")
      // the running count is strictly increasing across batches
      assert(pts.map(_.n).toSeq == (1L to curIds.size).toSeq)
    } finally q.stop()
  }

  test("state is constant-size and survives batches; identical stream → identical points") {
    implicit val sq = spark.sqlContext
    def run(name: String): Seq[EmbedPoint] = {
      val input = MemoryStream[Vec]
      val q = drift(input.toDS(), Array.fill(dims)(0.0))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        (0 until 3).foreach { b =>
          input.addData((0 until 5).map(i =>
            Vec(b * 5L + i, vec(b * 5L + i), b * 5L + i)))
          q.processAllAvailable()
        }
        spark.table(name).as[EmbedPoint].collect().sortBy(_.seq).toSeq
      } finally q.stop()
    }
    val r1 = run("sed2a")
    val r2 = run("sed2b")
    assert(r1 == r2)
    assert(r1.map(_.n) == (1L to 15L))
  }
}
