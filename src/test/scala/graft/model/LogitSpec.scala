package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogitSpec extends SparkSpec {
  import spark.implicits._

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))

  test("one GD iteration equals the locally-computed full-batch gradient") {
    val rows = Seq(
      (1.0, 2.0, 1.0), (2.0, 1.0, 1.0), (-1.0, -2.0, 0.0),
      (-2.0, 0.5, 0.0), (0.5, -1.5, 0.0), (1.5, 0.5, 1.0))
    val df = rows.toDF("x1", "x2", "y").repartition(3)
    val m = Logit.train(df, Seq("x1", "x2"), "y", iters = 1, lr = 0.5)
    // local replica: w=0, b=0 -> p=0.5 for every row
    val n = rows.size.toDouble
    val g1 = rows.map { case (x1, _, y) => (0.5 - y) * x1 }.sum / n
    val g2 = rows.map { case (_, x2, y) => (0.5 - y) * x2 }.sum / n
    val gb = rows.map { case (_, _, y) => 0.5 - y }.sum / n
    assert(math.abs(m.weights(0) - (-0.5 * g1)) < 1e-9)
    assert(math.abs(m.weights(1) - (-0.5 * g2)) < 1e-9)
    assert(math.abs(m.bias - (-0.5 * gb)) < 1e-9)
    // first-iteration loss is exactly ln 2 (all p = 0.5)
    assert(math.abs(m.lossHistory.head - math.log(2.0)) < 1e-12)
  }

  test("separable data converges: monotone-ish loss, perfect train accuracy") {
    val rows = (0 until 80).map { i =>
      val x1 = (i % 9 - 4) * 0.5
      val x2 = (i % 7 - 3) * 0.4
      // label by a known hyperplane with margin
      (x1, x2, if (x1 + 0.5 * x2 > 0.1) 1.0 else 0.0)
    }
    val df = rows.toDF("x1", "x2", "y").repartition(4)
    val m = Logit.train(df, Seq("x1", "x2"), "y", iters = 300, lr = 1.0)
    assert(m.lossHistory.last < m.lossHistory.head / 4,
      s"loss ${m.lossHistory.head} -> ${m.lossHistory.last} did not drop 4x")
    val acc = rows.count { case (x1, x2, y) =>
      val p = sigmoid(m.weights(0) * x1 + m.weights(1) * x2 + m.bias)
      (if (p > 0.5) 1.0 else 0.0) == y
    }.toDouble / rows.size
    assert(acc == 1.0, s"train accuracy $acc < 1.0 on separable data")
  }

  test("checkpoint JSON round-trips weights, bias, features, history") {
    val m = Logit.Model(Seq("a", "b"), Array(0.25, -1.5), 0.75,
      Seq(0.69, 0.42))
    val p = java.nio.file.Files.createTempFile("logit", ".json").toString
    Logit.save(m, p)
    val r = Logit.load(p)
    assert(r.features == m.features)
    assert(r.weights.toSeq == m.weights.toSeq)
    assert(r.bias == m.bias)
    assert(r.lossHistory == m.lossHistory)
  }

  test("scoreCol is the exact left-folded linear expression") {
    val df = Seq((3L, 7L), (0L, 0L)).toDF("a", "b")
    val r = df.select(Logit.scoreCol(
        Seq(col("a"), col("b")), Seq(0.25, -0.5), 2.0).as("z"))
      .as[Double].collect().toSeq
    assert(r == Seq((2.0 + 0.25 * 3) + (-0.5) * 7, 2.0))
  }

  test("trained scorer separates the documents corpus by its own labels") {
    // end-to-end on real testdata: label = (n_tokens > median), train on
    // the two count features, expect near-perfect recovery (sanity that
    // the distributed path works on DataFrame-sourced features at volume)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val doc = spark.read.parquet(s"$dir/documents.parquet")
    val feats = doc.select(
      size(graft.text.TextStats.tokens(lower(col("text"))))
        .cast("double").as("nt"),
      col("n_chars").cast("double").as("nc"))
    val med = feats.stat.approxQuantile("nt", Array(0.5), 0.0).head
    val train = feats.withColumn("y", (col("nt") > med).cast("double"))
      // standardize so plain GD converges fast
      .select((col("nt") - med).as("x1"), (col("nc") / 100.0).as("x2"),
        col("y"))
    val m = Logit.train(train, Seq("x1", "x2"), "y", iters = 200, lr = 0.3)
    val scored = train.withColumn("z",
        Logit.scoreCol(Seq(col("x1"), col("x2")), m.weights.toSeq, m.bias))
      .select(avg(((col("z") > 0).cast("double") === col("y"))
        .cast("double")).as("acc"))
      .head().getDouble(0)
    assert(scored > 0.95, s"recovery accuracy $scored <= 0.95")
  }
}
