package graft.tools

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Pipeline
import graft.model.{DetectQuality, Lstm, Training}
import graft.operators.Windows

/** Dev tool: trains and freezes the `q_detect_quality` model artifact
  * (round-10 verdict item 5). Trains the LSTM autoencoder with the real
  * BPTT/Adam loop on the CLEAN scaled click series of the given dirs
  * (default sf0.01 + sf0.1, so the frozen weights reconstruct both the
  * correctness-gate series and the bench series), writes the weights JSON
  * to `src/main/resources/graft/detect_model.json`, then prints the
  * decision margins per dir — trained vs untrained clean MSE, the weakest
  * spiked-window MSE, and the resulting recall/precision at
  * [[DetectQuality.Threshold]] — the evidence the registry row's scaladoc
  * cites.
  * Usage: {{{ runMain graft.tools.TrainDetectModel [dirsCsv] [outPath] [epochs] }}} */
object TrainDetectModel {
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.map(_.split(",").toSeq.map(_.trim))
      .getOrElse(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    val out = args.lift(1)
      .getOrElse("src/main/resources/graft/detect_model.json")
    val epochs = args.lift(2).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cleanWindows(dir: String): IndexedSeq[DenseMatrix[Double]] =
      Windows.slidingWindows(DetectQuality.cleanSeries(spark, dir),
          Seq("ts_min"), Seq("v"), Pipeline.SeqLen)
        .select("window").collect().toIndexedSeq
        .map { r =>
          val rows = r.getSeq[Row](0)
          DenseMatrix.tabulate(rows.size, 1)((i, _) => rows(i).getDouble(0))
        }

    val perDir = dirs.map(d => d -> cleanWindows(d)).toMap
    val trainX = dirs.flatMap(perDir).toIndexedSeq
    println(s"[train] ${trainX.size} clean windows from ${dirs.mkString(",")}")
    val init = Lstm.glorotInit(1, seed = 42L)
    val t0 = System.nanoTime()
    val res = Training.trainDriver(trainX, IndexedSeq.empty, init,
      epochs = epochs, patience = epochs)
    println(f"[train] $epochs epochs in ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"loss ${res.history.head._1} -> ${res.history.last._1} (best epoch ${res.bestEpoch})")
    new java.io.File(out).getParentFile.mkdirs()
    Lstm.save(res.params, out)
    println(s"[train] wrote $out")

    // decision margins per dir, for the registry row's scaladoc claims
    def mse(p: Lstm.AeParams, x: DenseMatrix[Double]): Double =
      Lstm.mse(x, Lstm.forward(p, x))
    for (d <- dirs) {
      val clean = perDir(d)
      val cleanTrained = clean.map(mse(res.params, _))
      val cleanUntrained = clean.map(mse(init, _))
      val spikedWins = Windows.slidingWindows(
          DetectQuality.spikedSeries(DetectQuality.cleanSeries(spark, d)),
          Seq("ts_min"), Seq("v", "is_spike"), Pipeline.SeqLen)
        .select("window").collect().toIndexedSeq
        .map { r =>
          val rows = r.getSeq[Row](0)
          (DenseMatrix.tabulate(rows.size, 1)((i, _) => rows(i).getDouble(0)),
            rows.exists(_.getDouble(1) == 1.0))
        }
      val spiked = spikedWins.filter(_._2).map(w => mse(res.params, w._1))
      val cleanInMix = spikedWins.filterNot(_._2).map(w => mse(res.params, w._1))
      val thr = DetectQuality.Threshold
      println(f"[margins] $d: clean trained mean=${cleanTrained.sum / cleanTrained.size}%.4f " +
        f"max=${cleanTrained.max}%.4f | untrained mean=${cleanUntrained.sum / cleanUntrained.size}%.4f | " +
        f"spiked min=${spiked.min}%.4f | thr=$thr%.2f | " +
        f"recall=${spiked.count(_ > thr).toDouble / spiked.size}%.3f " +
        f"precision(clean FPs)=${cleanInMix.count(_ > thr)}")
    }
    spark.stop()
  }
}
