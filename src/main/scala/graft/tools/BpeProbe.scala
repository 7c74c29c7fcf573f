package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 decomposition probe for q_bpe_encode: train (driver-fold
  * collect) vs encode legs, noop sink, median-of-rest reporting. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeDf(label: String)(mk: => DataFrame): Unit = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s first ${times.head}%.3f " +
        f"steady ${times.drop(1).sorted.apply((reps - 1) / 2)}%.3f")
    }
    def timeAct(label: String)(act: => Unit): Unit = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        act
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s first ${times.head}%.3f " +
        f"steady ${times.drop(1).sorted.apply((reps - 1) / 2)}%.3f")
    }

    val docs = graft.Tables.documents(spark, dir)
    import graft.text.Bpe
    timeAct("train(8)") {
      Bpe.train(Bpe.wordTable(docs, "text"), 8)
    }
    val merges = Bpe.train(Bpe.wordTable(docs, "text"), 8)
    timeDf("encode")(Bpe.encode(docs, "doc_id", "text", merges))
    timeDf("full_row_registry")(
      graft.SparkEntry.queries("q_bpe_encode")(spark, dir))
    spark.stop()
  }
}
