package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlignSpec extends SparkSpec {
  import spark.implicits._

  private def long = Seq(
    // (ts, key, value, arrival)
    (1L, "a", 10.0, 1L), (1L, "b", 20.0, 2L),
    (2L, "a", 11.0, 3L),                       // b missing at ts=2
    (3L, "b", 21.0, 4L),                       // a missing at ts=3
    (4L, "a", 99.0, 6L), (4L, "a", 12.0, 5L)   // duplicate ts for a
  ).toDF("ts", "key", "value", "arrival")

  test("pivotAlignOuter: union of timestamps, nulls where absent (J1)") {
    val wide = Align.pivotAlignOuter(long, "ts", "key", "value",
      Seq("a", "b"), tiebreakCol = "arrival").orderBy("ts")
    val rows = wide.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows(1).isNullAt(2)) // b missing at ts=2
    assert(rows(2).isNullAt(1)) // a missing at ts=3
  }

  test("pivotAlignOuter: duplicate ts resolves keep-FIRST by tiebreaker") {
    val wide = Align.pivotAlignOuter(long, "ts", "key", "value",
      Seq("a", "b"), tiebreakCol = "arrival")
    val ts4 = wide.filter($"ts" === 4L).collect().head
    assert(ts4.getDouble(1) == 12.0) // arrival 5 beats arrival 6
  }

  test("pivotAlignInner: only timestamps present for every key (J2)") {
    val wide = Align.pivotAlignInner(long, "ts", "key", "value",
      Seq("a", "b"), tiebreakCol = "arrival")
    assert(wide.select("ts").as[Long].collect().sorted.toSeq == Seq(1L))
  }

  test("pivotAlignOuter without tiebreaker or agg is rejected") {
    intercept[IllegalArgumentException] {
      Align.pivotAlignOuter(long, "ts", "key", "value", Seq("a", "b"))
    }
  }

  test("totalize injects missing columns as null doubles (P6)") {
    val df = Seq((1L, 1.0)).toDF("ts", "a")
    val t = Align.totalize(df, Seq("a", "b", "c"))
    assert(t.columns.toSeq == Seq("ts", "a", "b", "c"))
    val r = t.collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(t.schema("b").dataType.typeName == "double")
  }
}
