package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: per-column nulls, exact distincts, typed min/max/mean") {
    val df = Seq(
      (1L, Some(2.0), Some("b")),
      (2L, Some(4.0), Some("a")),
      (3L, None, Some("a")),
      (4L, Some(-1.5), None))
      .toDF("id", "v", "s")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "v", "s"))
    val id = p("id")
    assert(id.getLong(2) == 4 && id.getLong(3) == 0 && id.getLong(4) == 4)
    assert(id.getDouble(5) == 1.0 && id.getDouble(6) == 4.0 &&
      id.getDouble(7) == 2.5)
    val v = p("v")
    assert(v.getLong(3) == 1 && v.getLong(4) == 3)
    assert(v.getDouble(5) == -1.5 && v.getDouble(6) == 4.0)
    // mean on the floor-1e6 grid over 3 non-nulls: (2 + 4 - 1.5) / 3
    assert(v.getDouble(7) == 1.5)
    assert(v.isNullAt(8) && v.isNullAt(9))
    val s = p("s")
    assert(s.getLong(3) == 1 && s.getLong(4) == 2)
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(7))
    assert(s.getString(8) == "a" && s.getString(9) == "b")
  }

  test("profileApprox: same schema, identical non-distinct fields, HLL within rsd, NO Expand") {
    // deterministic wide-ish fixture: enough distincts that HLL error is
    // exercised, few enough that rsd=0.02 stays comfortably inside 5%
    val df = (0 until 5000).map { i =>
      (i.toLong, (i % 977).toDouble / 4.0,
        if (i % 100 == 0) null else s"s${i % 313}")
    }.toDF("id", "v", "s")
    val exact = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.profileApprox(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(Profile.profileApprox(df).schema == Profile.profile(df).schema,
      "the twin must keep the registry row's exact output schema")
    assert(exact.keySet == approx.keySet)
    exact.keys.foreach { k =>
      val (e, a) = (exact(k), approx(k))
      // every field except n_distinct (index 4) identical
      (0 until e.length).filter(_ != 4).foreach { i =>
        assert(e.isNullAt(i) == a.isNullAt(i), s"$k field $i null shape")
        if (!e.isNullAt(i)) assert(e.get(i) == a.get(i),
          s"$k field $i: ${e.get(i)} vs ${a.get(i)}")
      }
      val (ed, ad) = (e.getLong(4), a.getLong(4))
      assert(math.abs(ad - ed).toDouble / ed <= 0.05,
        s"$k HLL distinct $ad vs exact $ed drifts past 5%")
    }
    // the twin's reason to exist: the exact plan's multi-countDistinct
    // Expand must be GONE from the approx plan
    val exactPlan = Profile.profile(df).queryExecution.executedPlan.toString
    val approxPlan =
      Profile.profileApprox(df).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "fixture invalid: exact plan should carry the multi-countDistinct Expand")
    assert(!approxPlan.contains("Expand"),
      s"approx plan must not Expand, plan:\n$approxPlan")
  }

  test("profileApprox ≡ profile on a ZERO-ROW table (empty partitions are routine)") {
    // dataset-card runs hit empty shards; both plans must agree exactly
    // here (counts 0, distincts 0, typed stats null) — no rsd slack
    // needed since HLL of nothing is 0
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "v", "s")
    val e = Profile.profile(empty).collect().map(r => r.getString(0) -> r).toMap
    val a = Profile.profileApprox(empty).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(e.keySet == a.keySet && e.nonEmpty)
    e.keys.foreach { k =>
      (0 until e(k).length).foreach { i =>
        assert(e(k).isNullAt(i) == a(k).isNullAt(i), s"$k field $i null shape")
        if (!e(k).isNullAt(i))
          assert(e(k).get(i) == a(k).get(i), s"$k field $i")
      }
    }
  }

  test("profile is ONE aggregate job: no per-column scans of the data") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    // a single scan feeds the whole profile (the RDD/LocalTableScan
    // appears once; per-column profiling would multiply it)
    val scans = plan.split('\n').count(l =>
      l.contains("LocalTableScan") || l.contains("Scan ExistingRDD"))
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }
}
