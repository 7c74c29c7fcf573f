package graft.expressions

import graft.SparkSpec
import graft.sim.Ann
import org.apache.spark.sql.functions._

/** The native int8-quantization kernel (round-16 order #4): proves
  * `graft_int8_report` is registered, and that its output is
  * BIT-IDENTICAL — codes, scale, mae, null shapes — to the compositional
  * three-HOF-fold plan (`Ann.int8ReportComposed`) it replaces in the
  * oracle-checked `q_embed_quant` row. The parity set covers the edge
  * shapes the scaladoc promises: null elements (null code, null mae),
  * the all-zero vector (scale 0, codes 0, mae 0), denormal-tiny and
  * large magnitudes, exact half-step values (HALF_UP rounding), and
  * float inputs (the embeddings table's element type). */
class Int8ReportSpec extends SparkSpec {
  import spark.implicits._

  test("graft_int8_report is registered and Ann.int8Report dispatches to it") {
    assert(spark.catalog.functionExists("graft_int8_report"))
    val df = Seq((1L, Seq(0.5f, -1.0f))).toDF("vec_id", "embedding")
    val plan = df.select(Ann.int8Report($"embedding"))
      .queryExecution.analyzed.toString()
    assert(plan.contains("graft_int8_report"),
      s"int8Report should dispatch to the native kernel, plan was:\n$plan")
  }

  test("bit-identical to the compositional fold on random float vectors + edge shapes") {
    val rng = new scala.util.Random(41)
    val random = (0 until 300).map { i =>
      (i.toLong, Seq.fill(16)((rng.nextFloat() - 0.5f) * math.pow(10,
        rng.nextInt(7) - 3).toFloat))
    }
    val edges = Seq(
      (1000L, Seq.fill(8)(0.0f)),                      // zero vector
      (1001L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),          // exact half steps
      (1002L, Seq(1e-38f, -1e-38f, 2e-38f, 0.0f)),     // denormal-tiny
      (1003L, Seq(3.4e38f, -3.4e38f, 1.0f, -1.0f)),    // near float max
      (1004L, Seq(1.0f)))                              // single element
    val df = (random ++ edges).toDF("vec_id", "embedding")
    val native = df.select($"vec_id", Ann.int8Report($"embedding").as("r"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val composed = df.select($"vec_id",
        Ann.int8ReportComposed($"embedding").as("r"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(native.keySet == composed.keySet)
    native.keys.toSeq.sorted.foreach { id =>
      val (n, c) = (native(id), composed(id))
      assert(n.getSeq[Long](0) == c.getSeq[Long](0), s"codes differ for $id")
      // bit-exact doubles: compare raw bits, not approximate equality
      assert(java.lang.Double.doubleToRawLongBits(n.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(c.getDouble(1)),
        s"scale differs for $id: ${n.getDouble(1)} vs ${c.getDouble(1)}")
      val (nNull, cNull) = (n.isNullAt(2), c.isNullAt(2))
      assert(nNull == cNull, s"mae null shape differs for $id")
      if (!nNull) {
        val (nm, cm) = (n.getDouble(2), c.getDouble(2))
        assert((nm.isNaN && cm.isNaN) ||
          java.lang.Double.doubleToRawLongBits(nm) ==
            java.lang.Double.doubleToRawLongBits(cm),
          s"mae differs for $id: $nm vs $cm")
      }
    }
  }

  test("null elements: null code, null mae, scale from the non-null side — both paths") {
    val df = Seq((1L, Seq[java.lang.Float](0.5f, null, -1.0f)))
      .toDF("vec_id", "embedding")
    for ((label, rep) <- Seq(
        "native" -> Ann.int8Report($"embedding"),
        "composed" -> Ann.int8ReportComposed($"embedding"))) {
      val r = df.select(rep.as("r"))
        .select($"r.codes", $"r.scale", $"r.mae").head()
      val codes = r.getSeq[Any](0)
      assert(codes(0) == 64L && codes(1) == null && codes(2) == -127L,
        s"$label codes: $codes")
      assert(r.getDouble(1) == 127.0, s"$label scale")
      assert(r.isNullAt(2), s"$label mae should be null when an element is")
    }
  }

  test("documented edge divergences: null vector and empty vector (kernel scaladoc)") {
    // null vector: the kernel is null-in → null-out; the HOF plan's
    // `when(...).otherwise(0.0)` leaks a half-null struct(null, 0.0, null)
    val nullVec = Seq((1L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    assert(nullVec.select(Ann.int8Report($"embedding")).head().isNullAt(0))
    val composedNull = nullVec
      .select(Ann.int8ReportComposed($"embedding").as("r")).head().getStruct(0)
    assert(composedNull.isNullAt(0) && composedNull.getDouble(1) == 0.0 &&
      composedNull.isNullAt(2),
      "the composed path's half-null struct shape changed — update the scaladoc")
    // empty vector: the kernel is total (NaN mae); the composed plan
    // raises ANSI DIVIDE_BY_ZERO — a library kernel should not throw on
    // a well-typed row
    val emptyVec = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val k = emptyVec.select(Ann.int8Report($"embedding").as("r"))
      .select($"r.codes", $"r.scale", $"r.mae").head()
    assert(k.getSeq[Long](0).isEmpty && k.getDouble(1) == 0.0 &&
      k.getDouble(2).isNaN)
    intercept[Exception] {
      emptyVec.select(Ann.int8ReportComposed($"embedding").as("r"))
        .select($"r.mae").head()
    }
  }

  test("documented edge divergence 3: NaN/Infinity elements (kernel total, composed throws)") {
    // The parity contract is scoped to FINITE elements. Kernel semantics
    // (scaladoc): non-finite max-abs degrades scale to 0.0, every code to
    // 0, and the damage surfaces in mae (NaN for a NaN element, Infinity
    // for an Inf element) — never an executor-killing throw. The composed
    // plan's round(...).cast("long") throws a CAST error under Spark 4's
    // default ANSI mode on the same rows.
    val nanVec = Seq((1L, Seq(1.0f, Float.NaN, -2.0f)))
      .toDF("vec_id", "embedding")
    val infVec = Seq((2L, Seq(1.0f, Float.PositiveInfinity, -2.0f)))
      .toDF("vec_id", "embedding")
    for ((df, label) <- Seq((nanVec, "NaN"), (infVec, "Inf"))) {
      val k = df.select(Ann.int8Report($"embedding").as("r"))
        .select($"r.codes", $"r.scale", $"r.mae").head()
      assert(k.getSeq[Long](0) == Seq(0L, 0L, 0L),
        s"$label: all codes must be 0 at degraded scale, got ${k.getSeq[Long](0)}")
      assert(k.getDouble(1) == 0.0, s"$label: scale must degrade to 0.0")
      if (label == "NaN") assert(k.getDouble(2).isNaN, "NaN element => NaN mae")
      else assert(k.getDouble(2).isPosInfinity, "Inf element => Infinity mae")
      intercept[Exception] {
        df.select(Ann.int8ReportComposed($"embedding").as("r"))
          .select($"r.codes").head()
      }
    }
  }
}
