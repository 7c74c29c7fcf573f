package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernel for [[Int8Report]] — ONE compiled pass per vector
  * instead of the compositional plan's three interpreted
  * higher-order-function folds (`aggregate` for max-abs, `transform`
  * for the codes, `aggregate` over `zip_with` for the error sum).
  * Spark's HOF lambdas never enter whole-stage codegen: each element of
  * each fold pays an interpreted `eval` with boxing, which is why
  * q_embed_quant's MATERIALIZED price read 7.05 s at sf0.1 — 60× its
  * count-shaped price — in the r15 divergence table (round-16 order #4;
  * same remedy as the CharEntropy / graft_cosine precedents).
  *
  * BIT-IDENTICAL to `Ann.int8ReportComposed` (parity spec-asserted),
  * field by field:
  *  - max-abs fold: `greatest(acc, abs(x))` ⇒ null elements are skipped
  *    (greatest keeps the non-null side), NaN compares greatest;
  *  - scale: `127.0 / maxAbs` when positive else 0.0;
  *  - codes: `round(v · scale)` with Spark's double rounding — scala
  *    BigDecimal HALF_UP at scale 0 — then the integral double cast to
  *    long; a null element yields a null code;
  *  - error fold: sequential left fold of
  *    `abs(v − (scale > 0 ? code/scale : 0))`, so one null element
  *    nulls the sum (plus propagates) and mae is null;
  *  - mae: errSum / size(vec) in double.
  *
  * Three DOCUMENTED edge divergences, spec-pinned (the parity contract
  * is scoped to non-null, non-empty vectors of FINITE elements — what
  * the embeddings table guarantees and the oracle row exercises):
  *  - empty vector: the kernel is total (mae = 0.0/0 = NaN) where the
  *    HOF plan raises ANSI DIVIDE_BY_ZERO — a library function should
  *    not throw on a well-typed row;
  *  - null vector: the kernel returns a null struct (standard null-in →
  *    null-out) where the HOF plan's `when(...).otherwise(0.0)` leaks a
  *    half-null `struct(null, 0.0, null)`;
  *  - NaN / Infinity elements: the kernel stays total where the HOF
  *    plan's `round(...).cast("long")` throws a CAST error under
  *    Spark 4's default ANSI mode. Kernel semantics: a NaN max-abs
  *    fails `> 0.0` so scale = 0.0 (an Inf max-abs gives 127/Inf = 0.0
  *    too); `v·0.0` is then NaN for NaN/Inf elements and 0.0 for finite
  *    ones, and `NaN.toLong` = 0 — so every code is 0, and mae is
  *    NaN (NaN present) or Infinity (Inf present, |v−0| sum). Codes of
  *    0 at scale 0.0 is also the all-zero-vector convention, so a
  *    non-finite vector degrades to "unquantizable, dequantizes to 0"
  *    with the damage visible in mae rather than an executor-killing
  *    throw mid-pipeline. */
object Int8QuantUtil {

  /** Spark's Round-on-double at scale 0 (RoundBase: scala BigDecimal of
    * the double's shortest decimal form, HALF_UP, back to double; NaN and
    * infinities pass through like Spark's Round, they'd blow BigDecimal). */
  def roundHalfUp(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else scala.math.BigDecimal(d)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  def report(vec: ArrayData, isFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    def elem(i: Int): Double =
      if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
    // fold 1: max |x|, greatest-semantics (nulls skipped, NaN greatest)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = math.abs(elem(i))
        if (java.lang.Double.compare(a, maxAbs) > 0) maxAbs = a
      }
      i += 1
    }
    val scale = if (maxAbs > 0.0) 127.0 / maxAbs else 0.0
    // fold 2+3 fused: codes and the sequential error sum in one pass —
    // same element order as the compositional left folds
    val codes = new Array[Any](n)
    var errSum = 0.0
    var errNull = false
    i = 0
    while (i < n) {
      if (vec.isNullAt(i)) {
        codes(i) = null
        errNull = true
      } else {
        val v = elem(i)
        val q = roundHalfUp(v * scale).toLong
        codes(i) = q
        val deq = if (scale > 0.0) q.toDouble / scale else 0.0
        errSum += math.abs(v - deq)
      }
      i += 1
    }
    val mae: Any = if (errNull) null else errSum / n.toDouble
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), scale, mae))
  }
}

/** `graft_int8_report(vec)` — per-vector int8 quantization report
  * `struct<codes array<long>, scale double, mae double>`; the codegen'd
  * single-pass twin of `Ann.int8ReportComposed` (see [[Int8QuantUtil]]).
  * Registered via [[GraftExtensions]]; `Ann.int8Report` dispatches here
  * when the extension is installed. */
case class Int8Report(child: Expression) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_int8_report expects array<float|double>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = true)),
    StructField("scale", DoubleType),
    StructField("mae", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_report"

  override protected def nullSafeEval(v: Any): Any =
    Int8QuantUtil.report(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.Int8QuantUtil.report($v, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
