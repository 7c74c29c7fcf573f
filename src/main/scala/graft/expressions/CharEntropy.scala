package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[CharEntropy]] — one pass over the string's code
  * points instead of the compositional plan's per-char explode + two
  * keyed aggregates (which shuffle ~n_chars rows per document twice).
  * Called from both the interpreted `eval` and the generated code, so
  * the expression stays inside whole-stage codegen.
  *
  * BIT-IDENTICAL to `TextStats.charEntropy`'s compositional path (parity
  * spec-asserted): same code-point granularity, same micro-nat integer
  * quantization, same single final double expression
  * (n·qln(n) − Σ c·qln(c)) / n / 1e6 — so the oracle-checked query can
  * run the fast path without weakening the check. */
object CharEntropyUtil {

  /** THE scalar micro-nat quantization — floor(ln·1e6 + 0.5) as a Long.
    * Single definition for every scalar consumer (this kernel,
    * StreamingDrift's fold, spec replicas); TextStats' Column-typed qln
    * mirrors the identical formula for the Catalyst side. The bitwise
    * batch/stream/kernel parity contracts all rest on these staying one
    * formula. */
  def qln(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  def entropy(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      val cell = counts.get(cp)
      if (cell == null) counts.put(cp, Array(1L)) else cell(0) += 1L
    }
    if (n == 0L) return 0.0
    var ssum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      ssum += c * qln(c)
    }
    (n * qln(n) - ssum).toDouble / n / 1e6
  }
}

/** `graft_char_entropy(text)` — per-row code-point distribution entropy
  * in nats (micro-nat quantized). Collapses the explode → (doc, char)
  * count → per-doc aggregate plan into a zero-shuffle scan expression:
  * the scale difference is the entire shuffle (2× ~corpus-characters
  * rows) vs none. Registered via [[GraftExtensions]]. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_char_entropy expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(t: Any): Any =
    CharEntropyUtil.entropy(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.expressions.CharEntropyUtil.entropy($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
