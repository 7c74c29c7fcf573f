package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[MinHashSignature]] — one tight JVM loop over the
  * token array instead of `numHashes` interpreted HOF passes. Called from
  * both the interpreted `eval` and the generated code, so the expression
  * stays inside whole-stage codegen.
  */
object MinHashUtil {

  /** MinHash signature of the k-shingle set of `tokens`.
    * Shingle semantics match `Dedup.shinglesFromTokens`: k consecutive
    * tokens joined by a single space; n < k degenerates to one shingle of
    * all tokens. (Distinct-ing shingles is unnecessary for a min.) */
  def signature(tokens: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val numSh = if (n < k) 1 else n - k + 1
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < numSh) {
      val shingle =
        if (n < k) UTF8String.concatWs(sep, toks: _*)
        else UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, s, s + k): _*)
      var h = 0
      while (h < numHashes) {
        val v = XxHash64Function.hash(shingle, StringType, h.toLong)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

/** `graft_minhash64(tokens, k, numHashes)` — native Catalyst expression
  * computing the MinHash signature of a token array's k-shingle set.
  *
  * Why an Expression and not the HOF composition in `Dedup`: higher-order
  * functions are interpreted per element (no codegen, no subexpression
  * reuse), so `numHashes` × `transform` passes cost ~numHashes array walks
  * plus lambda-eval overhead per element. This kernel is one loop and the
  * expression participates in whole-stage codegen via `doGenCode`.
  * Registered through the public `SparkSessionExtensions` API (see
  * [[GraftExtensions]]).
  */
case class MinHashSignature(tokens: Expression, kExpr: Expression,
                            numHashesExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = kExpr
  override def third: Expression = numHashesExpr
  // (ExpectsInputTypes / AbstractDataType are private[sql]; validate here.)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) &&
      kExpr.dataType == IntegerType && numHashesExpr.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_minhash64 expects (array<string>, int, int), got " +
        s"(${tokens.dataType.simpleString}, ${kExpr.dataType.simpleString}, " +
        s"${numHashesExpr.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash64"

  override protected def nullSafeEval(t: Any, k: Any, n: Any): Any =
    MinHashUtil.signature(t.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, n) =>
      s"graft.expressions.MinHashUtil.signature($t, $k, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(tokens = newFirst, kExpr = newSecond, numHashesExpr = newThird)
}

/** Session extension injecting the graft native functions — enable with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash64"),
      (children: Seq[Expression]) =>
        MinHashSignature(children(0), children(1), children(2))))
  }
}
