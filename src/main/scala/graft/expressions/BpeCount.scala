package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[BpeCount]]: the BPE token count of one word after
  * applying the trained merges in order — symbol-level, replacing the
  * comma-form expression chain
  * `regexp_replace(w,"(.)","$1,,")` → k × `replace(s, ",a,,b,", ",ab,")`
  * → `size(filter(split(s, ","), …))` with ONE pass per merge over a
  * small symbol array (no regex, no per-merge string rebuild of the
  * whole word, no interpreted HOF).
  *
  * Equivalence to the comma-form (spec-pinned in BpeCountSpec): Spark's
  * `replace` substitutes non-overlapping occurrences left-to-right,
  * scanning the ORIGINAL string (UTF8String.replace resumes after the
  * matched segment), and the comma framing makes a match possible
  * exactly at adjacent-symbol boundaries — so one replace pass ≡ one
  * left-to-right scan merging (a, b) pairs non-overlapping, which is
  * this kernel's loop. Input contract: the word is ASCII (the call site
  * filters `^[a-z]+$` before encoding — per-CHAR splitting equals the
  * regex's per-code-point split there); merge pairs are "a b" labels
  * whose symbols never contain spaces or commas (they are concatenations
  * of [a-z_] chars by construction). */
object BpeCountUtil {

  def count(w: UTF8String, merges: Array[Array[String]]): Int = {
    val s = w.toString
    val syms = new Array[String](s.length + 1)
    var n = s.length + 1
    var i = 0
    while (i < s.length) {
      syms(i) = String.valueOf(s.charAt(i))
      i += 1
    }
    syms(s.length) = "_"
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      var out = 0
      var j = 0
      while (j < n) {
        // in-place compaction: out <= j, so reads ahead are untouched —
        // the merged symbol can never re-match within the same pass,
        // exactly like replace's resume-after-match scan
        if (j + 1 < n && syms(j) == a && syms(j + 1) == b) {
          syms(out) = syms(j) + syms(j + 1)
          j += 2
        } else {
          syms(out) = syms(j)
          j += 1
        }
        out += 1
      }
      n = out
      m += 1
    }
    n
  }
}

/** `graft_bpe_count(word, merges)` — BPE token count of one word under a
  * LITERAL ordered merge list (see [[BpeCountUtil]] for the contract).
  * Registered via [[GraftExtensions]]; dispatched from `Bpe.encode` with
  * the comma-form expression chain as the unregistered-session fallback. */
case class BpeCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_bpe_count"
  override def dataType: DataType = IntegerType

  @transient private lazy val merges: Array[Array[String]] =
    right.eval() match {
      case null => null
      case arr: ArrayData =>
        arr.toObjectArray(StringType).map {
          case s: UTF8String =>
            val parts = s.toString.split(" ", -1)
            if (parts.length == 2 && parts.forall(_.nonEmpty)) parts
            else null
          case _ => null
        }
      case _ => null
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string word, got ${left.dataType.simpleString}")
    if (!right.foldable ||
      !right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName merges must be a foldable array<string> literal")
    if (merges == null || merges.exists(_ == null))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName merges must be non-null \"a b\" pair labels")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(w: Any, m: Any): Any =
    BpeCountUtil.count(w.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", merges,
      "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.expressions.BpeCountUtil.count($w, $mergesRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
