package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[SortedIntersectSize]] — one linear merge over two
  * SORTED string arrays instead of `size(array_intersect(a, b))`'s
  * per-call boxed hash-set build + throwaway result-array
  * materialization (Spark's `ArrayIntersect` copies every matching
  * element into a fresh array that `size` immediately discards).
  *
  * Input contract: both arrays sorted ascending by UTF8String binary
  * order with nulls FIRST — exactly `sort_array(col)`'s default order.
  * The caller sorts ONCE per document row (before the pair join fans a
  * doc's shingle set into many candidate pairs), so the per-pair cost
  * drops from hash-set build + array copy to a straight merge of
  * UnsafeArrayData slices with zero allocation.
  *
  * Parity target (spec-pinned in SortedIntersectSizeSpec):
  * `interSize(sort(a), sort(b)) == size(array_intersect(a, b))` for ANY
  * string arrays — count of DISTINCT common values, a null element
  * counting as a match when present in both (Spark's null-safe intersect
  * equality), duplicates counted once (array_intersect dedups). Counting
  * is order-invariant, which is what makes the pre-sort transparent. */
object SortedIntersectSizeUtil {

  def interSize(aRaw: Any, bRaw: Any): Int = {
    val a = aRaw.asInstanceOf[ArrayData]
    val b = bRaw.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    // sort_array(asc) groups all nulls at the head
    var i = 0
    while (i < na && a.isNullAt(i)) i += 1
    var j = 0
    while (j < nb && b.isNullAt(j)) j += 1
    var count = if (i > 0 && j > 0) 1 else 0
    while (i < na && j < nb) {
      val av = a.getUTF8String(i)
      val bv = b.getUTF8String(j)
      val c = av.compareTo(bv)
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        count += 1
        i += 1
        j += 1
        // skip duplicates so each distinct value counts once
        while (i < na && a.getUTF8String(i).compareTo(av) == 0) i += 1
        while (j < nb && b.getUTF8String(j).compareTo(bv) == 0) j += 1
      }
    }
    count
  }
}

/** `graft_sorted_inter_size(a, b)` — `size(array_intersect(a, b))` over
  * PRE-SORTED string arrays as a zero-allocation merge (see
  * [[SortedIntersectSizeUtil]] for the contract). Null array on either
  * side yields null, matching `size(array_intersect(...))`'s propagation
  * under the default `spark.sql.legacy.sizeOfNull=false`. Registered via
  * [[GraftExtensions]]; dispatched from `Dedup.jaccardVerify` with the
  * built-in composition as the unregistered-session fallback. */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_inter_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSizeUtil.interSize(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SortedIntersectSizeUtil.interSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
