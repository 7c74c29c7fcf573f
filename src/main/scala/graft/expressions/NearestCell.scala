package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernel for [[NearestCell]]: exact-integer argmin over a centroid
  * matrix in one loop. Distance = Σ (1000·q[i] − c[i])² on the fixed-point
  * grids of `Ann.kmeansCentroidsFixedPoint` (q at 10⁻³, centroids at 10⁻⁶);
  * ties break to the smallest cell id — bit-identical to the
  * `array_min(cellScores(...))` HOF composition and therefore to the
  * DuckDB oracle replay. */
object NearestCellUtil {
  def nearest(q: ArrayData, cents: ArrayData, cells: ArrayData): Any = {
    val dims = q.numElements()
    var bestD = Long.MaxValue
    var bestC = Int.MaxValue
    var found = false
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      val arr = cents.getArray(c)
      if (arr != null && arr.numElements() == dims) {
        var d = 0L
        var i = 0
        while (i < dims) {
          val diff = q.getLong(i) * 1000L - arr.getLong(i)
          d += diff * diff
          i += 1
        }
        val cell = cells.getInt(c)
        if (d < bestD || (d == bestD && cell < bestC)) {
          bestD = d; bestC = cell; found = true
        }
      }
      c += 1
    }
    if (!found) null else java.lang.Integer.valueOf(bestC)
  }
}

/** `graft_nearest_cell(q, cents, cells)` — native codegen'd argmin cell
  * assignment for the fixed-point k-means quantizer: `q` a 10⁻³-grid
  * integer vector, `cents` the k×dims 10⁻⁶-grid centroid matrix (a plan
  * literal), `cells` the parallel cell-id array. One JVM loop inside
  * whole-stage codegen; the HOF composition builds and folds a k-struct
  * array per row, interpreted, and its ~k·dims-literal expression tree is
  * expensive to codegen-compile when the assignment runs several times per
  * index build (two Lloyd iterations + the final cells pass). */
case class NearestCell(q: Expression, cents: Expression, cells: Expression)
    extends TernaryExpression {

  override def first: Expression = q
  override def second: Expression = cents
  override def third: Expression = cells
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (q.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && (cents.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }) && (cells.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects (array<bigint>, array<array<bigint>>, array<int>), got " +
        s"(${q.dataType.simpleString}, ${cents.dataType.simpleString}, " +
        s"${cells.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(qv: Any, cv: Any, ids: Any): Any =
    NearestCellUtil.nearest(qv.asInstanceOf[ArrayData],
      cv.asInstanceOf[ArrayData], ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("cell")
    nullSafeCodeGen(ctx, ev, (qv, cv, ids) => s"""
      Object $res = graft.expressions.NearestCellUtil.nearest($qv, $cv, $ids);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Integer) $res).intValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(q = newFirst, cents = newSecond, cells = newThird)
}
