package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector aggregates: per-dimension sum/avg over an array column in
  * ONE aggregation buffer per group.
  *
  * Why a kernel: the declarative alternatives are (a) `posexplode` →
  * `groupBy(key, pos)` — the shuffle carries a dims× exploded copy of the
  * corpus — or (b) a WIDE aggregate of `dims` separate `sum(element_at)`
  * expressions — minimal shuffle, but the generated HashAggregate class
  * grows with dims and its first-run Janino compile costs ~1 s at 64 dims.
  * A `TypedImperativeAggregate` gets both halves right: the buffer is the
  * array itself (shuffle carries groups×dims partials), and it runs on the
  * ObjectHashAggregate path with constant-size codegen.
  *
  * Null semantics: null rows and null elements are skipped; a dimension no
  * row ever populated sums to 0 (sum) / nulls out (avg). The exact-integer
  * k-means path feeds non-null quantized vectors by construction, so the
  * 0-vs-NULL corner cannot diverge from the DuckDB replay there.
  */
abstract class VectorAggBase[B] extends TypedImperativeAggregate[B]
    with UnaryLike[Expression] {
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _) if et == expectedElementType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<$expectedElementType>, got $other")
    }
  protected def expectedElementType: DataType
}

/** `graft_vec_sum_long(array<long>)` → `array<long>` of per-dim sums. */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends VectorAggBase[Array[Long]] {

  override protected def expectedElementType: DataType = LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vec_sum_long"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) b(i) += arr.getLong(i)
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorSumLong =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorSumLong =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VectorSumLong =
    copy(child = newChild)
}

/** Mutable (sums, counts) pair for [[VectorAvgDouble]]. */
final class VecAvgBuf(var sums: Array[Double], var counts: Array[Long]) {
  def ensure(n: Int): Unit = if (sums.length < n) {
    sums = java.util.Arrays.copyOf(sums, n)
    counts = java.util.Arrays.copyOf(counts, n)
  }
}

/** `graft_vec_avg(array<double>)` → `array<double>` of per-dim averages
  * (null where no row populated the dimension — matching
  * `avg(element_at(...))` per dim). */
case class VectorAvgDouble(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends VectorAggBase[VecAvgBuf] {

  override protected def expectedElementType: DataType = DoubleType
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_vec_avg"

  override def createAggregationBuffer(): VecAvgBuf =
    new VecAvgBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  override def update(buf: VecAvgBuf, input: InternalRow): VecAvgBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) { buf.sums(i) += arr.getDouble(i); buf.counts(i) += 1 }
        i += 1
      }
      buf
    }
  }

  override def merge(b1: VecAvgBuf, b2: VecAvgBuf): VecAvgBuf = {
    b1.ensure(b2.sums.length)
    var i = 0
    while (i < b2.sums.length) {
      b1.sums(i) += b2.sums(i); b1.counts(i) += b2.counts(i); i += 1
    }
    b1
  }

  override def eval(buf: VecAvgBuf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.sums.length) { i =>
      if (buf.counts(i) > 0) java.lang.Double.valueOf(buf.sums(i) / buf.counts(i))
      else null
    })

  override def serialize(buf: VecAvgBuf): Array[Byte] = {
    val n = buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    buf.sums.foreach(bb.putDouble)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): VecAvgBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    new VecAvgBuf(Array.fill(n)(bb.getDouble), Array.fill(n)(bb.getLong))
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorAvgDouble =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorAvgDouble =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgDouble =
    copy(child = newChild)
}
