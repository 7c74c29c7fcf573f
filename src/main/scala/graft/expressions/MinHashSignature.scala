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

  /** md5-basis signature — IDENTICAL values to the HOF composition
    * (`Dedup.md5HashPairs` + `minhashSignatureMd5`) and the DuckDB oracle:
    * per shingle one md5, a = big-endian of digest bytes 0–5 (= hex chars
    * 1–12), b = bytes 6–11, signature j = min(a + j·b). One loop instead of
    * a digest pass plus numHashes interpreted min-folds. */
  def signatureMd5(tokens: ArrayData, k: Int, numHashes: Int): ArrayData = {
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
    val md = java.security.MessageDigest.getInstance("MD5")
    var s = 0
    while (s < numSh) {
      val shingle =
        if (n < k) UTF8String.concatWs(sep, toks: _*)
        else UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, s, s + k): _*)
      val d = md.digest(shingle.getBytes)
      var a = 0L; var b = 0L
      var j = 0
      while (j < 6) {
        a = (a << 8) | (d(j) & 0xffL)
        b = (b << 8) | (d(j + 6) & 0xffL)
        j += 1
      }
      var h = 0
      while (h < numHashes) {
        val v = a + h * b
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

/** `graft_minhash_md5(tokens, k, numHashes)` — the md5-basis twin of
  * [[MinHashSignature]]. Same single-loop kernel shape; values are
  * bit-identical to the cross-engine-stable HOF composition (and therefore
  * to the DuckDB oracle), so the oracle-checked query can run the fast
  * path without weakening the check. */
case class MinHashSignatureMd5(tokens: Expression, kExpr: Expression,
                               numHashesExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = kExpr
  override def third: Expression = numHashesExpr
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) &&
      kExpr.dataType == IntegerType && numHashesExpr.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_md5 expects (array<string>, int, int), got " +
        s"(${tokens.dataType.simpleString}, ${kExpr.dataType.simpleString}, " +
        s"${numHashesExpr.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_md5"

  override protected def nullSafeEval(t: Any, k: Any, n: Any): Any =
    MinHashUtil.signatureMd5(t.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, n) =>
      s"graft.expressions.MinHashUtil.signatureMd5($t, $k, $n)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(tokens = newFirst, kExpr = newSecond, numHashesExpr = newThird)
}

/** Static kernel for [[CosineSimilarity]]: double-precision cosine of two
  * numeric arrays in one loop (vs three interpreted HOF folds). */
object CosineUtil {
  def cosine(a: ArrayData, b: ArrayData, elemType: DataType): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val isFloat = elemType == FloatType
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `graft_cosine(a, b)` — native codegen'd cosine similarity over
  * array<float|double>. One loop, inside whole-stage codegen; the HOF
  * composition (zip_with + two aggregate folds) walks the arrays three
  * times interpreted. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def okArr(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (okArr(left.dataType) && right.dataType.equals(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two equal array<float|double>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = if (elemType == FloatType) "org.apache.spark.sql.types.FloatType$.MODULE$"
             else "org.apache.spark.sql.types.DoubleType$.MODULE$"
    val cos = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $cos = graft.expressions.CosineUtil.cosine($a, $b, ($et));
      if ($cos == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) $cos).doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[SimHashMd5]]: all bit votes of a token-md5 array
  * in ONE pass. Bit-identical to the pure-builtin fallbacks
  * (`Dedup.simhash32Md5`: vote j = ascii parity of hex char j;
  * `Dedup.simhash64Md5`: vote j = ascii bit (j%2) of hex char (j/2)) and
  * therefore to the DuckDB oracle replay — the fast path does not weaken
  * the check. A null array element casts no votes but still counts toward
  * the majority denominator, matching `filter`'s null semantics. */
object SimHashUtil {
  def simhash(md5s: ArrayData, nBits: Int): Long = {
    val n = md5s.numElements()
    val votes = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      val m = md5s.getUTF8String(i)
      if (m != null) {
        val ascii = m.getBytes // 32 one-byte hex chars
        var j = 0
        while (j < nBits) {
          val c = if (nBits == 64) j >> 1 else j
          val b = if (nBits == 64) j & 1 else 0
          if (c < ascii.length && ((ascii(c) >> b) & 1) == 1) votes(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < nBits) {
      if (votes(j) * 2 > n) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Static kernel for [[SimHashFromHashes]]: 64-bit sign-sum SimHash over
    * a per-token xxhash64 array in one pass. Bit-identical to the HOF
    * fallback `Dedup.simhashFromHashes` (vote j = bit j of the token hash;
    * bit set when the +1/−1 sum is positive, i.e. 2·votes > n): a null
    * element there yields −1 on every bit — exactly a zero hash — so
    * nulls count toward the denominator and cast no votes here too. */
  def simhashFromHashes(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) * 2 > n) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `graft_simhash64(hashes)` — native codegen'd 64-bit SimHash over a
  * per-token xxhash64 array (the PRODUCTION fingerprint basis). The HOF
  * fallback (`Dedup.simhashFromHashes`) is a 64-wide `transform` each
  * holding an `aggregate` lambda — a tree whose per-construction analysis
  * and codegen costs ~8 s regardless of data size (measured, BASELINE.md
  * round 9); this is one loop inside whole-stage codegen. */
case class SimHashFromHashes(hashes: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = hashes
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    hashes.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(hs: Any): Any =
    SimHashUtil.simhashFromHashes(hs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, hs =>
      s"graft.expressions.SimHashUtil.simhashFromHashes($hs)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(hashes = newChild)
}

/** `graft_simhash_md5(md5s, nBits)` — native codegen'd SimHash over a
  * per-token md5-hex array, nBits ∈ {32, 64}. The HOF fallback runs nBits
  * interpreted `filter` passes over the array; this is one loop inside
  * whole-stage codegen. */
case class SimHashMd5(md5s: Expression, nBitsExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = md5s
  override def right: Expression = nBitsExpr
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (md5s.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && nBitsExpr.dataType == IntegerType &&
      (nBitsExpr.foldable && (nBitsExpr.eval() == 32 || nBitsExpr.eval() == 64))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_md5 expects (array<string>, literal int 32|64), got " +
        s"(${md5s.dataType.simpleString}, ${nBitsExpr.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_md5"

  override protected def nullSafeEval(m: Any, n: Any): Any =
    SimHashUtil.simhash(m.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, n) =>
      s"graft.expressions.SimHashUtil.simhash($m, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(md5s = newLeft, nBitsExpr = newRight)
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
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_md5"),
      new ExpressionInfo(classOf[MinHashSignatureMd5].getName, "graft_minhash_md5"),
      (children: Seq[Expression]) =>
        MinHashSignatureMd5(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "graft_simhash_md5"),
      (children: Seq[Expression]) =>
        SimHashMd5(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHashFromHashes].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHashFromHashes(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
      (children: Seq[Expression]) =>
        NearestCell(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_int8_report"),
      new ExpressionInfo(classOf[Int8Report].getName, "graft_int8_report"),
      (children: Seq[Expression]) => Int8Report(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_char_entropy"),
      (children: Seq[Expression]) => CharEntropy(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_sum_long"),
      new ExpressionInfo(classOf[VectorSumLong].getName, "graft_vec_sum_long"),
      (children: Seq[Expression]) =>
        VectorSumLong(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_vec_avg"),
      new ExpressionInfo(classOf[VectorAvgDouble].getName, "graft_vec_avg"),
      (children: Seq[Expression]) =>
        VectorAvgDouble(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_percentile"),
      new ExpressionInfo(classOf[ExactPercentile].getName, "graft_percentile"),
      (children: Seq[Expression]) =>
        ExactPercentile(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_inter_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "graft_sorted_inter_size"),
      (children: Seq[Expression]) =>
        SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "graft_bpe_count"),
      (children: Seq[Expression]) => BpeCount(children(0), children(1))))
  }
}
