package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/similarity hot path.
  *
  * The composed built-in form (`aggregate(zip_with(a, b, _*_), ...)`)
  * is codegen'd but allocates an intermediate array per row (zip_with)
  * and traverses each input three times (dot, ‖a‖, ‖b‖). For the one
  * expression this library evaluates millions of times per query —
  * cosine over embeddings — a fused single-pass `doGenCode` loop is
  * the Spark-idiomatic optimization ladder's next rung (built-ins →
  * native Expression, SURVEY §7.3), with no allocation and no lambda
  * dispatch.
  */
object VectorExpressions {

  /** Fused cosine similarity over two array<float|double> columns:
    * one loop computes Σab, Σa², Σb² and returns Σab/(√Σa²·√Σb²) —
    * identical accumulation order to the composed-built-ins form, so
    * results are bit-for-bit the same.
    */
  def cosineNative(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      CosineSimilarity(
        GraftExpressionBridge.expression(a),
        GraftExpressionBridge.expression(b)))

  /** Fused squared-L2 distance Σ(aᵢ−bᵢ)² — the IVF/k-means probe
    * metric ([[graft.ext.Similarity.sqDist]]'s hot path) as one
    * allocation-free loop; identical accumulation order to the
    * composed `aggregate(zip_with(...))` form, so results are
    * bit-for-bit the same.
    */
  def sqL2Native(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      SquaredL2Distance(
        GraftExpressionBridge.expression(a),
        GraftExpressionBridge.expression(b)))

  /** Fused EXACT integer dot product Σaᵢ·bᵢ over two array<int>
    * columns — the scoring kernel for QUANTIZED embeddings (x22's
    * int8-style codes): every product and the sum stay in long
    * arithmetic, so unlike the float kernels the result is
    * accumulation-order independent and hash-oracles with no
    * rounding contract at all.
    */
  def dotIntNative(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      IntDotProduct(
        GraftExpressionBridge.expression(a),
        GraftExpressionBridge.expression(b)))
}

/** Scalar cosine similarity; null-safe on the array level (null array →
  * null result) AND the element level (any null element → null result,
  * matching the composed HOF form — a silent 0.0 would fabricate a
  * plausible score from a corrupt vector); float arrays are widened
  * element-wise exactly like a cast-then-multiply.
  *
  * NULL contract (deliberate, and stricter than the composed form):
  *  - zero-norm input → NULL. Java division would yield NaN — which
  *    Spark sorts ABOVE every real score, so a zero vector would win
  *    desc-cosine rankings; the composed Divide under ANSI mode
  *    (Spark 4 default) would instead CRASH the query with
  *    DIVIDE_BY_ZERO. NULL quietly drops the undefined comparison.
  *  - length-mismatched arrays → NULL (zip_with pads with null, which
  *    nulls the whole fold — silent truncation would fabricate a
  *    plausible score from a corrupt vector).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // a null element would otherwise read as 0.0 and fabricate a
      // score; the composed HOF form returns NULL — match it
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      // null element: NULL result (matches the HOF form), not a
         |      // fabricated score from a silent 0.0
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    final double xi = $getA;
         |    final double yi = $getB;
         |    $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $denom;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Scalar squared-L2 distance with [[CosineSimilarity]]'s exact NULL
  * contract: null array, length mismatch, or any null element → NULL
  * (a silent 0-distance would make a corrupt vector its own nearest
  * neighbor in every IVF probe). No zero-denominator case exists —
  * distance 0.0 is a legitimate value (identical vectors).
  */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_l2_dist"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    final double xi = $getA;
         |    final double yi = $getB;
         |    final double d = xi - yi;
         |    $acc += d * d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over two array<int> columns with the
  * file's shared NULL contract (null array, length mismatch, or any
  * null element → NULL). All arithmetic is long: with int inputs the
  * per-element product is ≤ 2⁶² in magnitude and quantized-code
  * vectors (0..255, dims ≤ 2³¹) cannot overflow the running sum —
  * which is what makes this the one vector kernel whose results
  * hash-oracle EXACTLY, with no rounding contract.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_i"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $dot += (long) $a.getInt($i) * $b.getInt($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
