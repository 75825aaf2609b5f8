package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions over SORTED primitive arrays.
  *
  * The triangle-enumeration kernel ([[graft.ext.Graph.triangleEnum]])
  * intersects two sorted out-neighbor arrays once per arc — the
  * single hottest loop in the graph family (Σ od(a)+od(b) element
  * visits per corpus ≈ the wedge volume: 82 M at sf0.1, 822 M at the
  * 10× big point). Spark's `array_intersect` is general-purpose: per
  * ROW it builds a hash set of one side, probes the other, and keeps
  * insertion order — allocation and hashing the sorted-input case
  * never needs. A two-pointer merge does the same element comparisons
  * with zero per-element allocation and no hashing, the classic
  * merge-join-vs-hash-join trade at expression scale.
  */
object ArrayExpressions {

  /** Intersection of two SORTED-ascending, duplicate-free
    * array<bigint> columns via a fused two-pointer merge. Caller
    * contract: both inputs sorted ascending and distinct (what
    * `sort_array(collect_set(...))` / grouped-distinct `collect_list`
    * produce); on unsorted input the result is undefined (a subset),
    * exactly like a merge join fed an unsorted stream.
    */
  def sortedIntersect(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      SortedLongIntersect(
        GraftExpressionBridge.expression(a),
        GraftExpressionBridge.expression(b)))
}

/** Two-pointer merge intersection over sorted array<bigint> inputs.
  *
  * NULL contract (matches the vector kernels' discipline,
  * [[CosineSimilarity]]): null array → null result; any null ELEMENT
  * encountered before the merge resolves → null result (graph
  * adjacency never contains null neighbors, so a null here means a
  * corrupt upstream — surface it as NULL, don't fabricate a smaller
  * intersection). Output elements are non-null by construction.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val buf = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { buf(k) = xv; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |final long[] $buf = new long[java.lang.Math.min($n, $m)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    // corrupt adjacency (null neighbor): NULL result, not a
         |    // silently smaller intersection
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $buf[$k++] = $xv; $i++; $j++; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($buf, $k));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
