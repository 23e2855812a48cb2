package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Kernels for numeric-array hot loops (jaccard verification, cosine ANN). */
object ArrayKernels {

  /** |a ∩ b| for two long arrays with distinct elements (shingle-hash
    * sets): copy, sort, merge-count. O((n+m)·log) with two primitive-array
    * allocations — versus `array_intersect`'s per-row boxed hash set. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var cnt = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) < ys(j)) i += 1
      else if (xs(i) > ys(j)) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  /** Sequential-order dot product of two double arrays — same left-to-right
    * accumulation as `aggregate(zip_with(..))` and DuckDB's list kernel, so
    * results stay bit-identical with the oracle. */
  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** long_intersect_size(array<long>, array<long>) → int. */
case class LongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"long_intersect_size expects two array<bigint>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.sortedIntersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.ArrayKernels.sortedIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LongIntersectSize = copy(left = l, right = r)
  override def prettyName: String = "long_intersect_size"
}

/** dot_product(array<double>, array<double>) → double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<double>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayKernels.dotProduct($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}
