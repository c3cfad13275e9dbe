package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd vector kernels for the embedding operators.
  *
  * The ANN / near-dup / centroid pipelines originally computed dot
  * products and norms with higher-order functions
  * (`aggregate(zip_with(...))`) — correct, but HOFs evaluate interpreted
  * (one lambda dispatch per element) and sit outside whole-stage codegen.
  * These expressions emit a tight primitive loop instead and keep the
  * surrounding stage in codegen.
  *
  * FP-parity contract (the DuckDB oracle depends on it): element i is
  * widened float→double, products are accumulated strictly
  * left-to-right in a double — bit-identical to the previous
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold and to DuckDB's
  * `list_reduce(list_transform(...))` over `::DOUBLE[]` casts.
  *
  * Null contract: input arrays must have non-null elements (embedding
  * vectors); a null array yields null, mismatched lengths yield null.
  */
object VectorKernels {
  /** Sequential left-fold dot product; widens each element to double. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def sumSq(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  /** Deterministic hyperplane projection: sum_d v[d-1] * (((j*67 + d*31) % 19) - 9)
    * for d in 1..len — the same integer weight family the LSH oracle uses. */
  def planeDot(v: ArrayData, j: Long, vFloat: Boolean): Double = {
    val n = v.numElements()
    var acc = 0.0
    var d = 1
    while (d <= n) {
      val x = if (vFloat) v.getFloat(d - 1).toDouble else v.getDouble(d - 1)
      acc += x * (((j * 67 + d * 31) % 19) - 9).toDouble
      d += 1
    }
    acc
  }
}

private[functions] trait VecTypeSupport { self: Expression =>
  protected def isFloatArr(dt: DataType): Boolean =
    dt.isInstanceOf[ArrayType] && dt.asInstanceOf[ArrayType].elementType == FloatType
  protected def isVecType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** dot(a, b) over array<float|double>: double. Null on length mismatch. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeSupport {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVecType(left.dataType) && isVecType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> args, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private lazy val lF = isFloatArr(left.dataType)
  private lazy val rF = isFloatArr(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else VectorKernels.dot(aa, bb, lF, rF)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (lF) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rF) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) { $acc += ($getA) * ($getB); }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** sum of squares over array<float|double>: double (norm = sqrt of this). */
case class VectorSumSq(child: Expression) extends UnaryExpression with VecTypeSupport {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVecType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sumsq requires an array<float|double> arg, got ${child.dataType.catalogString}")

  private lazy val cF = isFloatArr(child.dataType)

  override def nullSafeEval(a: Any): Any =
    VectorKernels.sumSq(a.asInstanceOf[ArrayData], cF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.sumSq($a, $cF)")

  override protected def withNewChildInternal(newChild: Expression): VectorSumSq =
    copy(child = newChild)
  override def prettyName: String = "vec_sumsq"
}

/** plane_dot(v, j): deterministic integer-hyperplane projection of v. */
case class PlaneDot(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeSupport {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVecType(left.dataType) && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"plane_dot requires (array<float|double>, bigint), got ${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private lazy val lF = isFloatArr(left.dataType)

  override def nullSafeEval(v: Any, j: Any): Any =
    VectorKernels.planeDot(v.asInstanceOf[ArrayData], j.asInstanceOf[Long], lF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, j) => s"graft.functions.VectorKernels.planeDot($v, $j, $lF)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PlaneDot =
    copy(left = l, right = r)
  override def prettyName: String = "plane_dot"
}

object VectorExprs {
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_sumsq(a: Column): Column =
    ColumnBridge.column(VectorSumSq(ColumnBridge.expression(a)))
  def plane_dot(v: Column, j: Column): Column =
    ColumnBridge.column(PlaneDot(ColumnBridge.expression(v), ColumnBridge.expression(j)))
}
