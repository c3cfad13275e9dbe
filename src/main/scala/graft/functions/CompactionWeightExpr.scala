package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** The compaction-weight formula as a native Catalyst expression
  * (reference `api/compactor/CompactionWeight.java:39-44`):
  *
  *   size < 10  →  0.0
  *   else       →  (1-locality)*115 + ((size-maxFile)/1024)*(files*1.33)
  *
  * Being a named expression node (rather than an anonymous CASE tree)
  * lets the optimizer rule [[graft.plans.PushCompactionWeightBounds]]
  * pattern-match weight-threshold filters and derive scan-pushable
  * bounds. Generated code is straight-line double arithmetic with the
  * exact same operation order as the interpreted path and the SQL oracle.
  */
case class CompactionWeightExpr(
    size: Expression, maxFile: Expression, files: Expression, locality: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(size, maxFile, files, locality)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, LongType, IntegerType, DoubleType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compaction_weight expects (bigint, bigint, int, double), got (${actual.map(_.catalogString).mkString(", ")})")
  }

  override def eval(input: InternalRow): Any = {
    val s = size.eval(input); val m = maxFile.eval(input)
    val f = files.eval(input); val l = locality.eval(input)
    if (s == null || m == null || f == null || l == null) null
    else CompactionWeightExpr.compute(
      s.asInstanceOf[Long], m.asInstanceOf[Long], f.asInstanceOf[Int], l.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sG = size.genCode(ctx); val mG = maxFile.genCode(ctx)
    val fG = files.genCode(ctx); val lG = locality.genCode(ctx)
    val anyNull = ctx.freshName("anyNull")
    val code =
      code"""
        ${sG.code}
        ${mG.code}
        ${fG.code}
        ${lG.code}
        boolean $anyNull = ${sG.isNull} || ${mG.isNull} || ${fG.isNull} || ${lG.isNull};
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!$anyNull) {
          ${ev.value} = graft.functions.CompactionWeightExpr.compute(
            ${sG.value}, ${mG.value}, ${fG.value}, ${lG.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(size = newChildren(0), maxFile = newChildren(1), files = newChildren(2), locality = newChildren(3))

  override def prettyName: String = "compaction_weight"
}

object CompactionWeightExpr {
  /** Shared by interpreted eval and generated code — one definition of the
    * IEEE operation order.
    *
    * Deliberate deviation from the reference: `CompactionWeight.java:43`
    * computes in `float` (`115f`, `1024f`, `1.33f`, float locality); this
    * computes in `double` so the result is bit-identical to the SQL oracle
    * (DuckDB evaluates the same formula in doubles). Near `floor(x*1e4+0.5)`
    * boundaries the Java tool's float rounding can therefore differ from
    * weight_e4 by 1; the double value is the more precise of the two. */
  def compute(size: Long, maxFile: Long, files: Int, locality: Double): Double =
    if (size < 10) 0.0
    else (1.0 - locality) * 115.0 + ((size - maxFile) / 1024.0) * (files * 1.33)

  def compaction_weight(size: Column, maxFile: Column, files: Column, locality: Column): Column =
    ColumnBridge.column(CompactionWeightExpr(
      ColumnBridge.expression(size), ColumnBridge.expression(maxFile),
      ColumnBridge.expression(files), ColumnBridge.expression(locality)))
}
