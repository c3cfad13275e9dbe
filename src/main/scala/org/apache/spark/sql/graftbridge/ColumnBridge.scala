package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Spark 4 hides the Column⇄Expression seam behind private[sql] column
  * nodes; this bridge lives inside the sql package tree to expose the two
  * conversions custom-Expression libraries need (same pattern used by
  * Delta/Sedona-style Spark extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnConversions.expression(c)
}
