package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Salted-key byte surgery (reference `api/common/KeyGenerator.java:27-49`):
  * prefix a row key with the low 4 bytes of its own CRC32, plus — for keys
  * of length >= 4 — 4 scrambled tail bytes (last two, then the two before
  * them), then the payload:
  *
  *   len < 4:  crc[4] ++ key
  *   len >= 4: crc[4] ++ key[-2:] ++ key[-4:-2] ++ key
  *
  * This spreads monotonically increasing keys across the keyspace
  * (region-server load smearing) while keeping the original key
  * recoverable by suffix.
  */
object SaltedKeyImpl {
  /** Static (JVM-level) so generated code can call it directly. */
  def compute(input: Array[Byte]): Array[Byte] = {
    val crc = new CRC32()
    crc.update(input, 0, input.length)
    val v = crc.getValue // unsigned 32-bit in a long
    val salt = Array[Byte](
      ((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    val n = input.length
    if (n < 4) {
      val out = new Array[Byte](4 + n)
      System.arraycopy(salt, 0, out, 0, 4)
      System.arraycopy(input, 0, out, 4, n)
      out
    } else {
      val out = new Array[Byte](8 + n)
      System.arraycopy(salt, 0, out, 0, 4)
      out(4) = input(n - 2)
      out(5) = input(n - 1)
      out(6) = input(n - 4)
      out(7) = input(n - 3)
      System.arraycopy(input, 0, out, 8, n)
      out
    }
  }
}

/** Native Catalyst expression: string → salted binary key. Participates in
  * whole-stage codegen (doGenCode emits a direct static call, no
  * CodegenFallback), null-safe, deterministic — the preferred shape for a
  * hot-path scalar per SURVEY.md §4.
  */
case class SaltedKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"salted_key requires a string argument, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    SaltedKeyImpl.compute(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SaltedKeyImpl.compute($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): SaltedKey = copy(child = newChild)
  override def prettyName: String = "salted_key"
}

object SaltedKey {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API (Spark 4 column-node bridge). */
  def salted_key(c: Column): Column =
    ColumnBridge.column(SaltedKey(ColumnBridge.expression(c)))

  /** SQL registration: SELECT salted_key(col). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "salted_key", exprs => SaltedKey(exprs.head), "built-in")
}
