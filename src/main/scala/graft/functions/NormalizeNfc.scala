package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * web-scrape pipeline runs before dedup/fingerprinting: visually
  * identical strings arrive in mixed forms (precomposed `é` U+00E9 vs
  * decomposed `e`+U+0301), and every downstream equality — exact dedup
  * keys, shingles, vocab counts, BM25 terms — silently fragments until
  * the corpus is canonicalized. UAX #15 NFC via `java.text.Normalizer`,
  * which both the JVM and DuckDB's `nfc_normalize` implement from the
  * same Unicode tables — hence oracle-able byte-for-byte.
  *
  * The quick-check fast path ([[Normalizer.isNormalized]]) skips the
  * allocation for already-normal text — the overwhelmingly common case
  * at corpus scale, so the hot path is a scan over the bytes, not a
  * rebuild. */
object NormalizeNfcImpl {
  /** Static (JVM-level) so generated code can call it directly. */
  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression: string → NFC-normalized string. Whole-stage
  * codegen (direct static call, no CodegenFallback), null-safe,
  * deterministic — the [[SaltedKey]] shape. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc requires a string argument, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    NormalizeNfcImpl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfcImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
  override def prettyName: String = "nfc"
}

object NormalizeNfc {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API (Spark 4 column-node bridge). */
  def nfc(c: Column): Column =
    ColumnBridge.column(NormalizeNfc(ColumnBridge.expression(c)))
}
