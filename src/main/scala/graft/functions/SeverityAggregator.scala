package graft.functions

import graft.model.{Finding, Severity}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed severity roll-up (SURVEY.md §2.10): the reference's weighted
  * severity fold (`api/report/ComplexReport.java` — critical*9 +
  * normal*3 + low vs 10/7/2) as an `Aggregator[Finding, Counts, String]`,
  * usable on `Dataset[Finding].groupByKey(...).agg(SeverityAggregator.toColumn)`.
  *
  * The buffer is a flat case class so the aggregation stays columnar and
  * map-side combinable — the typed twin of the untyped roll-up in
  * ReportOps.severityRollup.
  */
object SeverityAggregator extends Aggregator[Finding, SeverityCounts, String] {

  override def zero: SeverityCounts = SeverityCounts(0L, 0L, 0L)

  override def reduce(b: SeverityCounts, f: Finding): SeverityCounts = f.severity match {
    case Severity.Critical => b.copy(nCritical = b.nCritical + 1)
    case Severity.Normal => b.copy(nNormal = b.nNormal + 1)
    case Severity.Low => b.copy(nLow = b.nLow + 1)
    case _ => b
  }

  override def merge(a: SeverityCounts, b: SeverityCounts): SeverityCounts =
    SeverityCounts(a.nCritical + b.nCritical, a.nNormal + b.nNormal, a.nLow + b.nLow)

  override def finish(b: SeverityCounts): String =
    Severity.rollup(b.nCritical, b.nNormal, b.nLow)

  override def bufferEncoder: Encoder[SeverityCounts] = Encoders.product[SeverityCounts]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

case class SeverityCounts(nCritical: Long, nNormal: Long, nLow: Long)
