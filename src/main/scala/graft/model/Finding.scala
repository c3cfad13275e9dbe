package graft.model

/** D5 report-event row (reference `api/report/SingleEvent.java:3-46`,
  * enums `api/report/EventType.java`, `api/report/Severity.java`,
  * `api/report/FixDestination.java`). Severity/destination are strings,
  * not Scala enums, so the Dataset encoder stays columnar-friendly.
  */
case class Finding(
    eventType: String,   // REGION | TABLE | NAMESPACE | SNAPSHOT | REGION_SERVER | CLUSTER
    objectName: String,
    problem: String,
    severity: String,    // CRITICAL | NORMAL | LOW | NONE
    fixDestination: String, // SHELL | HBASE_SHELL | ADVICE | NONE
    command: String)

object Severity {
  val Critical = "CRITICAL"
  val Normal = "NORMAL"
  val Low = "LOW"
  val None = "NONE"

  /** Cluster roll-up score (reference `api/report/ComplexReport.java`
    * default: critical*9 + normal*3 + low vs 10/7/2). */
  def rollup(nCritical: Long, nNormal: Long, nLow: Long): String = {
    val score = nCritical * 9 + nNormal * 3 + nLow
    if (score > 10) Critical else if (score > 7) Normal else if (score > 2) Low else None
  }
}

object EventType {
  val Region = "REGION"; val Table = "TABLE"; val Namespace = "NAMESPACE"
  val Snapshot = "SNAPSHOT"; val RegionServer = "REGION_SERVER"; val Cluster = "CLUSTER"
}

object FixDestination {
  val Shell = "SHELL"; val HBaseShell = "HBASE_SHELL"; val Advice = "ADVICE"; val None = "NONE"
}
