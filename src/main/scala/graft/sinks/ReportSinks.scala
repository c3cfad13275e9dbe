package graft.sinks

import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import graft.model.{Finding, FixDestination}
import org.apache.spark.sql.Dataset

/** O-10 report sinks (reference `api/report/ReportBuilder.java:49-161`,
  * `api/report/FullReport.java:38-67`, `api/report/PartialReport.java:44-76`):
  * console pretty-print, an HTML table file `report-<ts>.html`, a fix log
  * grouped by destination, and a runnable `fix-cluster-<ts>.sh` that wraps
  * HBASE_SHELL commands in `echo "..." | hbase shell`.
  *
  * These are driver-side renderings of a collected finding set — the one
  * place the engine intentionally leaves dataflow (report files are tiny;
  * the heavy lifting happened in the reporters).
  */
object ReportSinks {

  private val TsFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  def timestampName(epochMillis: Long): String = TsFmt.format(Instant.ofEpochMilli(epochMillis))

  /** HTML-escape a cell value: object names / problems / commands are
    * cluster-derived strings and must not inject markup. */
  private[sinks] def escHtml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&#39;"
      case c => c.toString
    }

  /** Single-quote shell quoting (`'` → `'\''`): safe against `"`, `$`,
    * backticks, and every other metacharacter in cluster-derived names. */
  private[sinks] def shQuote(s: String): String =
    "'" + s.replace("'", "'\\''") + "'"

  /** Console rendering (severity-grouped, aligned columns). */
  def renderConsole(findings: Seq[Finding]): String = {
    val bySev = findings.groupBy(_.severity)
    val order = Seq("CRITICAL", "NORMAL", "LOW", "NONE")
    order.filter(bySev.contains).map { sev =>
      val rows = bySev(sev).map(f => f"  ${f.eventType}%-14s ${f.objectName}%-24s ${f.problem}")
      s"[$sev]\n" + rows.mkString("\n")
    }.mkString("\n")
  }

  /** HTML table rendering (reference emits `report-<ts>.html`). */
  def renderHtml(findings: Seq[Finding]): String = {
    val rows = findings.map { f =>
      s"<tr><td>${escHtml(f.severity)}</td><td>${escHtml(f.eventType)}</td><td>${escHtml(f.objectName)}</td>" +
        s"<td>${escHtml(f.problem)}</td><td>${escHtml(f.command)}</td></tr>"
    }.mkString("\n")
    s"""<html><body><table border="1">
       |<tr><th>severity</th><th>type</th><th>object</th><th>problem</th><th>fix</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }

  /** Resolution script: HBASE_SHELL fixes become runnable lines
    * `echo "<cmd>" | hbase shell`; SHELL fixes run verbatim; ADVICE goes
    * into comments. */
  def renderFixScript(findings: Seq[Finding]): String = {
    val lines = findings.flatMap { f =>
      f.fixDestination match {
        // single-quote the piped command: region/table names may contain
        // ", $, backticks — double quotes would break or inject
        case FixDestination.HBaseShell => Some(s"""echo ${shQuote(f.command)} | hbase shell""")
        // Shell fixes are themselves shell commands (run verbatim is the
        // semantics); reporters must construct them from quoted fragments
        case FixDestination.Shell => Some(f.command)
        case FixDestination.Advice => Some(s"# advice: ${f.command.replace("\n", "\n# ")}")
        case _ => None
      }
    }
    ("#!/usr/bin/env bash" +: lines).mkString("\n") + "\n"
  }

  /** Write all sink artifacts for a finding set; returns the paths. */
  def writeAll(findings: Dataset[Finding], outDir: String, epochMillis: Long): Seq[String] = {
    val collected = findings.collect().toSeq
    val ts = timestampName(epochMillis)
    Files.createDirectories(Paths.get(outDir))
    val html = s"$outDir/report-$ts.html"
    val sh = s"$outDir/fix-cluster-$ts.sh"
    val log = s"$outDir/resolutions-$ts.log"
    Files.writeString(Paths.get(html), renderHtml(collected))
    Files.writeString(Paths.get(sh), renderFixScript(collected))
    Files.writeString(Paths.get(log),
      collected.groupBy(_.fixDestination).map { case (d, fs) =>
        s"[$d]\n" + fs.map(_.command).mkString("\n")
      }.mkString("\n\n"))
    Seq(html, sh, log)
  }
}
