package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection / redaction — the scrubbing pass a training-data
  * pipeline runs before anything leaves the raw zone.
  *
  * The detectors are plain anchored regexes evaluated per row (fully
  * codegen'd `RLike`/`RegExpReplace` — no UDFs), so the pass is a single
  * narrow projection: no shuffle, scales linearly, and pushes the
  * upstream column prune into the parquet scan.
  *
  * The synthetic fixtures carry no real PII, so the oracled query first
  * derives a deterministic contact string (name + formatted pseudo-phone
  * + pseudo-email built from key columns) and then runs the real
  * detector/redactor over it — the regex surface is exercised on
  * guaranteed-nonzero matches at every scale factor.
  */
object PrivacyOps {

  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"

  /** Deterministic contact-log line per customer (synthetic PII carrier). */
  def contactLog(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      concat(
        col("c_name"), lit(" ph "),
        format_string("%03d-%03d-%04d",
          col("c_nationkey"), pmod(col("c_custkey"), lit(1000L)),
          pmod(col("c_custkey") * 7, lit(10000L))),
        lit(" email "),
        lower(regexp_replace(col("c_name"), "#", "")), lit("@example.com"),
        lit(" segment "), col("c_mktsegment")).as("contact"))

  /** Match counts + redacted text. Emails are redacted before phones so
    * digit runs inside addresses can't double-count. */
  def piiRedact(customer: DataFrame): DataFrame = {
    def nMatches(c: Column, re: String): Column = size(regexp_extract_all(c, lit(re), lit(0)))
    contactLog(customer).select(
      col("c_custkey"),
      nMatches(col("contact"), PhoneRe).as("n_phone"),
      nMatches(col("contact"), EmailRe).as("n_email"),
      regexp_replace(
        regexp_replace(col("contact"), EmailRe, "<email>"),
        PhoneRe, "<tel>").as("redacted"))
  }
}

object PrivacyPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_redact" -> ((s, d) => PrivacyOps.piiRedact(Tables.customer(s, d)))
  )

  override def oracles: Map[String, String] = Map(
    "pii_redact" ->
      """WITH cl AS (
        |  SELECT c_custkey,
        |         c_name || ' ph ' ||
        |         printf('%03d-%03d-%04d', c_nationkey, c_custkey % 1000, (c_custkey * 7) % 10000) ||
        |         ' email ' || lower(replace(c_name, '#', '')) || '@example.com' ||
        |         ' segment ' || c_mktsegment AS contact
        |  FROM customer
        |)
        |SELECT c_custkey,
        |       CAST(len(regexp_extract_all(contact, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone,
        |       CAST(len(regexp_extract_all(contact, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INT) AS n_email,
        |       regexp_replace(regexp_replace(contact, '[a-z0-9]+@[a-z]+\.[a-z]+', '<email>', 'g'),
        |                      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<tel>', 'g') AS redacted
        |FROM cl""".stripMargin
  )
}
