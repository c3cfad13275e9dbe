package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries plus their DuckDB oracles.
  * SparkEntry aggregates all packs; names must be globally unique.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB SQL equivalent per query name; omit a name for ops that are
    * not SQL-expressible (driver falls back to a rows-only check). */
  def oracles: Map[String, String]
}
