package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for equi-joins: replicate the small side `factor`
  * times with a salt column and salt the big side by a deterministic
  * hash — hot keys spread over `factor` reducers instead of one.
  *
  * AQE's skew-join splitting covers sort-merge joins automatically; this
  * helper is for the cases AQE can't touch (broadcast-ineligible dims
  * with pathological hot keys, aggregations-after-join pipelines) and as
  * an explicit, testable statement of the technique for 100-TB runs.
  */
object Salting {

  /** Inner equi-join of `big` and `small` on `key`, salted `factor` ways.
    * Result columns = big.* ++ (small.* minus key). */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    val out = saltedBig.join(replicatedSmall, Seq(key, "__salt"), "inner").drop("__salt")
    out
  }

  /** Salted two-phase aggregation for hot grouping keys: partial aggregate
    * on (key, salt), then final aggregate on key. `partial` and `merge`
    * must form an associative pair (e.g. count/sum -> sum). */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
}
