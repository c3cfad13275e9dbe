package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for per-doc COMPUTE pipelines (codec decode,
  * perceptual hashing, fingerprinting).
  *
  * The fixture corpora are single-file, single-ROW-GROUP parquet, so a
  * bare `documents` scan plans exactly ONE task no matter how small
  * `spark.sql.files.maxPartitionBytes` is (byte-range splits cannot cut
  * inside a row group) — and a `mapPartitions` decode chain downstream
  * of it runs on one core of local[32] while 31 idle. Measured on
  * `video_phash` at sf0.1: the whole 4.1 s query was one task.
  *
  * [[spread]] round-robins the narrow id projection out to the
  * session's default parallelism BEFORE the per-doc work. The exchange
  * carries 8-byte ids, never payloads — media bytes are constructed /
  * decoded AFTER the exchange, so this is the §8 "decide with small
  * rows, move big rows once" shape with zero payload moves. An input
  * that already plans >= defaultParallelism partitions (a real
  * many-file corpus at cluster scale) passes through untouched: the
  * helper only ever widens, so it is scale-adaptive rather than a
  * local[32] constant.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
