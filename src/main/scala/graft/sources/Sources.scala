package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout sources: bucketed tables for shuffle-free co-located
  * joins and folds.
  *
  * The CDC fold, diff, and latest-upsert all shuffle on the PK. If the
  * change log lands bucketed by PK at write time (the reference's channels
  * already partition the PK space — bucketing is the lake equivalent),
  * every downstream PK-keyed operator reads the distribution off the
  * storage layout and skips its shuffle entirely. At 100 TB this converts
  * the dominant recurring cost (re-shuffling the log per query) into a
  * one-time write-side cost.
  *
  * Works with the in-memory catalog (datasource bucketing, no Hive).
  */
object Sources {

  /** Write `df` as a bucketed+sorted managed table keyed on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucketing metadata intact). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` hive-partitioned by `cols` (directory per value combo).
    * The lake layout for a CDC change log: partition by (channel, day) and
    * every checkpoint-tail read ([[graft.cdc.Cdc.msgCount]]-shaped) prunes
    * to the partitions past the checkpoint instead of scanning history —
    * at 100 TB, partition pruning is the difference between reading a day
    * and reading a year.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Read a partitioned layout back; partition-column filters become
    * PartitionFilters (no data files opened for pruned partitions).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a change log as JSON lines — the wire format CDC streams
    * commonly arrive in (one JSON object per change). Timestamps serialize
    * as ISO-8601 with full microsecond precision so a JSON round trip is
    * lossless for the CDC fold semantics.
    */
  def writeJsonLog(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  /** Read a JSON-lines change log with an EXPLICIT schema — never infer:
    * schema inference scans the whole input once before the real job (a
    * full extra pass at 100 TB) and can silently widen types between runs.
    * Every downstream operator then works unchanged: the engine is
    * source-format agnostic past the scan.
    */
  def readJsonLog(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      // FAILFAST: the default PERMISSIVE mode turns a malformed line into
      // an all-null row — a phantom change event silently entering the
      // fold. A corrupt change log must fail loudly, not drift.
      .option("mode", "FAILFAST")
      .json(path)
}
