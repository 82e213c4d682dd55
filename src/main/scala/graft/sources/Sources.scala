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
}
