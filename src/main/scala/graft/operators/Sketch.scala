package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch suite — the approximate answers that replace exact aggregation at
  * 100 TB. Exact distinct counts and exact percentiles need
  * memory-proportional state per group; HyperLogLog++ and the
  * percentile_approx quantile sketch are constant-space, mergeable
  * (map-side combinable), and bounded-error. Both are spec-verified against
  * their exact counterparts (no SQL oracle: sketch internals differ across
  * engines by design).
  */
object Sketch {
  import graft.Tables.events

  /** HLL++ distinct users per event type, with the exact count alongside —
    * the spec bounds the relative error at the configured rsd.
    */
  def approxDistinct(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("cnt"))

  /** Quantile sketch of `value` per event type (p50/p95/p99), exact
    * percentiles alongside for the spec's error bound. `accuracy` trades
    * memory for error exactly like a cluster deployment would tune it.
    * Output is all-scalar columns (no arrays) so the driver's row-sorting
    * compare can hash it.
    */
  def valueQuantiles(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame = {
    val qs = events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)),
          lit(accuracy)).as("aq"),
        expr("percentile(value, array(0.5, 0.95, 0.99))").as("eq"),
        count(lit(1)).as("cnt"))
    qs.select(
      col("event_type"),
      round(col("aq").getItem(0), 4).as("approx_p50"),
      round(col("aq").getItem(1), 4).as("approx_p95"),
      round(col("aq").getItem(2), 4).as("approx_p99"),
      round(col("eq").getItem(0), 4).as("exact_p50"),
      round(col("eq").getItem(1), 4).as("exact_p95"),
      round(col("eq").getItem(2), 4).as("exact_p99"),
      col("cnt"))
  }

  /** Two-level mergeable distinct-count: per-channel DataSketches HLL
    * sketches, union-merged to one corpus-wide estimate — THE 100 TB
    * aggregation pattern (leaf sketches computed where the data lives, a
    * constant-size merge at the top; re-aggregation without re-scanning).
    * Exact distinct alongside for the spec's error bound.
    */
  def hllMerge(spark: SparkSession, dir: String, lgConfigK: Int = 12): DataFrame = {
    val ev = events(spark, dir)
    val perChannel = ev
      .groupBy(pmod(col("user_id"), lit(graft.cdc.Cdc.NumChannels)).as("channel"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("sk"))
    val merged = perChannel.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_users"),
      count(lit(1)).as("n_channels"))
    merged.crossJoin(ev.agg(countDistinct(col("user_id")).as("exact_users")))
  }
}
