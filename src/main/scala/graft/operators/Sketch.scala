package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch suite — the approximate answers that replace exact aggregation at
  * 100 TB. Exact distinct counts and exact percentiles need
  * memory-proportional state per group; HyperLogLog++ and the
  * percentile_approx quantile sketch are constant-space, mergeable
  * (map-side combinable), and bounded-error.
  *
  * Correctness contract: sketch INTERNALS differ across engines by design,
  * so the value-level oracle asserts the published ERROR BOUND instead —
  * each op emits its exact counterpart (recomputable in SQL) plus a boolean
  * verdict `|estimate − exact| ≤ bound`, where the bound is a deterministic
  * function of the exact value. The DuckDB oracle recomputes the exact side
  * and states the verdict as TRUE: a sketch drifting outside its guarantee
  * flips the boolean and fails the row hash. The estimates themselves stay
  * available on the *Raw variants.
  */
object Sketch {
  import graft.Tables.events

  /** 6-sigma relative bound as ceil(exact · pct/100) in PURE INTEGER math
    * — `(n·pct + 99) DIV 100` via SQL DIV (Column `/` is double division,
    * which would break floor semantics past 2^53) — so Spark and the
    * DuckDB oracle can never disagree on a float-rounding boundary. pct
    * derives from the sketch's configured error (ceil'd conservative), so
    * non-default rsd/lgK calls get matching verdicts. The small-count
    * floor covers the regime where the relative bound rounds to ~0 but
    * the estimator is integer-granular. round (not ceil) when quantizing
    * the rate: ceil would bump 12.000000000000002 (the double for
    * 6·0.02·100) to 13 and diverge from the oracle's literal 12.
    */
  private def relBound(exactCol: String, relError: Double, floor: Long): Column = {
    val pct = math.round(relError * 100)
    expr(s"greatest(CAST(($exactCol * $pct + 99) DIV 100 AS BIGINT), ${floor}L)")
  }

  /** HLL++ distinct users per event type with the exact count alongside —
    * raw estimates, for consumers that want the sketch output itself.
    */
  def approxDistinctRaw(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("cnt"))

  /** Bound-asserting form: emits (exact, cnt, bound, approx_ok) where
    * approx_ok ⟺ |approx − exact| ≤ bound — the oracle-checkable statement
    * of the HLL++ guarantee.
    */
  def approxDistinct(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame = {
    val bound = relBound("exact_users", 6.0 * rsd, 4L) // 12% at the default rsd
    approxDistinctRaw(spark, dir, rsd)
      .select(col("event_type"), col("exact_users"), col("cnt"),
        bound.as("bound"),
        (abs(col("approx_users") - col("exact_users")) <= bound).as("approx_ok"))
  }

  /** Rank-error bracket half-width for the quantile verdicts: the
    * percentile_approx (KLL-style) guarantee is rank error ≤ 1/accuracy;
    * the bracket gives 50× slack (0.005 at the default accuracy — p50
    * must land inside the exact [p49.5, p50.5] value bracket), capped at
    * 0.01 so p99 + eps stays a valid quantile for low-accuracy calls.
    */
  private def quantileEps(accuracy: Int): Double = math.min(50.0 / accuracy, 0.01)

  /** Quantile sketch of `value` per event type (p50/p95/p99) with the exact
    * interpolated percentiles AND the exact bracket endpoints at q ± eps in
    * one exact-percentile pass. `accuracy` trades memory for error exactly
    * like a cluster deployment would tune it.
    */
  def valueQuantilesRaw(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame = {
    val qs = Seq(0.5, 0.95, 0.99)
    val eps = quantileEps(accuracy)
    val brackets = qs.flatMap(q => Seq(q - eps, q, q + eps))
    val exactArr = s"percentile(value, array(${brackets.mkString(", ")}))"
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), array(qs.map(lit): _*), lit(accuracy)).as("aq"),
        expr(exactArr).as("eq"),
        count(lit(1)).as("cnt"))
  }

  /** Bound-asserting form: per quantile q emits the exact value (rounded
    * like every other double column) and ok_q ⟺ the sketch's answer lies in
    * the exact [q−eps, q+eps] value bracket. The brackets are computed
    * in-engine (no cross-engine float comparison); only exacts and booleans
    * are emitted, so DuckDB restates them with quantile_cont — which uses
    * the same (n−1)·q linear interpolation as Spark's percentile.
    */
  def valueQuantiles(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame = {
    val base = valueQuantilesRaw(spark, dir, accuracy)
    // eq layout: [q-eps, q, q+eps] per quantile, aq: one slot per quantile.
    def ok(i: Int) = (col("aq").getItem(i) >= col("eq").getItem(3 * i) &&
      col("aq").getItem(i) <= col("eq").getItem(3 * i + 2))
    def exact(i: Int) = round(col("eq").getItem(3 * i + 1), 4)
    base.select(
      col("event_type"), col("cnt"),
      exact(0).as("exact_p50"), exact(1).as("exact_p95"), exact(2).as("exact_p99"),
      ok(0).as("ok_p50"), ok(1).as("ok_p95"), ok(2).as("ok_p99"))
  }

  /** Two-level mergeable distinct-count: per-channel DataSketches HLL
    * sketches, union-merged to one corpus-wide estimate — THE 100 TB
    * aggregation pattern (leaf sketches computed where the data lives, a
    * constant-size merge at the top; re-aggregation without re-scanning).
    */
  def hllMergeRaw(spark: SparkSession, dir: String, lgConfigK: Int = 12): DataFrame = {
    val ev = events(spark, dir)
    val perChannel = ev
      .groupBy(pmod(col("user_id"), lit(graft.cdc.Cdc.NumChannels)).as("channel"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("sk"))
    val merged = perChannel.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_users"),
      count(lit(1)).as("n_channels"))
    merged.crossJoin(ev.agg(countDistinct(col("user_id")).as("exact_users")))
  }

  /** Bound-asserting form: 6-sigma of the lgK=12 union RSE
    * (1.04/√2¹² ≈ 1.63% ⇒ 6σ < 10%); approx_ok ⟺ the merged estimate
    * honors it against the exact distinct recomputed from the raw stream.
    */
  def hllMerge(spark: SparkSession, dir: String, lgConfigK: Int = 12): DataFrame = {
    // 6σ of the union RSE 1.04/√2^lgK — 6·1.04/64 = 9.75% at the default;
    // basis points so the integer bound stays exact: ceil(n·bp / 10000).
    val bp = math.round(6.0 * 1.04 / math.sqrt((1L << lgConfigK).toDouble) * 10000)
    val bound = expr(s"greatest(CAST((exact_users * $bp + 9999) DIV 10000 AS BIGINT), 16L)")
    hllMergeRaw(spark, dir, lgConfigK)
      .select(col("n_channels"), col("exact_users"), bound.as("bound"),
        (abs(col("approx_users") - col("exact_users")) <= bound).as("approx_ok"))
  }
}
