package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core — the scalar-query surface a Milvus user has (filtered
  * scans, top-k) plus the analytics engine basics. All declarative Column
  * code: Catalyst handles pushdown/pruning/broadcast; AQE re-plans at runtime.
  *
  * Float aggregates are round(_, 4)-ed so summation order (Spark partial
  * aggs vs DuckDB single-threaded) can't produce ulp drift in the oracle
  * hash compare.
  */
object Relational {
  import graft.Tables._

  /** Order-independent money sum: per-row doubles cast to DECIMAL(28,6)
    * before summing. Inputs are exact 2-decimal values and their products
    * exact 4-decimal, so the double sits ~1e-11 from the true value while
    * the 6-decimal rounding boundary is 5e-7 away - Spark and DuckDB cast
    * identically, the decimal sum is exact (order-independent), and the
    * final double round(_, 4) is unambiguous. Plain double sums drift in
    * the 4th decimal once the sum reaches ~5e10 (caught by the 10x
    * scale cross-check; summation order differs between Spark partials
    * and DuckDB).
    */
  private def moneySum(c: Column): Column =
    round(sum(c.cast("decimal(28,6)")).cast("double"), 4)

  /** Grouped aggregation with map-side partials (TPC-H Q1 shape).
    * Scale: one shuffle on the (tiny-cardinality) group key; partial
    * aggregation reduces each map task's output to a handful of rows.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** 3-way join + agg + top-k (TPC-H Q3 shape). Customer side is small →
    * broadcast; the orders↔lineitem join shuffles on orderkey. Top-k via
    * sort+limit compiles to TakeOrderedAndProject (per-partition partial
    * top-k, no global sort).
    */
  def q3JoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Multi-way star join with broadcast dims (TPC-H Q5 shape).
    * region/nation/supplier are broadcast (tiny); the big fact joins shuffle
    * on their keys once each; AQE picks broadcast automatically below the
    * threshold — we force it for the guaranteed-small dims.
    */
  def q5StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val asia = region(spark, dir).filter(col("r_name") === "ASIA").select("r_regionkey")
    val nat = nation(spark, dir).join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey")
    val li = lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Top-k per group via salted two-phase windows. A single
    * `Window.partitionBy(o_orderpriority)` caps parallelism at the group
    * count (5) — each task sorts a fifth of the table at any data size.
    * Phase 1 takes the per-(group, salt) top-k in parallel (salt =
    * pmod(orderkey, 64)); phase 2 re-ranks the surviving groupCount×64×k
    * candidate rows — trivially small — for the exact same answer. This is
    * the salting pattern for skewed/low-cardinality window keys.
    */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salts = 64
    val ord = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val wSalted = Window.partitionBy(col("o_orderpriority"), pmod(col("o_orderkey"), lit(salts)))
      .orderBy(ord: _*)
    val wFinal = Window.partitionBy(col("o_orderpriority")).orderBy(ord: _*)
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("srk", row_number().over(wSalted))
      .filter(col("srk") <= 3)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        row_number().over(wFinal).cast("long").as("rk"))
      .filter(col("rk") <= 3)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 4).as("o_totalprice"), col("rk"))
  }

  /** Predicate + projection pushdown (TPC-H Q6 shape). The filter and the
    * 3-column projection must reach the parquet scan (PushedFilters /
    * ReadSchema) — at 100 TB this is the difference between reading 3
    * columns of a year and the whole table.
    */
  def qScalarFilter(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** Exact distinct counting per group — two-phase (partial distinct
    * map-side under Spark's expand/agg planning).
    */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 4).as("total_value"))

  /** Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (each partition
    * keeps k rows, driver merges k*numPartitions — no full sort/shuffle).
    */
  def qTopkOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** Event sessionization: split each user's event sequence at gaps >
    * `gapMinutes`, then aggregate per user — the canonical event-stream
    * feature op. Session ids = running count of gap-starts (lag + cumsum
    * windows, both keyed on user_id so parallelism scales with users, the
    * natural 100 TB partitioning; no global sort).
    */
  def qSessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val sessions = events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    sessions.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("s_start"), max(col("us")).as("s_end"))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events"),
        max(col("s_end") - col("s_start")).as("max_session_us"))
  }

  /** Pivot: event counts reshaped to one column per channel — the OLAP
    * crosstab. Expressed as conditional aggregation (not the DataFrame
    * `pivot()` API, which collects distinct keys to the driver first):
    * with a KNOWN key set this is one shuffle, no driver round-trip.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val byChannel = (c: Int) =>
      count(when(pmod(col("user_id"), lit(graft.cdc.Cdc.NumChannels)) === c, lit(1))).as(s"ch$c")
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(byChannel(0), (1 until 4).map(byChannel) :+
        round(sum(col("value")), 4).as("total_value"): _*)
  }

  /** Rollup: (event_type, channel) counts with per-type subtotals and a
    * grand total — GROUPING SETS aggregation, one expand + one shuffle.
    * Grouping-null markers are coalesced to 'ALL' / -1 so the output has
    * no NULL group keys (and the oracle compares cleanly).
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), pmod(col("user_id"), lit(graft.cdc.Cdc.NumChannels)).as("channel"), col("value"))
      .rollup(col("event_type"), col("channel"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("channel"), lit(-1L)).as("channel"),
        col("cnt"), col("total_value"))

  /** JSON-field query — Milvus dynamic/JSON fields (`props["k"] >= v`
    * filter expressions). Path extraction + predicate + grouped agg; the
    * JSON parse is a narrow codegen'd map, the agg one shuffle.
    * At 100 TB the lever is extracting ONCE into a typed column before any
    * reuse (done here), or materializing hot paths at ingest.
    */
  def qJsonField(spark: SparkSession, dir: String): DataFrame =
    // Parse DISTINCT payloads, not rows. get_json_object costs ~2 µs/call
    // (a Jackson parser per row) and the corpus ships as one parquet row
    // group, so the row-level parse ran on ONE core — the worst 10x/0.1
    // scaling ratio in the suite (5.2×; 1.9-3.0 s of the op's 2.3 s at
    // 10x was the serial parse — ProbeJson). Aggregating to
    // (event_type, props) first parses each distinct payload once and
    // map-side partials keep the exchange small; with high-cardinality
    // payloads this degrades to exactly the parse-after-shuffle shape (a
    // round-robin spread was measured: only 1.6× better — the payload
    // shuffle write is serial too), so the rewrite dominates at every
    // cardinality. Equivalence: cnt/max are distributive; avg over longs
    // sums exactly in double (k < 2^53), so the weighted form is
    // bit-identical. Measured: sf0.1 0.45 → 0.25 s, 10x 2.34 → 0.42 s.
    events(spark, dir)
      .groupBy(col("event_type"), col("props")).agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("c"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") >= 50)
      .groupBy(col("event_type"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("cnt"),
        round(sum(col("k").cast("double") * col("c").cast("double")) /
          sum(col("c")).cast("double"), 4).as("avg_k"),
        max(col("k")).as("max_k"))

  /** Deterministic stratified train/val/test split — the dataset-sharding
    * primitive a training pipeline needs: every row lands in the same split
    * on every run and every engine, with NO stored split column, via a
    * Knuth multiplicative hash of the key (`(key × 2654435761) mod 2³²`)
    * bucketed to 0..999 → train <800 / val <900 / test.
    *
    * The product is computed EXACTLY in int64 by splitting the multiplier
    * at 16 bits: with lo = key mod 2³², C = c1·2¹⁶ + c0,
    * (key·C) mod 2³² = (lo·c0 + (lo·c1 mod 2¹⁶)·2¹⁶) mod 2³² and every
    * intermediate stays < 2⁴⁸ — no wrap for ANY int64 key (the naive
    * product silently wrapped for keys ≳ 3.5·10⁹ in non-ANSI Spark while
    * the oracle errored, diverging the split; a DECIMAL formulation is
    * exact too but costs ~2× scan time). The returned audit proves the
    * split: per (o_orderstatus, split) row counts and exact DECIMAL money
    * sums, so strata proportions are visible per class.
    *
    * Scale: the split assignment is a pure narrow map over the scan (no
    * sampling pass, no RNG state, no shuffle); the audit is one grouped agg
    * on a tiny key. Selecting one split at 100 TB is `WHERE bucket < k` —
    * a scan-level filter that composes with partition pruning, unlike
    * `df.randomSplit` which is neither deterministic across runs nor
    * pushdown-able.
    */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    // 2654435761 = 40503·2¹⁶ + 31153; see the scaladoc for the exactness
    // argument (every intermediate < 2⁴⁸ — pure int64, no wrap). The
    // power-of-two reductions are BITMASKS, not pmods: for a modulus 2^k,
    // two's-complement masking (x & (2^k−1)) equals the positive residue
    // for EVERY long, negative keys included, and costs an AND instead of
    // a division each (three divisions per row measured as the r11→r12
    // regression 0.26→0.67 s at sf0.1). The final mod 1000 keeps its
    // division (not a power of two) on an already-non-negative operand.
    val lo = col("o_orderkey").bitwiseAND(lit(4294967295L))
    val bucket = (lo * lit(31153L) + (lo * lit(40503L)).bitwiseAND(lit(65535L)) * lit(65536L))
      .bitwiseAND(lit(4294967295L))
      .mod(lit(1000L))
    val split = when(bucket < 800, lit("train"))
      .when(bucket < 900, lit("val")).otherwise(lit("test"))
    orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice"), split.as("split"))
      .groupBy(col("o_orderstatus"), col("split"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
  }
}
