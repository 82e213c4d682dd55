package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC semantics re-expressed from the reference (milvus-cdc).
  *
  * Stream mapping over the `events` table: PK = `user_id`, logical TS =
  * `ts`, channel = `pmod(user_id, 4)` (channels partition the PK space,
  * like Milvus vchannels), upsert = event_type ∈ {view,click,purchase,
  * signup}, delete-tombstone = event_type = 'error'.
  *
  * Reference semantics mirrored (file:line cites in each op):
  * - state fold / ValidData: server/tool/data_diff/main.go:160-175
  * - replica diff: server/tool/data_diff/main.go:104-143
  * - watermark (min across channels): core/reader/ts_manager.go:162-216
  * - data barrier: core/reader/data_barrier.go:27-60
  * - msg counting from a position: server/tool/msg_count/main.go
  *
  * Scale posture: every op is a single hash shuffle on its natural key
  * (PK or channel) with map-side partial aggregation; channel-level results
  * are 4 rows, so the driver-side reduce is trivial at any data size.
  */
object Cdc {
  import graft.Tables.events

  /** Channel cardinality (channel = pmod(user_id, NumChannels)). Default 4
    * mirrors the testdata's pinned hash and every oracle SQL statement
    * (`user_id % 4`); `SPARK_GRAFT_CHANNELS` overrides it for SCALE
    * MEASUREMENTS ONLY — the per-channel in-order folds (msgpack packing,
    * position logs, seek) parallelize exactly with channel cardinality
    * (production Milvus runs hundreds of vchannels), so a wide-channel
    * bench run measures that scaling on the same event volume. Never set
    * it for a correctness (oracle) run: the SQL states the 4-channel rule.
    */
  val NumChannels: Int =
    sys.env.get("SPARK_GRAFT_CHANNELS").map(_.toInt).getOrElse(4)
  // Control-plane surrogate cardinalities, shared by the batch ops, the
  // streaming variants, and (by value) the oracle SQL: tasks map 1:1 onto
  // their watched channel; collections are keyed coprime with the channel
  // hash so each collection spans all channels.
  val NumTasks = 3
  val NumCollections = 3
  val Checkpoint = "2024-01-20"

  private def isDelete: Column = col("event_type") === "error"

  /** Per-PK insert/delete fold → alive rows, i.e. the reference's
    * ValidData: alive iff max(upsert_ts) >= max(delete_ts), absent side =
    * -inf (data_diff/main.go:160-175). One shuffle on user_id, partial
    * max/count map-side.
    */
  def stateSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.groupBy(col("user_id"))
      .agg(
        max(when(!isDelete, col("ts"))).as("last_upsert_ts"),
        max(when(isDelete, col("ts"))).as("last_delete_ts"),
        count(when(!isDelete, lit(1))).as("upserts"),
        count(when(isDelete, lit(1))).as("deletes"))
      .withColumn("channel", pmod(col("user_id"), lit(NumChannels)))
      .filter(col("last_upsert_ts").isNotNull &&
        (col("last_delete_ts").isNull || col("last_upsert_ts") >= col("last_delete_ts")))
      .select("user_id", "channel", "last_upsert_ts", "last_delete_ts", "upserts", "deletes")
  }

  /** Last-write-wins latest upsert per PK (the materialized row a target
    * replica holds after replay). Deterministic tiebreak on event_id.
    *
    * max_by on a (ts, event_id) struct instead of a row_number window: the
    * argmax folds map-side (partial aggregation), so only one row per PK per
    * map task reaches the shuffle — a window would shuffle and sort the
    * ENTIRE stream. At 100 TB that is the op's whole cost.
    */
  def latestUpsert(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(!isDelete)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"),
        round(col("m.value"), 4).as("last_value"), col("m.ts").as("last_ts"))

  /** Diff two replicas' folded states: A = full stream, B = prefix up to
    * the checkpoint (a lagged standby). Classification mirrors
    * diffA/diffB in data_diff/main.go:104-143.
    */
  def replicaDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    def fold(df: DataFrame, aliveCol: String): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(when(!isDelete, col("ts"))).as("u"), max(when(isDelete, col("ts"))).as("d"))
        .select(col("user_id"),
          (col("u").isNotNull && (col("d").isNull || col("u") >= col("d"))).as(aliveCol))
    val a = fold(ev, "alive_a")
    val b = fold(ev.filter(col("ts") <= to_timestamp(lit(Checkpoint))), "alive_b")
    a.join(b, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("alive_a"), lit(false)).as("alive_a"),
        coalesce(col("alive_b"), lit(false)).as("alive_b"))
      .withColumn("diff_class",
        when(col("alive_a") && !col("alive_b"), "a_only")
          .when(!col("alive_a") && col("alive_b"), "b_only")
          .when(col("alive_a") && col("alive_b"), "both_alive")
          .otherwise("both_dead"))
      .filter(col("diff_class") =!= "both_alive")
  }

  /** Events per channel after a checkpoint position — msg_count tool:
    * "how many messages from the saved position to the head".
    */
  def msgCount(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("ts") > to_timestamp(lit(Checkpoint)))
      .groupBy(pmod(col("user_id"), lit(NumChannels)).as("channel"))
      .agg(count(lit(1)).as("msgs"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))

  /** Per-channel high watermark + the global replication watermark =
    * min over channels of the channel max TS (ts_manager.GetMinTS:
    * core/reader/ts_manager.go:162-216). 4-row aggregate → the global
    * min is a window over a single tiny partition.
    */
  def channelWatermark(spark: SparkSession, dir: String): DataFrame =
    channelWatermarkFrom(events(spark, dir)
      .select(pmod(col("user_id"), lit(NumChannels)).as("channel"), col("ts")))

  /** Watermark algebra on an arbitrary (channel, ts) stream — exercised
    * directly by the reference-vector spec (ts_manager_test.go:75-101).
    */
  private[graft] def channelWatermarkFrom(ch: DataFrame): DataFrame =
    ch.groupBy(col("channel"))
      .agg(max(col("ts")).as("channel_max_ts"), count(lit(1)).as("channel_cnt"))
      .withColumn("global_watermark",
        min(col("channel_max_ts")).over(Window.partitionBy()))

  /** Data-barrier completion: a DDL stamped at ts T applies only after
    * every channel has delivered a message with ts >= T
    * (core/reader/data_barrier.go:27-60). DDL markers: sampled signup
    * events. barrier_ts = max over channels of the first per-channel
    * crossing. The DDL set is tiny → broadcast; the range condition stays
    * a broadcast-join filter, no shuffle of the event stream.
    */
  def barrierTs(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val ddls = ev.filter(col("event_type") === "signup" && col("event_id") % 500 === 0)
      .select(col("event_id").as("ddl_id"), col("ts").as("ddl_ts"))
    barrierTsFrom(
      ev.select(pmod(col("user_id"), lit(NumChannels)).as("channel"), col("ts")),
      ddls, NumChannels,
      broadcastGrid = gridFits(tsBucketCount(spark, dir, 86400L)
        .map(_ * NumChannels)),
      channels = Some(spark.range(NumChannels).select(col("id").as("channel"))))
  }

  /** Grid-broadcast gate for the bucket-decomposed window ops. The
    * (channel, bucket) grids are usually tiny (channels × time-buckets for
    * barrier/seek, channels × offset-buckets for the ordering audit), but
    * they GROW with the corpus — day buckets with the time span, offset
    * buckets linearly with the event count — so an unconditional hint
    * would eventually push a multi-GB relation at the 8 GB / 512M-row
    * broadcast cap and fail the query outright. The cap here is rows
    * (~50 MB framed), decided from parquet-footer metadata (row count /
    * ts span — no Spark job); above it the hint is dropped and the
    * planner keeps its hash/sort-merge fallback.
    */
  private[graft] val GridBroadcastMaxRows = 2000000L

  private[graft] def gridFits(estimatedRows: Option[Long]): Boolean =
    estimatedRows.exists(_ <= GridBroadcastMaxRows)

  private def maybeBroadcast(df: DataFrame, hint: Boolean): DataFrame =
    if (hint) broadcast(df) else df

  /** Time-bucket count of the events corpus from footer ts min/max —
    * nanos for the legacy TIMESTAMP(NANOS) long encoding, micros for the
    * TIMESTAMP_MICROS encodings (both INT64 in the footer). None when
    * stats are absent (⇒ callers drop the hint: at unknown scale the
    * planner's fallback is the safe side).
    */
  private def tsBucketCount(spark: SparkSession, dir: String,
      bucketWidth: Long): Option[Long] = {
    val perSec = graft.Tables.eventsTsType(spark, dir) match {
      case org.apache.spark.sql.types.LongType => 1000000000L
      case _ => 1000000L
    }
    graft.Tables.footerLongRange(spark, s"$dir/events.parquet", "ts").map {
      case (mn, mx) => (mx / perSec / bucketWidth) - (mn / perSec / bucketWidth) + 1L
    }
  }

  /** Barrier algebra on arbitrary (channel, ts) + (ddl_id, ddl_ts) frames —
    * exercised directly by the reference-vector spec
    * (data_barrier_test.go:33-64).
    *
    * First-crossing = a FORWARD as-of join (first event ts ≥ ddl_ts per
    * (ddl, channel)), computed as union + per-channel descending-ts
    * running min: at each probe row the running min over already-seen
    * (i.e. ≥-ts) event rows is exactly min{event ts : ts ≥ ddl_ts}. The
    * round-4 implementation was a broadcast range join — O(ddls × events),
    * which the sf1 cross-check measured going quadratic in SF (0.27 s at
    * sf0.1 → 7.1 s at 10×); this is O(n log n) and flat per row. Ties:
    * events sort before probes at equal ts, so a message exactly at
    * ddl_ts counts as crossed (data_barrier.go's ≥).
    *
    * Parallelism does NOT cap at numChannels: like [[orderingAudit]]'s
    * prefix-max, the running min decomposes over ts buckets —
    * first_crossing = min(within-bucket running min past the probe,
    * min over LATER buckets' event minima). The per-row window
    * partitions by (channel, bucket) so tasks scale with data; the
    * cross-bucket suffix-min runs over the tiny (channel, bucket) grid.
    * Bucket = floor(ts seconds / bucketWidth) — monotone in ts, so an
    * event ≥ the probe's ts is either in its bucket or a later one.
    */
  private[graft] def barrierTsFrom(ch: DataFrame, ddls: DataFrame,
      numChannels: Int, bucketWidth: Long = 86400L,
      broadcastGrid: Boolean = true,
      channels: Option[DataFrame] = None): DataFrame = {
    val evTsType = ch.schema("ts").dataType
    val ddlIdType = ddls.schema("ddl_id").dataType
    // The channel frame: callers that KNOW the channel universe (the
    // declared op — channels are pmod-assigned 0..N-1) pass it as a range
    // so the probe grid costs nothing; the generic default derives it
    // with a distinct scan, which the union below would otherwise
    // re-execute once per consumer. A channel with no events yields only
    // null-crossing probe rows, filtered exactly like a channel absent
    // from the distinct — results identical either way.
    val probes = ddls.crossJoin(
      channels.getOrElse(ch.select(col("channel")).distinct()))
    val evU = ch.select(col("channel"), col("ts"), col("ts").as("ev_ts"),
      lit(null).cast(ddlIdType).as("ddl_id"),
      lit(null).cast(evTsType).as("ddl_ts"), lit(0).as("is_probe"))
    val prU = probes.select(col("channel"), col("ddl_ts").as("ts"),
      lit(null).cast(evTsType).as("ev_ts"),
      col("ddl_id"), col("ddl_ts"), lit(1).as("is_probe"))
    val all = evU.unionAll(prU)
      .withColumn("bucket", expr(s"CAST(ts AS LONG) DIV $bucketWidth"))
    // Per-(channel, bucket) event minima INCLUDING probe-only buckets
    // (bmin null there), so every probe row finds its later_min row. The
    // grid aggregates the EVENT rows plus the probes' bare (channel,
    // bucket) keys — NOT a re-read of the row-level union, which would
    // re-execute every input scan a second time (the r17 formulation's
    // 12-scan plan); min(ev_ts) over the union with null probe entries is
    // exactly the old min(when(is_probe = 0, ev_ts)). The tiny grid
    // result is BROADCAST back to the row-level branch (when the size
    // gate allows): the planner has no size estimate for an
    // agg-under-window subtree and picked a SortMergeJoin, which
    // exchanged AND sorted the probe side on (channel, bucket) (r17 plan
    // audit). A one-pass shared-window formulation was tried and measured
    // WORSE: column pruning specializes the two consumers' exchanges,
    // ReuseExchange finds nothing, and the grid branch then pays the full
    // sort+window instead of a partial agg.
    val evG = ch.select(col("channel"),
      expr(s"CAST(ts AS LONG) DIV $bucketWidth").as("bucket"),
      col("ts").as("ev_ts"))
    val prG = probes.select(col("channel"),
      expr(s"CAST(ddl_ts AS LONG) DIV $bucketWidth").as("bucket"),
      lit(null).cast(evTsType).as("ev_ts"))
    val wLater = Window.partitionBy(col("channel")).orderBy(col("bucket"))
      .rowsBetween(1, Window.unboundedFollowing)
    val bucketGrid = evG.unionAll(prG).groupBy(col("channel"), col("bucket"))
      .agg(min(col("ev_ts")).as("bmin"))
      .withColumn("later_min", min(col("bmin")).over(wLater))
      .drop("bmin")
    val wIn = Window.partitionBy(col("channel"), col("bucket"))
      .orderBy(col("ts").desc, col("is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val crossings = all
      .withColumn("in_bucket_min", min(col("ev_ts")).over(wIn))
      .filter(col("is_probe") === 1)
      .join(maybeBroadcast(bucketGrid, broadcastGrid), Seq("channel", "bucket"))
      .withColumn("first_crossing", least(col("in_bucket_min"), col("later_min")))
      .filter(col("first_crossing").isNotNull)
    crossings.groupBy(col("ddl_id"), col("ddl_ts"))
      .agg(count(lit(1)).as("channels_crossed"),
        max(col("first_crossing")).as("barrier_ts"))
      .filter(col("channels_crossed") === numChannels)
      .select(col("ddl_id"), col("ddl_ts"), col("barrier_ts"))
  }

  /** Out-of-order arrival audit per channel: an event is out of order if
    * its ts is behind the running max of earlier (by event_id = MQ offset)
    * events in its channel.
    *
    * A single `Window.partitionBy(channel)` would cap parallelism at
    * NumChannels forever — each task sorts 1/NumChannels of the 100 TB
    * stream. Instead the prefix-max decomposes over event_id buckets:
    * prefix_max(e) = max(max of all earlier buckets, within-bucket prefix).
    * Bucket maxes are a tiny parallel agg; the cumulative-across-buckets
    * window runs over #buckets rows; the per-row window partitions by
    * (channel, bucket) — parallelism scales with data, not channel count.
    * Same answer, no 4-way sort bottleneck.
    */
  def orderingAudit(spark: SparkSession, dir: String): DataFrame = {
    val bucketSize = 4096L
    val ev = events(spark, dir)
      .select(pmod(col("user_id"), lit(NumChannels)).as("channel"),
        col("event_id"), col("ts"))
      .withColumn("bucket", col("event_id") - pmod(col("event_id"), lit(bucketSize)))
    // Grid branch = a second narrow scan with map-side partial agg (cheap);
    // the tiny grid BROADCASTS back — see [[barrierTsFrom]] for why this
    // beats a one-pass shared-window formulation (pruning-specialized
    // exchanges defeat ReuseExchange, and the grid re-execution then pays
    // a full sort+window instead of a partial agg). This grid grows
    // LINEARLY with the event count (one row per channel × 4096-offset
    // bucket), so the hint is gated ([[gridFits]]) on the bucket count
    // bounded by the footer event_id range — and by the row count, which
    // bounds the distinct (channel, bucket) pairs when ids are sparse;
    // past the cap the planner keeps its own strategy.
    val rows = graft.Tables.footerRowCount(spark, s"$dir/events.parquet")
    val idBuckets = graft.Tables
      .footerLongRange(spark, s"$dir/events.parquet", "event_id")
      .map { case (mn, mx) => mx / bucketSize - mn / bucketSize + 1L }
    val hint = gridFits(Some(math.min(
      rows, NumChannels * idBuckets.getOrElse(rows))))
    val wBuckets = Window.partitionBy(col("channel")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMax = ev.groupBy(col("channel"), col("bucket"))
      .agg(max(col("ts")).as("bmax"))
      .withColumn("prev_buckets_max", max(col("bmax")).over(wBuckets))
      .drop("bmax")
    val wInBucket = Window.partitionBy(col("channel"), col("bucket"))
      .orderBy(col("event_id")).rowsBetween(Window.unboundedPreceding, -1)
    ev.join(maybeBroadcast(bucketMax, hint), Seq("channel", "bucket"))
      .withColumn("prev_max",
        greatest(col("prev_buckets_max"), max(col("ts")).over(wInBucket)))
      .groupBy(col("channel"))
      .agg(count(when(col("ts") < col("prev_max"), lit(1))).as("out_of_order"),
        count(lit(1)).as("total"))
  }

  /** Replay dedup: replaying from a checkpoint re-delivers the tail; the
    * reader drops already-seen positions. Simulate the duplicated stream
    * (full ∪ tail) and dedup keep-one by (channel, event_id).
    */
  def replayDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(pmod(col("user_id"), lit(NumChannels)).as("channel"), col("event_id"), col("ts"))
    val replayed = ev.unionAll(ev.filter(col("ts") > to_timestamp(lit(Checkpoint))))
    replayed.groupBy(col("channel"))
      .agg(count(lit(1)).as("raw_cnt"),
        countDistinct(col("event_id")).as("dedup_cnt"))
  }

  /** As-of join: for each (DDL marker, channel), the replay seek position —
    * the last (ts, event_id) at-or-before the marker's timestamp. This is
    * the reference's collection_start_position lookup
    * (server/tool/collection_start_position, core/reader/etcd_op.go) as a
    * set-oriented operator.
    *
    * Spark-first as-of: instead of an inequality join (quadratic), union the
    * probe rows into the stream and carry the running max of
    * struct(ts, event_id) — every probe row reads its answer from the
    * running state. Linear in stream + probes, and (via [[seekAsofFrom]]'s
    * ts-bucket decomposition) parallel in data, not channel count.
    */
  def seekAsof(spark: SparkSession, dir: String, ddlStride: Long = 500L): DataFrame = {
    val ev = events(spark, dir)
    val ddls = ev.filter(col("event_type") === "signup" && col("event_id") % ddlStride === 0)
      .select(col("event_id").as("ddl_id"), col("ts").as("ddl_ts"))
    val channels = spark.range(NumChannels).select(col("id").as("channel"))
    val probes = ddls.crossJoin(broadcast(channels))
      .select(col("channel"), col("ddl_ts").as("ts"), col("ddl_id"))
    val stream = ev.select(pmod(col("user_id"), lit(NumChannels)).as("channel"),
      col("ts"), col("event_id"))
    seekAsofFrom(stream, probes,
      broadcastGrid = gridFits(tsBucketCount(spark, dir, 86400L)
        .map(_ * NumChannels)))
  }

  /** Backward-as-of algebra on arbitrary (channel, ts, event_id) stream +
    * (channel, ts, ddl_id) probe frames — the mirror image of
    * [[barrierTsFrom]]'s forward case.
    *
    * A single `Window.partitionBy(channel)` over stream ∪ probes would cap
    * parallelism at the channel count forever — each task sorts
    * 1/NumChannels of the 100 TB history (the exact bottleneck
    * [[orderingAudit]] and [[barrierTsFrom]] decompose away). The running
    * struct-max decomposes identically over ts buckets:
    * pos = greatest(within-bucket running max up to the probe,
    * max over EARLIER buckets' event struct-maxima). The per-row window
    * partitions by (channel, bucket) so tasks scale with data; the
    * cross-bucket prefix-max runs over the tiny (channel, bucket) grid.
    * Bucket = floor(ts seconds / bucketWidth) — monotone in ts, so an
    * event ≤ the probe's ts is either in its bucket or an earlier one.
    * Ties: events sort before probes at equal ts, so "at-or-before"
    * includes a message exactly at the probe ts.
    *
    * The (ts, event_id) position is carried as ONE `DECIMAL(38,0)`
    * `ts_raw * 10^18 + event_id` rather than a struct: lexicographic order
    * is preserved (event_id is a non-negative id < 10^18, the same
    * position-ordering the reference's MQ message ids guarantee), and a
    * 16-byte decimal is an UnsafeRow-mutable aggregation buffer, so the
    * bucket-grid max HASH-aggregates — a struct-valued max buffer would
    * force SortAggregate over the full stream (sorting every partition
    * just to fold a tiny grid).
    */
  private[graft] def seekAsofFrom(stream: DataFrame, probes: DataFrame,
      bucketWidth: Long = 86400L, broadcastGrid: Boolean = true): DataFrame = {
    val evIdType = stream.schema("event_id").dataType
    val tsType = stream.schema("ts").dataType
    val ddlIdType = probes.schema("ddl_id").dataType
    val evU = stream.select(col("channel"), col("ts"), col("event_id"),
      lit(0).as("is_probe"), lit(null).cast(ddlIdType).as("ddl_id"))
    val prU = probes.select(col("channel"), col("ts"),
      lit(null).cast(evIdType).as("event_id"), lit(1).as("is_probe"), col("ddl_id"))
    // Monotone integral image of ts: micros for timestamps (lossless — the
    // parquet source is micros), the raw value for integral ts.
    val tsRaw: Column = tsType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("ts"))
      case _ => col("ts").cast("long")
    }
    val packShift = "1000000000000000000" // 10^18
    val all = evU.unionAll(prU)
      .withColumn("bucket", expr(s"CAST(ts AS LONG) DIV $bucketWidth"))
      .withColumn("pk", when(col("is_probe") === 0,
        tsRaw.cast(org.apache.spark.sql.types.DecimalType(38, 0)) * expr(packShift)
          + col("event_id")))
    // Per-(channel, bucket) event position maxima INCLUDING probe-only
    // buckets (bmax null there), so every probe row finds its grid row.
    // The grid aggregates the EVENT rows plus the probes' bare (channel,
    // bucket) keys — not a re-read of the row-level union, which would
    // re-execute every input scan twice (see [[barrierTsFrom]]); max(pk)
    // with null probe entries ≡ the old max over the union. The tiny
    // grid BROADCASTS back (size-gated) — see [[barrierTsFrom]] for why
    // this beats both the former SortMergeJoin and a one-pass
    // shared-window formulation.
    val evG = stream
      .withColumn("bucket", expr(s"CAST(ts AS LONG) DIV $bucketWidth"))
      .select(col("channel"), col("bucket"),
        (tsRaw.cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * expr(packShift) + col("event_id")).as("pk"))
    val prG = probes
      .select(col("channel"), expr(s"CAST(ts AS LONG) DIV $bucketWidth").as("bucket"),
        lit(null).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("pk"))
    val wEarlier = Window.partitionBy(col("channel")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketGrid = evG.unionAll(prG).groupBy(col("channel"), col("bucket"))
      .agg(max(col("pk")).as("bmax"))
      .withColumn("earlier_max", max(col("bmax")).over(wEarlier))
      .drop("bmax")
    val wIn = Window.partitionBy(col("channel"), col("bucket"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val posTs: Column = tsType match {
      case org.apache.spark.sql.types.TimestampType =>
        timestamp_micros(expr(s"pos DIV $packShift"))
      case t => expr(s"pos DIV $packShift").cast(t)
    }
    all
      .withColumn("in_bucket_max", max(col("pk")).over(wIn))
      .filter(col("is_probe") === 1)
      .join(maybeBroadcast(bucketGrid, broadcastGrid), Seq("channel", "bucket"))
      .withColumn("pos", greatest(col("in_bucket_max"), col("earlier_max")))
      .filter(col("pos").isNotNull)
      .select(col("ddl_id"), col("channel"),
        posTs.as("pos_ts"),
        (col("pos") % expr(packShift)).cast(evIdType).as("pos_event_id"))
  }

  /** Milvus TSO (hybrid logical clock) compose/parse as columnar bit ops:
    * tso = physical_ms << 18 | logical (18-bit logical counter), exactly
    * the tsoutil.ComposeTS the reference stamps positions with
    * (server/cdc_impl.go:781, core/reader/etcd_op.go:814). Logical part
    * here: event_id mod 2^18 (a per-ms counter surrogate). Pure
    * narrow projection — no shuffle at any scale; parse-back columns
    * prove the roundtrip.
    */
  def tsoConvert(spark: SparkSession, dir: String): DataFrame = {
    val logicalBits = 18
    events(spark, dir)
      .select(col("event_id"), col("ts"),
        unix_millis(col("ts")).as("physical_ms"),
        pmod(col("event_id"), lit(1L << logicalBits)).as("logical"))
      .select(col("event_id"),
        (shiftleft(col("physical_ms"), logicalBits) + col("logical")).as("tso"))
      .select(col("event_id"), col("tso"),
        shiftrightunsigned(col("tso"), logicalBits).as("phys_ms"),
        col("tso").bitwiseAND(lit((1L << logicalBits) - 1)).as("logical"),
        timestamp_millis(shiftrightunsigned(col("tso"), logicalBits)).as("phys_ts"))
  }

  /** Apply a replayed change tail onto a materialized snapshot — the
    * writer half of replication (core/writer/channel_writer.go:118-139
    * hands upserts/deletes to the downstream, which merges into its
    * state). Snapshot = fold of events ≤ checkpoint; delta = fold of the
    * tail; merge = full outer join taking greatest(ts) and summed counts
    * per side. Result ≡ folding the whole stream ([[stateSnapshot]]'s
    * oracle checks exactly that idempotence).
    *
    * Scale: both folds are single PK-shuffles with map-side partials; the
    * merge join is co-partitioned on the same key (no extra exchange
    * beyond the two folds' outputs). The 100 TB history folds once into
    * the snapshot; every later apply touches only the delta.
    */
  def applyChanges(spark: SparkSession, dir: String): DataFrame = {
    val cp = to_timestamp(lit(Checkpoint))
    def fold(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(
          max(when(!isDelete, col("ts"))).as("u"),
          max(when(isDelete, col("ts"))).as("d"),
          count(when(!isDelete, lit(1))).as("uc"),
          count(when(isDelete, lit(1))).as("dc"))
    val ev = events(spark, dir)
    val snapshot = fold(ev.filter(col("ts") <= cp))
    val delta = fold(ev.filter(col("ts") > cp))
    snapshot.as("s").join(delta.as("t"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        greatest(col("s.u"), col("t.u")).as("last_upsert_ts"),
        greatest(col("s.d"), col("t.d")).as("last_delete_ts"),
        (coalesce(col("s.uc"), lit(0L)) + coalesce(col("t.uc"), lit(0L))).as("upserts"),
        (coalesce(col("s.dc"), lit(0L)) + coalesce(col("t.dc"), lit(0L))).as("deletes"))
      .withColumn("channel", pmod(col("user_id"), lit(NumChannels)))
      .filter(col("last_upsert_ts").isNotNull &&
        (col("last_delete_ts").isNull || col("last_upsert_ts") >= col("last_delete_ts")))
      .select("user_id", "channel", "last_upsert_ts", "last_delete_ts", "upserts", "deletes")
  }

  /** TTL expiry sweep — Milvus collection TTL: an alive row whose last
    * upsert is older than the TTL horizon (head watermark − ttl) is due
    * for compaction-time deletion. Evaluated against the stream head (max
    * ts), not wall clock, so the answer is deterministic. Reuses the
    * [[stateSnapshot]] fold (one PK shuffle) + a broadcast 1-row head.
    */
  def ttlExpiry(spark: SparkSession, dir: String, ttlHours: Int = 6): DataFrame = {
    val head = events(spark, dir).agg(max(col("ts")).as("head_ts"))
    stateSnapshot(spark, dir)
      .join(broadcast(head))
      .withColumn("expire_ts", col("last_upsert_ts") + expr(s"INTERVAL $ttlHours HOURS"))
      .filter(col("expire_ts") <= col("head_ts"))
      .select(col("user_id"), col("channel"), col("last_upsert_ts"),
        col("expire_ts"), col("upserts"))
  }

  /** Segment-sizing audit — events per (channel, day): message count,
    * distinct PKs, payload bytes. The growth metric a Milvus operator
    * watches to plan segment sealing/compaction; one shuffle on the
    * composite key with map-side partials.
    */
  def segmentStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(pmod(col("user_id"), lit(NumChannels)).as("channel"),
        date_trunc("day", col("ts")).as("seg_day"))
      .agg(count(lit(1)).as("msgs"),
        countDistinct(col("user_id")).as("pks"),
        sum(length(col("props")).cast("long")).as("payload_bytes"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))

  /** DDL replication apply — fold the DDL log into live catalog state, each
    * DDL applied at its data-barrier TS. Mirrors the writer's 4 replicate-API
    * events (core/writer/channel_writer.go:107-113 `initAPIEventFuncs`:
    * CreateCollection / DropCollection / CreatePartition / DropPartition)
    * applied only once their barrier completes
    * (core/reader/data_barrier.go:27-60).
    *
    * DDL surrogates: the barrier markers ([[barrierTs]]'s sampled signups),
    * k = ddl_id / 500 → collection `k % 3`, op `k % 4` cycling through the 4
    * API events. Catalog fold per collection: alive = last collection-level
    * op (by barrier application order: barrier_ts, then ddl_id) is a create;
    * live partitions = creates − drops.
    *
    * Scale: the DDL log is tiny by construction (DDLs are rare events), so
    * after [[barrierTs]]'s stream aggregation this is a few-row groupBy —
    * the catalog fold itself costs nothing at any data size.
    */
  def ddlApply(spark: SparkSession, dir: String): DataFrame = {
    val k = expr("ddl_id DIV 500")
    val ops = barrierTs(spark, dir)
      .select(col("ddl_id"), col("barrier_ts"),
        pmod(k, lit(NumCollections)).as("collection_id"),
        element_at(
          array(lit("create_collection"), lit("create_partition"),
            lit("drop_partition"), lit("drop_collection")),
          (pmod(k, lit(4)) + 1).cast("int")).as("op"))
    ddlApplyFrom(ops)
  }

  /** Catalog fold on an arbitrary (ddl_id, barrier_ts, collection_id, op)
    * log — split out so specs can feed hand-built DDL sequences.
    * `max(when(...))` over struct(barrier_ts, ddl_id, op): max ignores the
    * null (non-collection-op) rows and orders by the leading fields, so the
    * trailing op field rides along as the argmax payload.
    */
  private[graft] def ddlApplyFrom(ops: DataFrame): DataFrame = {
    val isCollOp = col("op").isin("create_collection", "drop_collection")
    ops.groupBy(col("collection_id"))
      .agg(
        count(lit(1)).as("n_ddls"),
        max(col("ddl_id")).as("last_ddl_id"),
        max(col("barrier_ts")).as("last_applied_ts"),
        max(when(isCollOp, struct(col("barrier_ts"), col("ddl_id"), col("op"))))
          .as("cc"),
        count(when(col("op") === "create_partition", lit(1))).as("parts_created"),
        count(when(col("op") === "drop_partition", lit(1))).as("parts_dropped"))
      .select(col("collection_id"),
        coalesce(col("cc.op") === "create_collection", lit(false)).as("alive"),
        col("n_ddls"), col("last_ddl_id"), col("last_applied_ts"),
        (col("parts_created") - col("parts_dropped")).as("live_partitions"))
  }

  /** Task control-plane as a metadata query — the reference's CDC task API
    * (server/cdc_api.go:27-36 Create/Delete/Pause/Resume/Get/GetPosition/
    * List) re-expressed as a last-write-wins fold of a task op log plus the
    * latest consumed position per task (server/model/meta/task.go:29-43
    * states Initial/Running/Paused; delete removes the task — surfaced here
    * as a terminal 'Deleted' state so List shows the tombstone).
    *
    * Task op surrogates: click events at event_id % 300 == 0; k = event_id /
    * 300 → task `k % 3` (each task replicates channel = its id), op `k % 4`
    * cycling create/pause/resume/delete. State = last op mapped
    * create|resume → Running, pause → Paused, delete → Deleted; position =
    * the task's channel head (max (ts, event_id)) — GetPosition.
    *
    * Scale: same max_by shape as [[latestUpsert]] on a log that is tiny by
    * construction; the position join is a per-channel aggregate (NumChannels
    * rows) joined to a handful of tasks.
    */
  def taskState(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val k = expr("event_id DIV 300")
    val opsLog = ev
      .filter(col("event_type") === "click" && pmod(col("event_id"), lit(300)) === 0)
      .select(pmod(k, lit(NumTasks)).as("task_id"),
        element_at(array(lit("create"), lit("pause"), lit("resume"), lit("delete")),
          (pmod(k, lit(4)) + 1).cast("int")).as("op"),
        col("ts"), col("event_id"))
    val positions = ev
      .groupBy(pmod(col("user_id"), lit(NumChannels)).as("channel"))
      .agg(max(struct(col("ts"), col("event_id"))).as("p"))
    taskStateFrom(opsLog, positions)
  }

  /** Task fold on arbitrary (task_id, op, ts, event_id) + (channel, p) frames
    * — split out for spec-built op sequences.
    */
  private[graft] def taskStateFrom(opsLog: DataFrame, positions: DataFrame): DataFrame =
    opsLog.groupBy(col("task_id"))
      .agg(count(lit(1)).as("n_ops"),
        max(struct(col("ts"), col("event_id"), col("op"))).as("m"))
      .select(col("task_id"), col("n_ops"),
        col("m.op").as("last_op"), col("m.ts").as("last_op_ts"))
      .withColumn("state",
        when(col("last_op") === "pause", "Paused")
          .when(col("last_op") === "delete", "Deleted")
          .otherwise("Running"))
      .join(broadcast(positions), col("task_id") === col("channel"))
      .select(col("task_id"), col("state"), col("n_ops"), col("last_op"),
        col("last_op_ts"), col("p.ts").as("pos_ts"), col("p.event_id").as("pos_event_id"))

  /** Multi-collection watermark — the reference replicates MANY collections
    * per task, each scoped to its own channel set with per-collection TS
    * tracking (core/reader/collection_reader.go, replicate_channel_manager
    * .go); the replication watermark is per collection: min across that
    * collection's channels of the channel max TS (ts_manager.GetMinTS,
    * core/reader/ts_manager.go:162-216, instantiated per collection).
    *
    * Collection surrogate: `user_id % 3` — deliberately coprime with the
    * channel hash (`user_id % 4`) so every collection spans all channels.
    *
    * Scale: one shuffle on the composite (collection, channel) key with
    * map-side partials → collections × channels rows; the per-collection
    * min is a window over those few rows, not the stream.
    */
  def collectionWatermark(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(pmod(col("user_id"), lit(NumCollections)).as("collection_id"),
        pmod(col("user_id"), lit(NumChannels)).as("channel"))
      .agg(max(col("ts")).as("channel_max_ts"), count(lit(1)).as("channel_cnt"))
      .withColumn("collection_watermark",
        min(col("channel_max_ts")).over(
          Window.partitionBy(col("collection_id"))))

  /** Name-mapping resolution as a broadcast join — the reference resolves
    * each replicated message's (db, collection) through the task's
    * NameMapping rules (core/writer/channel_writer.go:1208-1226
    * mapDBAndCollectionName over server/model/common.go:83-87 NameMapping,
    * wired from server/model/request/create.go:32): empty db defaults to
    * "default" (core/util/milvus_client_resource.go:41), an exact
    * `db.collection` rule remaps both names, a `db.*` wildcard remaps the
    * db only, no rule keeps the source names. Exact beats wildcard
    * (deterministic, where the reference's sync.Map iteration is
    * first-match).
    *
    * Scale: the rule set is task metadata (tiny) — two broadcast left
    * joins against the collection frame; the stream itself is never
    * touched.
    */
  private[graft] def nameMappingResolve(colls: DataFrame, exactRules: DataFrame,
      wildRules: DataFrame): DataFrame = {
    val srcDb = when(col("source_db") === "", lit("default")).otherwise(col("source_db"))
    colls
      .withColumn("source_db", srcDb)
      .join(broadcast(exactRules),
        col("source_db") === col("rule_src_db") &&
          col("source_collection") === col("rule_src_coll"), "left")
      .join(broadcast(wildRules), col("source_db") === col("wild_src_db"), "left")
      .withColumn("target_db",
        coalesce(col("rule_dst_db"), col("wild_dst_db"), col("source_db")))
      .withColumn("target_collection",
        coalesce(col("rule_dst_coll"), col("source_collection")))
      .withColumn("rule",
        when(col("rule_dst_db").isNotNull, "exact")
          .when(col("wild_dst_db").isNotNull, "db_wildcard")
          .otherwise("none"))
      .drop("rule_src_db", "rule_src_coll", "rule_dst_db", "rule_dst_coll",
        "wild_src_db", "wild_dst_db")
  }

  /** Per-target-name replication state — joins the task's NameMapping
    * rules to the per-collection watermark so "replicate source A as
    * target B" state is queryable by TARGET name, the metadata question
    * the reference's create-request mapping exists to answer.
    *
    * Surrogate naming: collection c lives in source db `src_db_{c % 2}` as
    * `coll_{c}`, replicated by task `c % NumTasks`. The rule set exercises
    * all three resolution branches: an exact rule for coll_0, a db
    * wildcard for src_db_1 (collection 1), and no rule for collection 2.
    */
  def nameMapping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val state = collectionWatermark(spark, dir)
      .groupBy(col("collection_id"))
      .agg(min(col("channel_max_ts")).as("collection_watermark"),
        sum(col("channel_cnt")).as("msgs"))
    val colls = state.select(col("collection_id"),
      pmod(col("collection_id"), lit(NumTasks)).as("task_id"),
      concat(lit("src_db_"), pmod(col("collection_id"), lit(2)).cast("string")).as("source_db"),
      concat(lit("coll_"), col("collection_id").cast("string")).as("source_collection"),
      col("collection_watermark"), col("msgs"))
    val exactRules = Seq(("src_db_0", "coll_0", "dst_db_0", "coll_0_replica"))
      .toDF("rule_src_db", "rule_src_coll", "rule_dst_db", "rule_dst_coll")
    val wildRules = Seq(("src_db_1", "dst_db_1")).toDF("wild_src_db", "wild_dst_db")
    nameMappingResolve(colls, exactRules, wildRules)
      .select(col("collection_id"), col("task_id"), col("source_db"),
        col("source_collection"), col("target_db"), col("target_collection"),
        col("rule"), col("collection_watermark"), col("msgs"))
  }

  /** N:M channel mapping between clusters of unequal channel counts —
    * core/util/channel_mapping.go:27-60: equal counts map 1:1; more
    * source channels merge up to `averageCnt` sources into each target;
    * more target channels split each source across up to `averageCnt`
    * targets, with averageCnt = ceil(bigger/smaller)
    * (channel_mapping.go:64-80 `average`). The runtime fills the map
    * greedily as channels arrive, capping each smaller-side channel at
    * averageCnt assignments (CheckKeyNotExist:101-125); with channels
    * processed in index order that greedy IS idx DIV averageCnt — the
    * deterministic set-oriented restatement used here. A tail channel can
    * stay unassigned when averageCnt × (smallerCnt − 1) ≥ biggerCnt —
    * faithful to the reference's fill order. The map key is the
    * more-numerous side (UsingSourceKey:96-98), surfaced as `key_side`.
    *
    * Three scenarios cover all branches against the stream's own channel
    * set: a smaller target cluster (merge), an equal one (same), a larger
    * one (split).
    */
  def channelMapping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = events(spark, dir)
      .select(pmod(col("user_id"), lit(NumChannels)).cast("long").as("src_idx"))
      .distinct()
    val scenarios = Seq(("merge", 3L), ("same", 4L), ("split", 6L))
      .toDF("scenario", "target_cnt")
    channelMappingResolve(src, scenarios)
  }

  /** Mapping algebra on arbitrary (src_idx) × (scenario, target_cnt)
    * frames — exercised directly by the reference-vector spec
    * (channel_mapping.go's sourceCnt >/=/< targetCnt regimes).
    *
    * Scale: pure cluster metadata — one map-side-combined distinct over
    * the stream's channel key reduced to a channel-count frame; the grid
    * of assignments is scenarios × max(channel counts) rows, broadcast
    * everywhere. The event stream itself is never re-shuffled.
    */
  private[graft] def channelMappingResolve(srcChannels: DataFrame,
      scenarios: DataFrame): DataFrame = {
    val srcCnt = srcChannels.agg(count(lit(1)).cast("long").as("source_cnt"))
    scenarios.crossJoin(broadcast(srcCnt))
      .withColumn("mode",
        when(col("source_cnt") === col("target_cnt"), lit("same"))
          .when(col("source_cnt") > col("target_cnt"), lit("source_more"))
          .otherwise(lit("target_more")))
      .withColumn("average_cnt",
        when(col("mode") === "same", lit(1L))
          .when(col("mode") === "source_more",
            expr("(source_cnt + target_cnt - 1) DIV target_cnt"))
          .otherwise(expr("(target_cnt + source_cnt - 1) DIV source_cnt")))
      .withColumn("key_idx",
        explode(expr(
          "sequence(CAST(0 AS BIGINT), greatest(source_cnt, target_cnt) - 1)")))
      .withColumn("src_idx",
        when(col("mode") === "target_more", expr("key_idx DIV average_cnt"))
          .otherwise(col("key_idx")))
      .withColumn("tgt_idx",
        when(col("mode") === "source_more", expr("key_idx DIV average_cnt"))
          .otherwise(col("key_idx")))
      // Inner-join the stream's actual channel frame: a mapping row only
      // exists for channels the source cluster really carries.
      .join(broadcast(srcChannels), Seq("src_idx"))
      .select(col("scenario"), col("mode"),
        when(col("mode") === "target_more", lit("target")).otherwise(lit("source"))
          .as("key_side"),
        col("source_cnt"), col("target_cnt"), col("average_cnt"),
        concat(lit("by-dev-rootcoord-dml_"), col("src_idx").cast("string"))
          .as("source_channel"),
        concat(lit("target-rootcoord-dml_"), col("tgt_idx").cast("string"))
          .as("target_channel"))
  }

  /** Kafka sink message format — the reference's Kafka downstream marshals
    * each change as JSON (core/writer/kafka_formatter.go:30-34 KafkaFormat
    * {name, type, value} per column; Format(): InsertParam → a JSON ARRAY of
    * per-column objects, DeleteParam → ONE object for the PK column;
    * core/writer/kafka_handler.go routes them to the configured topic).
    * Here: upserts carry [user_id, event_id, event_type, ts] (ts as the TSO
    * the reference stamps, [[tsoConvert]]); deletes carry the PK only.
    *
    * The message body is built with deterministic string concatenation (no
    * float formatting, types Int64/VarChar as milvus entity type names), so
    * the oracle can restate it byte-for-byte in SQL.
    *
    * Scale: a pure narrow projection — zero shuffles; on a real pipeline
    * this is the serializer stage of the stream sink.
    */
  def kafkaFormat(spark: SparkSession, dir: String): DataFrame =
    kafkaFormatProjection(events(spark, dir))

  /** The formatter as a pure projection, shared by the batch op and the
    * streaming sink path ([[graft.streaming.CdcStream.kafkaFormat]]) —
    * exactly how the reference shares one formatter between replay and
    * live tails.
    */
  private[graft] def kafkaFormatProjection(ev: DataFrame): DataFrame = {
    val logicalBits = 18
    val tso = (shiftleft(unix_millis(col("ts")), logicalBits) +
      pmod(col("event_id"), lit(1L << logicalBits))).cast("string")
    // props is a JSON string marshaled as a VarChar VALUE, escaped as Go's
    // json.Marshal does for the specials the corpus can carry: backslash
    // FIRST (else it would re-escape the quote escapes), then quote.
    // Control chars (\uXXXX forms) remain out of contract — enforced at
    // emit time: a row that would need \u escaping fails the job instead
    // of silently emitting invalid JSON.
    val escapedProps = when(col("props").rlike("[\\x00-\\x1f]"),
      raise_error(concat(lit("kafka_format: control char in props, event_id="),
        col("event_id").cast("string"))))
      .otherwise(regexp_replace(
        regexp_replace(col("props"), "\\\\", "\\\\\\\\"), "\"", "\\\\\""))
    val insertVal = concat(
      lit("""[{"name":"user_id","type":"Int64","value":"""), col("user_id").cast("string"),
      lit("""},{"name":"event_id","type":"Int64","value":"""), col("event_id").cast("string"),
      lit("""},{"name":"event_type","type":"VarChar","value":""""), col("event_type"),
      lit(""""},{"name":"ts","type":"Int64","value":"""), tso,
      lit("""},{"name":"props","type":"VarChar","value":""""), escapedProps,
      lit(""""}]"""))
    val deleteVal = concat(
      lit("""{"name":"user_id","type":"Int64","value":"""), col("user_id").cast("string"),
      lit("}"))
    ev.select(col("event_id"), pmod(col("user_id"), lit(NumChannels)).as("channel"),
      when(isDelete, lit("delete")).otherwise(lit("insert")).as("msg_type"),
      when(isDelete, deleteVal).otherwise(insertVal).as("kafka_value"))
  }

  /** Position-store persistence as a queryable log — the reference persists
    * per-(task, collection) positions keyed by channel to etcd/mysql
    * (server/store/meta_op.go:97-130 UpdateTaskCollectionPosition: a map
    * pChannelName → PositionInfo, last write wins per channel) and reloads
    * them on restart (ReloadTask). Here the store IS a query: fold the
    * position-save log to the latest persisted position per (collection,
    * channel), then replay-from-log — pending = messages strictly after
    * the saved position in (ts, event_id) order, exactly what a restarted
    * task must re-consume.
    *
    * Save surrogates: every event_id % 100 == 0 message acks its own
    * (ts, event_id) as the persisted position of its (collection, channel).
    *
    * Scale: the save fold is one shuffle on the composite key with map-side
    * partials → collections × channels rows; the replay count joins that
    * tiny frame back broadcast, so the stream is scanned once and never
    * shuffled.
    */
  def positionLog(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(pmod(col("user_id"), lit(NumCollections)).as("collection_id"),
        pmod(col("user_id"), lit(NumChannels)).as("channel"),
        col("ts"), col("event_id"))
    val saves = ev.filter(pmod(col("event_id"), lit(100)) === 0)
      .groupBy(col("collection_id"), col("channel"))
      .agg(count(lit(1)).as("n_saves"), max(struct(col("ts"), col("event_id"))).as("p"))
      .select(col("collection_id"), col("channel"), col("n_saves"),
        col("p.ts").as("pos_ts"), col("p.event_id").as("pos_event_id"))
    ev.join(broadcast(saves), Seq("collection_id", "channel"))
      .groupBy(col("collection_id"), col("channel"), col("n_saves"),
        col("pos_ts"), col("pos_event_id"))
      .agg(count(when(struct(col("ts"), col("event_id")) >
        struct(col("pos_ts"), col("pos_event_id")), lit(1))).as("pending_after_reload"))
  }

  /** The reference writer's COMPLETE non-data op surface: the 22
    * initOPMessageFuncs types (core/writer/channel_writer.go:117-141 —
    * database create/drop/alter, flush, index create/drop/alter,
    * load/release for collections AND partitions, credential ×3, role ×2,
    * user-role and privilege operates, privilege groups) plus Import
    * (channel_writer.go:269-280). Index position IS the surrogate op code
    * (k % 23); the oracle SQL regenerates its name list from this constant
    * so the two sides can never drift.
    */
  private[graft] val OpMessageNames: Seq[String] = Seq(
    "create_database", "drop_database", "alter_database",
    "flush",
    "create_index", "drop_index", "alter_index",
    "load_collection", "release_collection",
    "load_partitions", "release_partitions",
    "create_credential", "delete_credential", "update_credential",
    "create_role", "drop_role",
    "operate_user_role",
    "operate_privilege", "operate_privilege_v2",
    "create_privilege_group", "drop_privilege_group", "operate_privilege_group",
    "import")

  /** Collection-scoped subset of [[OpMessageNames]] (what
    * [[opMessages]] folds); the rest is the control/RBAC plane
    * ([[rbacState]]).
    */
  private[graft] val CollectionOpNames: Seq[String] = Seq(
    "flush", "create_index", "drop_index", "alter_index",
    "load_collection", "release_collection",
    "load_partitions", "release_partitions", "import")

  /** Shared op-message log. Surrogates: every event_id % 137 == 0 message
    * is an op marker (dense enough that all 23 types appear at sf ≥ 0.01);
    * k = event_id / 137 → op `k % 23` cycling [[OpMessageNames]], scopes
    * collection `k % 3`, database `k % 2`, credential user `k % 5`, role
    * `k % 4`, privilege group `k % 3`; operate_* ops carry action
    * grant/revoke by `(k / 23) % 2`.
    */
  private def opLog(spark: SparkSession, dir: String): DataFrame = {
    val k = expr("event_id DIV 137")
    events(spark, dir)
      .filter(pmod(col("event_id"), lit(137)) === 0)
      .select(
        element_at(array(OpMessageNames.map(lit): _*),
          (pmod(k, lit(OpMessageNames.size)) + 1).cast("int")).as("op"),
        pmod(k, lit(NumCollections)).as("collection_id"),
        pmod(k, lit(2)).as("db_id"),
        pmod(k, lit(5)).as("user_sid"),
        pmod(k, lit(4)).as("role_id"),
        pmod(k, lit(NumCollections)).as("group_id"),
        when(pmod(expr(s"(event_id DIV 137) DIV ${OpMessageNames.size}"), lit(2)) === 0,
            lit("grant"))
          .otherwise(lit("revoke")).as("action"),
        col("ts"), col("event_id"))
  }

  /** Position blob codec — the reference persists/ships positions as
    * base64(proto.Marshal(MsgPosition)) (core/util/string.go:105-127
    * Base64MsgPosition / Base64DecodeMsgPosition, consumed at
    * server/cdc_impl.go:490,544,1564-1568). MsgPosition is the public
    * milvus msg proto: 1 channel_name (string), 2 msgID (bytes),
    * 3 msgGroup (string, empty ⇒ omitted), 4 timestamp (uint64 TSO).
    * Encoded COLUMNAR as protobuf wire bytes built by hex-string
    * concatenation — tag 0A + len + name, tag 12 + 8-byte big-endian
    * msgID, tag 20 + varint(TSO) (9 bytes: every TSO in range
    * [2⁵⁶, 2⁶³), asserted in spec) — then base64'd; the DECODE side
    * parses the blob back (unbase64 → hex → field slicing + varint fold)
    * and roundtrip_ok pins decode∘encode = id on every persisted
    * position. Store key joins the meta-store layout
    * (server/store/meta_key.go:35-49, [[taskPositionKey]]); task
    * surrogate = channel % NumTasks.
    *
    * Scale: a narrow projection over [[positionLog]]'s tiny save fold —
    * collections × channels rows; zero additional shuffles.
    */
  def positionCodec(spark: SparkSession, dir: String): DataFrame =
    positionCodecFrom(positionLog(spark, dir)
      .select(col("collection_id"), col("channel"), col("pos_ts"), col("pos_event_id")))

  /** The codec on an arbitrary (collection_id, channel, pos_ts,
    * pos_event_id) frame — split out so the property spec can drive it
    * with adversarial generated positions, not just corpus save points.
    */
  private[graft] def positionCodecFrom(saves: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val logicalBits = 18
    val name = concat(lit("by-dev-rootcoord-dml_"), col("channel").cast("string"))
    val tso = shiftleft(unix_millis(col("pos_ts")), logicalBits) +
      pmod(col("pos_event_id"), lit(1L << logicalBits))
    // Wire build/parse are native expressions ([[graft.functions
    // .PositionWireCodec]] documents the byte-for-byte equivalence with
    // the hex-string Column formulation this replaces): the ~200-node
    // lpad∘hex / conv∘substr tree cost ~0.3-0.5 s of analysis+optimizer
    // DRIVER time per invocation — more than the op's entire execution at
    // metadata row counts — and its per-row hex round-trips were the only
    // non-primitive work left in the projection.
    val enc = saves
      .withColumn("channel_name", name).withColumn("tso", tso)
      .withColumn("pos_b64", base64(GraftSql.column(
        graft.functions.PositionWireEncode(
          GraftSql.expression(col("channel_name")),
          GraftSql.expression(col("pos_event_id")),
          GraftSql.expression(col("tso"))))))
    // Decode strictly from the blob (unbase64 → byte slicing); `dec` is
    // one attribute so the blob parses once per row, and CollapseProject
    // keeps it that way (multi-referenced non-cheap projections are not
    // inlined).
    val dec = GraftSql.column(graft.functions.PositionWireDecode(
      GraftSql.expression(unbase64(col("pos_b64")))))
    enc
      .withColumn("dec", dec)
      .withColumn("task_id", pmod(col("channel"), lit(NumTasks)))
      .withColumn("store_key",
        taskPositionKey(lit("cdc"), col("task_id").cast("string"), col("collection_id")))
      .withColumn("decoded_channel_name", col("dec.name"))
      .withColumn("decoded_event_id", col("dec.event_id"))
      .withColumn("decoded_phys_ms", shiftright(col("dec.tso"), logicalBits))
      .withColumn("roundtrip_ok",
        col("decoded_channel_name") === col("channel_name") &&
          col("decoded_event_id") === col("pos_event_id") &&
          col("decoded_phys_ms") === unix_millis(col("pos_ts")))
      .select(col("collection_id"), col("channel"), col("task_id"), col("store_key"),
        col("pos_b64"), col("decoded_channel_name"), col("decoded_event_id"),
        col("decoded_phys_ms"), col("roundtrip_ok"))
  }

  /** Op-message replication fold, collection scope — all 9
    * collection-scoped op types folded as replicated flags: indexed /
    * loaded / partitions_loaded are last-write-wins over their op family
    * in message order (ts, event_id); alter_index bumps a version counter;
    * flush and Import are counted — mirroring what the reference's
    * opMessageFuncs apply to the downstream per collection.
    *
    * Scale: the op log is rare-event tiny (pushed-down marker filter); one
    * groupBy with conditional struct-max partials — nothing stream-sized
    * survives the scan.
    */
  def opMessages(spark: SparkSession, dir: String): DataFrame = {
    val ops = opLog(spark, dir).filter(col("op").isin(CollectionOpNames: _*))
    val ord = struct(col("ts"), col("event_id"), col("op"))
    ops.groupBy(col("collection_id"))
      .agg(count(lit(1)).as("n_ops"),
        max(col("ts")).as("last_op_ts"),
        max(when(col("op").isin("create_index", "drop_index"), ord)).as("ix"),
        max(when(col("op").isin("load_collection", "release_collection"), ord)).as("ld"),
        max(when(col("op").isin("load_partitions", "release_partitions"), ord)).as("lp"),
        count(when(col("op") === "alter_index", lit(1))).as("index_version"),
        count(when(col("op") === "flush", lit(1))).as("n_flushes"),
        count(when(col("op") === "import", lit(1))).as("n_imports"))
      .select(col("collection_id"),
        coalesce(col("ix.op") === "create_index", lit(false)).as("indexed"),
        col("index_version"),
        coalesce(col("ld.op") === "load_collection", lit(false)).as("loaded"),
        coalesce(col("lp.op") === "load_partitions", lit(false)).as("partitions_loaded"),
        col("n_flushes"), col("n_imports"), col("n_ops"), col("last_op_ts"))
  }

  /** RBAC / control-plane grant-set state — the database + credential +
    * role + privilege ops the reference replicates
    * (channel_writer.go:119-140: createDatabase…operatePrivilegeGroup)
    * folded into live entity state: one row per (kind, id) with
    * alive = last lifecycle op is a create/grant, version = count of
    * in-place mutations (alter/update/operate), applied in message order.
    * user-role grants are their own entity kind (operate_user_role both
    * bumps the role's version and flips the (user, role) grant).
    *
    * Built SINGLE-PASS: each rare op row expands map-side into its ≤ 2
    * entity contributions (array + filter + explode — no per-kind rescan
    * of the stream), then ONE shuffle folds all kinds together. At 100 TB
    * the op markers are a pushed-down sliver of the scan and the fold
    * state is entities × kinds, i.e. constant.
    */
  def rbacState(spark: SparkSession, dir: String): DataFrame =
    rbacStateFrom(opLog(spark, dir))

  /** The grant-set fold on an arbitrary op log (op, db_id, user_sid,
    * role_id, group_id, action, ts, event_id) — split out so specs can
    * replay hand-built RBAC sequences.
    */
  private[graft] def rbacStateFrom(log: DataFrame): DataFrame = {
    val op = col("op")
    val nullLife = lit(null).cast("string")
    def entity(kind: String, id: Column, life: Column, bump: Column) =
      struct(lit(kind).as("kind"), id.as("id"), life.as("life"), bump.as("bump"))
    val entries = array(
      when(op.isin("create_database", "drop_database", "alter_database"),
        entity("database", col("db_id"),
          when(op === "create_database", "up").when(op === "drop_database", "down")
            .otherwise(nullLife),
          op === "alter_database")),
      when(op.isin("create_credential", "delete_credential", "update_credential"),
        entity("credential", col("user_sid"),
          when(op === "create_credential", "up").when(op === "delete_credential", "down")
            .otherwise(nullLife),
          op === "update_credential")),
      when(op.isin("create_role", "drop_role", "operate_user_role",
          "operate_privilege", "operate_privilege_v2"),
        entity("role", col("role_id"),
          when(op === "create_role", "up").when(op === "drop_role", "down")
            .otherwise(nullLife),
          op.isin("operate_user_role", "operate_privilege", "operate_privilege_v2"))),
      when(op.isin("create_privilege_group", "drop_privilege_group",
          "operate_privilege_group"),
        entity("privilege_group", col("group_id"),
          when(op === "create_privilege_group", "up")
            .when(op === "drop_privilege_group", "down").otherwise(nullLife),
          op === "operate_privilege_group")),
      when(op === "operate_user_role",
        entity("user_role", col("user_sid") * 4 + col("role_id"),
          when(col("action") === "grant", "up").otherwise("down"), lit(false))))
    val unfolded = log
      .select(explode(filter(entries, e => e.isNotNull)).as("e"),
        col("ts"), col("event_id"))
      .select(col("e.kind").as("entity_kind"), col("e.id").as("entity_id"),
        col("e.life").as("life"), col("e.bump").as("bump"),
        col("ts"), col("event_id"))
    unfolded.groupBy(col("entity_kind"), col("entity_id"))
      .agg(count(lit(1)).as("n_ops"),
        max(col("ts")).as("last_op_ts"),
        max(when(col("life").isNotNull,
          struct(col("ts"), col("event_id"), col("life")))).as("lf"),
        count(when(col("bump"), lit(1))).as("version"))
      .select(col("entity_kind"), col("entity_id"),
        coalesce(col("lf.life") === "up", lit(false)).as("alive"),
        col("version"), col("n_ops"), col("last_op_ts"))
  }

  /** Virtual→physical channel name: strip the final `_suffix`
    * (core/util/string.go:62-68 ToPhysicalChannel — everything before the
    * LAST underscore; unchanged when no underscore). Columnar so channel
    * mapping runs in-plan during replication, not row-at-a-time.
    */
  def toPhysicalChannel(vchannel: Column): Column =
    regexp_replace(vchannel, "_[^_]*$", "")

  /** Physical→virtual channel name (core/util/string.go:70-72 GetVChannel:
    * `pchannel_markv0`).
    */
  def getVChannel(pchannel: Column, mark: Column): Column =
    concat(pchannel, lit("_"), mark, lit("v0"))

  /** Meta-store key layout for task info / per-collection positions
    * (server/store/meta_key.go:35-49) — the key a position row persists
    * under, so a lake-backed store can mirror the etcd/mysql layout.
    */
  def taskInfoKey(rootPath: Column, taskId: Column): Column =
    concat(rootPath, lit("/task_info/"), taskId)

  def taskPositionKey(rootPath: Column, taskId: Column, collectionId: Column): Column =
    concat(rootPath, lit("/task_position/"), taskId, lit("/"),
      collectionId.cast("string"))

  /** Replication lag per channel from a checkpoint: pending message count
    * and time distance between the last ack'd TS and the head TS.
    */
  def tailLag(spark: SparkSession, dir: String): DataFrame = {
    val cp = to_timestamp(lit(Checkpoint))
    events(spark, dir)
      .groupBy(pmod(col("user_id"), lit(NumChannels)).as("channel"))
      .agg(
        max(when(col("ts") <= cp, col("ts"))).as("checkpoint_ts"),
        max(col("ts")).as("head_ts"),
        count(when(col("ts") > cp, lit(1))).as("pending"))
      .withColumn("lag_ms", unix_millis(col("head_ts")) - unix_millis(col("checkpoint_ts")))
  }

  /** The server's Prometheus replication counters as a metadata query —
    * the last queryable surface of server/metrics: replicate message count
    * and accumulated byte size labeled by (task, op type)
    * (metrics.go:115-129 ReplicateDataSizeVec / ReplicateDataCntVec), the
    * last replicate timestamp per task (metrics.go:107-113
    * ReplicateTimeVec), and the task-state gauge (metrics_task_num.go
    * TaskNumMetric) joined from the [[taskState]] fold.
    *
    * Tasks watch their channel 1:1 (the suite's standing surrogate), so
    * counters group on (channel-as-task, op type): one scan, one shuffle,
    * map-side partials; the 3-row state table broadcasts.
    */
  def taskMetrics(spark: SparkSession, dir: String): DataFrame = {
    val counters = events(spark, dir)
      .select(pmod(col("user_id"), lit(NumChannels)).as("task_id"),
        when(isDelete, lit("delete")).otherwise(lit("insert")).as("op_type"),
        packMsgBytes.as("sz"), col("ts"))
      .filter(col("task_id") < NumTasks)
      .groupBy(col("task_id"), col("op_type"))
      .agg(count(lit(1)).as("replicate_cnt"),
        sum(col("sz")).cast("long").as("replicate_bytes"),
        max(col("ts")).as("last_replicate_ts"))
    val states = taskState(spark, dir).select(col("task_id"), col("state"))
    counters.join(broadcast(states), Seq("task_id"))
      .select(col("task_id"), col("state"), col("op_type"),
        col("replicate_cnt"), col("replicate_bytes"), col("last_replicate_ts"))
  }

  /** Message-pack defaults mirroring the reference's packer config
    * (server/msgpacker/packer.go:12-14): a pack flushes when it holds
    * MaxCount messages or receives a message whose OWN serialized size
    * exceeds MaxMsgSize. (The wall-clock timer and the process-global
    * memory protector — packer.go:57-66, pack_checker.go:15-36 — are
    * runtime concerns, not queryable semantics, so the audit marks batches
    * they would flush as `open` instead.)
    */
  val PackMaxCount = 10
  val PackMaxMsgBytes = 1050L

  /** Simulated serialized message size in bytes (the testdata has no
    * payload column with size spread; props is uniformly 8-9 chars). The
    * surrogate is deterministic and oracle-restatable; ~5% of messages
    * exceed [[PackMaxMsgBytes]], so both flush rules and the open tail all
    * occur on every channel.
    */
  private[graft] def packMsgBytes: Column =
    lit(100L) + pmod(col("event_id") * 37L, lit(1000L))

  /** Batch-boundary audit for the target-side message packer
    * (server/msgpacker/packer.go:57-90 Receive, pack_checker.go
    * MsgCountChecker): deterministic batch id + size/count/reason per
    * message batch under the MaxCount/MaxMsgSize rules.
    *
    * Key structural fact that makes this a WINDOWED PREFIX-SUM instead of a
    * sequential fold: in Receive, a message whose own size exceeds
    * MaxMsgSize flushes the pack IMMEDIATELY (before the count checker
    * runs, packer.go:72-76), and every flush resets the count checker — so
    * oversize messages partition each channel's stream into segments, and
    * within a segment batches are exact MaxCount-chunks (the segment's last
    * chunk may be short, closed by its oversize message or left open at the
    * stream tail).
    *
    * Scale: the same bucket decomposition as [[orderingAudit]] — per-row
    * windows partition by (channel, event_id-bucket), cumulative counts
    * ride the tiny per-bucket aggregate, so parallelism scales with data,
    * not channel count. The batch-id numbering window runs over the
    * batch-level table (|batches| ≈ |msgs|/MaxCount).
    */
  /** Cache gate for [[msgpackBatch]]'s shared narrow frame: the bucket
    * stats and the row-level pass both consume (channel, event_id, sz) —
    * caching it inside the query replaces the second events scan with an
    * in-memory read. Measured A/B (ProbeSharedScan, warm): −25-40 % at
    * 100k events, −15-30 % at 1M, noise at 10M — the win is the avoided
    * scan+project pass, which shrinks relative to the shuffle/sort work
    * as volume grows, so past this bound the cache is dropped and the op
    * keeps its two pushed-down narrow scans (at 100 TB a cached copy of
    * the narrow frame would pin ~40 TB of cluster memory/disk for a pass
    * the scans do cheaper). The same A/B on barrierTs/seekAsof's union
    * frame measured WORSE at 10M (+8-25 %) — those keep the double scan
    * unconditionally (the union carries probe metadata columns, so its
    * cached copy outweighs two narrow scans).
    */
  private[graft] val PackNarrowCacheMaxRows = 10000000L

  def msgpackBatch(spark: SparkSession, dir: String,
      maxCount: Int = PackMaxCount, maxBytes: Long = PackMaxMsgBytes): DataFrame =
    msgpackBatchFrom(
      events(spark, dir).select(
        pmod(col("user_id"), lit(NumChannels)).as("channel"),
        col("event_id"), packMsgBytes.as("sz")),
      maxCount, maxBytes,
      cacheNarrow = graft.Tables.footerRowCount(spark, s"$dir/events.parquet")
        <= PackNarrowCacheMaxRows)

  /** The batching fold over an arbitrary (channel, event_id, sz) frame —
    * split out so the spec can replay the Go packer's semantics on
    * constructed streams (count-capped, size-capped, tail-open vectors).
    *
    * PRECONDITION: event_id is unique per channel (it is the MQ offset,
    * which the reference's consumer reads in order, and both the testdata
    * and every spec stream satisfy it). The row-level windows order by
    * event_id alone, so duplicate ids on one channel would make seq/seg
    * assignment nondeterministic and diverge from the sequential
    * PackerReference fold.
    */
  private[graft] def msgpackBatchFrom(msgs: DataFrame, maxCount: Int,
      maxBytes: Long, cacheNarrow: Boolean = false): DataFrame =
    // Bucket width scales with channel width, capped at 64k: event_ids
    // interleave across channels, so a (channel, bucket) group holds
    // ~bucketSize/channels rows — a fixed 4096 at 256 channels means
    // 16-row groups (6.2M of them at 100M events) and a bucket-stats
    // frame 64x bigger than needed. Same-session width A/B at 100M
    // events (ProbeMsgpackBuckets; results width-invariant by signature):
    // ch256 — 4096: 20-36 s, 65536: ~22 s stable, 262144: 33-36 s (too
    // few groups per channel throttles the row-level sort parallelism);
    // ch4 — 4096 and 65536 equal within noise. 64k is the stable choice
    // across widths; the cap keeps ≥ range/64k buckets of parallelism.
    msgpackBatchFromWidth(msgs, maxCount, maxBytes,
      math.min(65536L, 4096L * math.max(1L, NumChannels / 4L)), cacheNarrow)

  /** [[msgpackBatchFrom]] with an explicit bucket width — probe seam. */
  private[graft] def msgpackBatchFromWidth(msgs: DataFrame, maxCount: Int,
      maxBytes: Long, bucketSize: Long, cacheNarrow: Boolean = false): DataFrame = {
    val eRaw = msgs
      .withColumn("bucket", col("event_id") - pmod(col("event_id"), lit(bucketSize)))
      .withColumn("ov", (col("sz") > maxBytes).cast("long"))
    // cacheNarrow (see [[PackNarrowCacheMaxRows]]): both branches below
    // consume this frame; an in-session cache() (plan-equality shared, so
    // repeat invocations reuse one entry) trades the second scan for an
    // in-memory read when the volume gate says the frame is small.
    val e = if (cacheNarrow) eRaw.cache() else eRaw
    // Per-bucket totals + cumulative counts across earlier buckets: a tiny
    // aggregate (|buckets| rows), so its cumulative window costs nothing.
    val wBuckets = Window.partitionBy(col("channel")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bstats = e.groupBy(col("channel"), col("bucket"))
      .agg(count(lit(1)).as("bcnt"), sum(col("ov")).as("bov"))
      .withColumn("prev_cnt", coalesce(sum(col("bcnt")).over(wBuckets), lit(0L)))
      .withColumn("prev_ov", coalesce(sum(col("bov")).over(wBuckets), lit(0L)))
      .select(col("channel"), col("bucket"), col("prev_cnt"), col("prev_ov"))
    // One (channel, bucket) sort serves both row-level prefixes: the
    // channel-wide sequence number and the oversize-prefix segment id
    // (count of oversize messages STRICTLY before this one).
    val wRow = Window.partitionBy(col("channel"), col("bucket")).orderBy(col("event_id"))
    val rows = e.join(bstats, Seq("channel", "bucket"))
      .withColumn("seq", col("prev_cnt") + row_number().over(wRow))
      .withColumn("seg", col("prev_ov") + coalesce(
        sum(col("ov")).over(wRow.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // Chunk within segment = 0-based position DIV maxCount. seg_start =
    // min(seq) within (channel, seg) as a WHOLE-PARTITION window, not a
    // groupBy + self-join: the self-join re-evaluated the entire `rows`
    // subtree (the events scan ran 4x per query, 12 exchanges — r17 plan
    // audit), where the window costs one exchange whose (channel, seg)
    // partitioning the next groupBy then reuses (subset-key clustering).
    val wSeg = Window.partitionBy(col("channel"), col("seg"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val batches = rows
      .withColumn("seg_start", min(col("seq")).over(wSeg))
      .withColumn("chunk", expr(s"(seq - seg_start) DIV $maxCount"))
      .groupBy(col("channel"), col("seg"), col("chunk"))
      .agg(count(lit(1)).as("n_msgs"), sum(col("sz")).as("batch_bytes"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        max(col("ov")).as("has_ov"))
    batches
      .withColumn("batch_id", row_number()
        .over(Window.partitionBy(col("channel")).orderBy(col("seg"), col("chunk")))
        .cast("long"))
      .select(col("channel"), col("batch_id"), col("n_msgs"),
        col("batch_bytes").cast("long").as("batch_bytes"),
        col("first_event_id"), col("last_event_id"),
        // Receive checks size BEFORE count (packer.go:72-83), so an
        // exactly-full chunk closed by an oversize message reads 'size'.
        when(col("has_ov") === 1L, lit("size"))
          .when(col("n_msgs") === maxCount, lit("count"))
          .otherwise(lit("open")).as("reason"))
  }
}
