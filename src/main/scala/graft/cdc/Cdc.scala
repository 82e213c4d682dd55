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

  val NumChannels = 4
  val Checkpoint = "2024-01-20"

  private def withChannel(df: DataFrame): Column = pmod(col("user_id"), lit(NumChannels))
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
      ddls, NumChannels)
  }

  /** Barrier algebra on arbitrary (channel, ts) + (ddl_id, ddl_ts) frames —
    * exercised directly by the reference-vector spec
    * (data_barrier_test.go:33-64).
    */
  private[graft] def barrierTsFrom(ch: DataFrame, ddls: DataFrame,
      numChannels: Int): DataFrame = {
    val crossings = ch
      .join(broadcast(ddls), col("ts") >= col("ddl_ts"))
      .groupBy(col("ddl_id"), col("ddl_ts"), col("channel"))
      .agg(min(col("ts")).as("first_crossing"))
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
    val wBuckets = Window.partitionBy(col("channel")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMax = ev.groupBy(col("channel"), col("bucket"))
      .agg(max(col("ts")).as("bmax"))
      .withColumn("prev_buckets_max", max(col("bmax")).over(wBuckets))
      .drop("bmax")
    val wInBucket = Window.partitionBy(col("channel"), col("bucket"))
      .orderBy(col("event_id")).rowsBetween(Window.unboundedPreceding, -1)
    // Shuffle join on (channel, bucket) — AQE broadcasts it while the
    // bucket table is small; at extreme bucket counts it stays a hash join
    // co-partitioned with the per-row window's shuffle.
    ev.join(bucketMax, Seq("channel", "bucket"))
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
    * probe rows into the stream, sort once per channel, and carry the
    * running max of struct(ts, event_id) — every probe row reads its answer
    * from the running state. One shuffle + sort, linear in stream + probes.
    */
  def seekAsof(spark: SparkSession, dir: String, ddlStride: Long = 500L): DataFrame = {
    val ev = events(spark, dir)
    val ddls = ev.filter(col("event_type") === "signup" && col("event_id") % ddlStride === 0)
      .select(col("event_id").as("ddl_id"), col("ts").as("ddl_ts"))
    val channels = spark.range(NumChannels).select(col("id").as("channel"))
    val probes = ddls.crossJoin(broadcast(channels))
      .select(col("channel"), col("ddl_ts").as("ts"),
        lit(null).cast("long").as("event_id"), lit(1).as("is_probe"), col("ddl_id"))
    val stream = ev.select(pmod(col("user_id"), lit(NumChannels)).as("channel"),
      col("ts"), col("event_id"), lit(0).as("is_probe"), lit(null).cast("long").as("ddl_id"))
    // Order events before probes at equal ts so "at-or-before" includes ties.
    val w = Window.partitionBy(col("channel"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    stream.unionAll(probes)
      .withColumn("pos",
        max(when(col("is_probe") === 0, struct(col("ts"), col("event_id")))).over(w))
      .filter(col("is_probe") === 1 && col("pos").isNotNull)
      .select(col("ddl_id"), col("channel"),
        col("pos.ts").as("pos_ts"), col("pos.event_id").as("pos_event_id"))
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
}
