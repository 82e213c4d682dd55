package graft

import graft.cdc.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  test("stateSnapshot keeps only alive PKs (ValidData fold)") {
    val rows = Cdc.stateSnapshot(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val up = r.getAs[java.sql.Timestamp]("last_upsert_ts")
      val del = r.getAs[java.sql.Timestamp]("last_delete_ts")
      assert(up != null)
      if (del != null) assert(!up.before(del))
    }
  }

  test("latestUpsert returns exactly one row per alive-upserting PK") {
    val df = Cdc.latestUpsert(spark, sfDir)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("replicaDiff never reports both_alive") {
    val classes = Cdc.replicaDiff(spark, sfDir).select("diff_class")
      .distinct().collect().map(_.getString(0)).toSet
    assert(!classes.contains("both_alive"))
  }

  test("channelWatermark global watermark = min of channel maxes") {
    val rows = Cdc.channelWatermark(spark, sfDir).collect()
    assert(rows.length == Cdc.NumChannels)
    val maxes = rows.map(_.getAs[java.sql.Timestamp]("channel_max_ts"))
    val global = rows.map(_.getAs[java.sql.Timestamp]("global_watermark")).distinct
    assert(global.length == 1 && global.head == maxes.min)
  }

  test("barrierTs crossings are >= the DDL ts and complete on all channels") {
    val rows = Cdc.barrierTs(spark, sfDir).collect()
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("barrier_ts")
        .before(r.getAs[java.sql.Timestamp]("ddl_ts")))
    }
  }

  test("replayDedup recovers the original per-channel counts") {
    val orig = graft.Tables.events(spark, sfDir)
      .groupBy(pmod(col("user_id"), lit(Cdc.NumChannels)).as("channel")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Cdc.replayDedup(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("dedup_cnt") == orig(r.getAs[Long]("channel")))
      assert(r.getAs[Long]("raw_cnt") >= r.getAs[Long]("dedup_cnt"))
    }
  }

  test("tailLag pending + checkpoint are consistent") {
    Cdc.tailLag(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("lag_ms") >= 0)
      assert(r.getAs[Long]("pending") >= 0)
    }
  }

  test("barrier join broadcasts the DDL side (no event-stream shuffle join)") {
    assert(planOf(Cdc.barrierTs(spark, sfDir)).contains("BroadcastNestedLoopJoin"))
  }

  test("seekAsof positions are at-or-before each DDL ts, one per (ddl, channel)") {
    val ddlTs = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup" && col("event_id") % 20 === 0)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[java.sql.Timestamp]("ts")).toMap
    val rows = Cdc.seekAsof(spark, sfDir, ddlStride = 20L).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getAs[Long]("ddl_id"), r.getAs[Long]("channel"))).distinct.length
      == rows.length)
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("pos_ts").after(ddlTs(r.getAs[Long]("ddl_id"))))
    }
  }

  test("seekAsof avoids an inequality join: one sort pass, no nested loop") {
    val plan = planOf(Cdc.seekAsof(spark, sfDir))
    assert(!plan.contains("NestedLoop") || plan.contains("BroadcastNestedLoopJoin"),
      "stream side must not nested-loop against probes")
    assert(plan.contains("Window"), "carry-forward runs in one windowed pass")
  }

  test("bucket-grid broadcast hint is gated on a footer-metadata size bound") {
    // The gate itself: at/below the row cap the hint fires, above it (or
    // with no stats signal) the planner keeps its fallback strategy.
    assert(Cdc.gridFits(Some(Cdc.GridBroadcastMaxRows)))
    assert(!Cdc.gridFits(Some(Cdc.GridBroadcastMaxRows + 1)))
    assert(!Cdc.gridFits(None))
    // The signal exists on real corpora (INT64 footer stats for ts and
    // event_id), and at test scale the grids fit — the three window ops
    // keep their broadcast plan shape.
    assert(graft.Tables.footerLongRange(spark, s"$sfDir/events.parquet", "ts").isDefined)
    assert(graft.Tables.footerLongRange(spark, s"$sfDir/events.parquet", "event_id").isDefined)
    Seq(Cdc.barrierTs(spark, sfDir), Cdc.orderingAudit(spark, sfDir),
        Cdc.seekAsof(spark, sfDir)).foreach { df =>
      val plan = planOf(df)
      assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
        s"grid must broadcast at test scale:\n${plan.take(1500)}")
    }
  }

  test("tsoConvert roundtrips: physical ms and logical counter parse back") {
    import org.apache.spark.sql.functions._
    val bad = Cdc.tsoConvert(spark, sfDir)
      .join(graft.Tables.events(spark, sfDir), "event_id")
      .filter(col("phys_ms") =!= unix_millis(col("ts")) ||
        col("logical") =!= pmod(col("event_id"), lit(262144L)) ||
        col("logical") >= lit(1L << 18))
      .count()
    assert(bad == 0L, "TSO parse must invert compose for every event")
    // Pure projection: composing/parsing TSOs must never shuffle.
    assert(!planOf(Cdc.tsoConvert(spark, sfDir)).contains("Exchange"))
  }

  test("ttlExpiry: expired set is the alive snapshot aged past head - ttl") {
    import org.apache.spark.sql.functions._
    val head = graft.Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect().head.getTimestamp(0)
    val alive = Cdc.stateSnapshot(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[java.sql.Timestamp]("last_upsert_ts")).toMap
    val expired = Cdc.ttlExpiry(spark, sfDir).collect()
    assert(expired.nonEmpty)
    expired.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      assert(alive.contains(uid), "only alive PKs can expire")
      val lu = r.getAs[java.sql.Timestamp]("last_upsert_ts")
      assert(lu == alive(uid))
      assert(r.getAs[java.sql.Timestamp]("expire_ts").getTime
        == lu.getTime + 6L * 3600 * 1000)
      assert(!r.getAs[java.sql.Timestamp]("expire_ts").after(head))
    }
  }

  test("segmentStats: per-(channel, day) partition of the whole stream") {
    val rows = Cdc.segmentStats(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("msgs")).sum
    assert(total == graft.Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("pks") <= r.getAs[Long]("msgs"))
      assert(r.getAs[Long]("payload_bytes") > 0)
    }
  }

  test("applyChanges (snapshot + delta merge) equals the full-stream fold") {
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("last_upsert_ts"),
        r.getAs[java.sql.Timestamp]("last_delete_ts"),
        r.getAs[Long]("upserts"), r.getAs[Long]("deletes"))).toSet
    val applied = key(Cdc.applyChanges(spark, sfDir).collect())
    val full = key(Cdc.stateSnapshot(spark, sfDir).collect())
    assert(applied == full, "apply-onto-snapshot must be replay-idempotent")
  }
}
