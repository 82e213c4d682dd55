package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.streaming.CdcStream

class StreamMultimodalSpec extends SparkSpec {

  test("stream_cdc_state equals the batch fold (same oracle)") {
    val live = CdcStream.cdcState(spark, sfDir).collect()
    val batch = graft.cdc.Cdc.stateSnapshot(spark, sfDir).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("upserts"),
        r.getAs[Long]("deletes"))).toSet
    assert(key(live) == key(batch))
  }

  test("stream_msgpack_batch equals the batch audit minus its open tails") {
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("channel"), r.getAs[Long]("batch_id"), r.getAs[Long]("n_msgs"),
        r.getAs[Long]("batch_bytes"), r.getAs[Long]("first_event_id"),
        r.getAs[Long]("last_event_id"), r.getAs[String]("reason"))).toSet
    val live = key(CdcStream.msgpackBatch(spark, sfDir).collect())
    val batch = key(graft.cdc.Cdc.msgpackBatch(spark, sfDir)
      .filter(col("reason") =!= "open").collect())
    assert(live.nonEmpty, "the live packer must close packs on this stream")
    assert(live == batch)
  }

  test("packer state carries the open pack across microbatches (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcStream.PackMsg]
    val packs = input.toDS().groupByKey(_.channel)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(CdcStream.foldPacker(3, 100L))
    val q = packs.toDF().writeStream.format("memory")
      .queryName("spec_packer_inc").outputMode("append").start()
    // Batch 1: two small messages — pack stays OPEN, nothing may emit.
    input.addData(CdcStream.PackMsg(0L, 1L, 10L), CdcStream.PackMsg(0L, 2L, 20L))
    q.processAllAvailable()
    assert(spark.table("spec_packer_inc").count() === 0L,
      "an unfilled pack must stay in state, not emit")
    // Batch 2: third message closes by count ACROSS the batch boundary;
    // an oversize message then closes its own singleton pack by size.
    input.addData(CdcStream.PackMsg(0L, 3L, 30L), CdcStream.PackMsg(0L, 4L, 999L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("spec_packer_inc").collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("n_msgs"),
        r.getAs[Long]("batch_bytes"), r.getAs[Long]("first_event_id"),
        r.getAs[Long]("last_event_id"), r.getAs[String]("reason"))).toSet
    assert(out === Set(
      (1L, 3L, 60L, 1L, 3L, "count"),
      (2L, 1L, 999L, 4L, 4L, "size")))
  }

  test("stream_cdc_state folds incrementally across microbatches (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcStream.Ev]
    val folded = input.toDS().groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(CdcStream.foldPk)
    val q = folded.toDF().writeStream.format("memory")
      .queryName("spec_cdc_inc").outputMode("update").start()
    // Batch 1: u1 upsert@10, u2 upsert@5. Batch 2: u1 delete@20 (tombstone wins).
    input.addData(CdcStream.Ev(1L, 10L, "view"), CdcStream.Ev(2L, 5L, "click"))
    q.processAllAvailable()
    input.addData(CdcStream.Ev(1L, 20L, "error"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("spec_cdc_inc")
      .groupBy("user_id").agg(max("lastDelete").as("ld"), max("upserts").as("up")).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("ld"), r.getAs[Long]("up"))).toMap
    assert(out(1L) == (20L, 1L), "state must carry across batches")
    assert(out(2L)._2 == 1L)
  }

  test("update-mode drains stay correct when keys re-emit across microbatches") {
    // Force the incremental-source regime the file drain never hits: the
    // same PK emits in several microbatches, so the memory sink holds one
    // row per key PER BATCH; pkRowsToSnapshot must keep only the final
    // emission (tombstone wins here), for any batch slicing.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcStream.Ev]
    val folded = input.toDS().groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(CdcStream.foldPk)
    val q = folded.toDF().writeStream.format("memory")
      .queryName("spec_multibatch_pk").outputMode("update").start()
    input.addData(CdcStream.Ev(1L, 10L, "view"), CdcStream.Ev(2L, 5L, "click"))
    q.processAllAvailable()
    input.addData(CdcStream.Ev(1L, 20L, "view"), CdcStream.Ev(2L, 30L, "error"))
    q.processAllAvailable()
    input.addData(CdcStream.Ev(1L, 25L, "view"))
    q.processAllAvailable()
    q.stop()
    val sink = spark.table("spec_multibatch_pk")
    assert(sink.count() > sink.select("user_id").distinct().count(),
      "test must actually produce multi-batch re-emissions")
    val out = CdcStream.pkRowsToSnapshot(sink).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet === Set(1L), "u2's delete@30 beats its upsert@5 - filtered out")
    assert(out(1L).getAs[Long]("upserts") === 3L, "final emission, not an earlier one")
  }

  test("task drain keeps the last emission per task across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcStream.TaskOp]
    val folded = input.toDS().groupByKey(_.task_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(CdcStream.foldTask)
    val q = folded.toDF().writeStream.format("memory")
      .queryName("spec_multibatch_task").outputMode("update").start()
    input.addData(CdcStream.TaskOp(0L, "create", 10L, 1L))
    q.processAllAvailable()
    input.addData(CdcStream.TaskOp(0L, "pause", 20L, 2L))
    q.processAllAvailable()
    q.stop()
    val sink = spark.table("spec_multibatch_task")
    assert(sink.count() === 2L, "one emission per batch")
    val positions = Seq((0L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 9L))
      .toDF("channel", "pts", "pid")
      .select(col("channel"), struct(col("pts").as("ts"), col("pid").as("event_id")).as("p"))
    val out = CdcStream.taskRowsToState(sink, positions).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("state") === "Paused")
    assert(out.head.getAs[Long]("n_ops") === 2L)
  }

  test("stream_collection_watermark equals the batch fold (same oracle)") {
    val live = CdcStream.collectionWatermark(spark, sfDir).collect()
    val batch = graft.cdc.Cdc.collectionWatermark(spark, sfDir).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("collection_id"), r.getAs[Long]("channel"),
        r.getAs[java.sql.Timestamp]("channel_max_ts"), r.getAs[Long]("channel_cnt"),
        r.getAs[java.sql.Timestamp]("collection_watermark"))).toSet
    assert(key(live) == key(batch))
  }

  test("replicate: change-log sink folds back to the batch snapshot") {
    val sink = java.nio.file.Files.createTempDirectory("graft-replica").toString + "/log"
    CdcStream.replicate(spark, sfDir, sink)
    val replica = CdcStream.replicaView(spark, sink).collect()
    val batch = graft.cdc.Cdc.stateSnapshot(spark, sfDir).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("last_upsert_ts"),
        r.getAs[Long]("upserts"), r.getAs[Long]("deletes"))).toSet
    assert(key(replica) == key(batch), "downstream replica must equal the batch fold")
  }

  test("stream_window_counts totals match the raw event count") {
    val rows = CdcStream.windowCounts(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == graft.Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      val s = r.getAs[java.sql.Timestamp]("window_start")
      val e = r.getAs[java.sql.Timestamp]("window_end")
      assert(e.getTime - s.getTime == 86400000L, "1-day tumbling windows")
    }
  }

  test("watermarked append-mode windows emit only after the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val counts = input.toDF().toDF("ts", "etype")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"etype").count()
    val q = counts.writeStream.format("memory").queryName("spec_wm")
      .outputMode("append").start()
    def t(h: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    input.addData((t(1), "a"), (new java.sql.Timestamp(t(1).getTime + 1800000L), "a"))
    q.processAllAvailable()
    assert(spark.table("spec_wm").isEmpty, "open window must not emit in append mode")
    input.addData((t(3), "a")) // advances watermark past the 01:00 window end
    q.processAllAvailable()
    input.addData((t(4), "a")) // next batch flushes the closed window
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("spec_wm").collect()
    assert(emitted.exists(_.getAs[Long]("count") == 2L),
      "closed [01:00,02:00) window with 2 events must be emitted")
  }

  test("mm_decode_meta: deterministic stub decode, one row per blob") {
    val rows = Multimodal.decodeMeta(spark, sfDir).collect()
    assert(rows.length == graft.Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[String]("content_md5").matches("[0-9a-f]{32}"))
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      assert(w >= 64 && w < 1024 && h >= 64 && h < 768)
    }
  }

  test("mm_frame_sample: offsets stride correctly, tail frame may be short") {
    val rows = Multimodal.frameSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("byte_offset") == r.getAs[Long]("frame_idx") * 256)
      val fb = r.getAs[Long]("frame_bytes")
      assert(fb > 0 && fb <= 64)
    }
    // frame plumbing is pure Column code — no shuffle
    assert(!planOf(Multimodal.frameSample(spark, sfDir)).contains("Exchange"))
  }

  test("mm_feature_batch: features are batch-size invariant and in range") {
    import org.apache.spark.sql.Row
    def key(r: Row) = (r.getAs[Long]("doc_id"), r.getAs[Long]("byte_sum"),
      r.getAs[Double]("mean_byte"), r.getAs[Double]("entropy"))
    val b1 = Multimodal.featureBatch(spark, sfDir, batchSize = 1).collect().map(key).toSet
    val b64 = Multimodal.featureBatch(spark, sfDir, batchSize = 64).collect().map(key).toSet
    assert(b1 == b64, "batching is an execution detail, never a semantic one")
    Multimodal.featureBatch(spark, sfDir).collect().foreach { r =>
      val e = r.getAs[Double]("entropy")
      assert(e >= 0.0 && e <= 8.0, s"entropy $e out of [0,8] for bytes")
      assert(r.getAs[Long]("distinct_bytes") <= 256)
    }
  }

  test("stream_append_windows emits exactly the watermark-finalized windows") {
    import org.apache.spark.sql.Row
    val complete = CdcStream.windowCounts(spark, sfDir).collect()
    val appended = CdcStream.appendWindows(spark, sfDir).collect()
    val maxTs = graft.Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect().head.getTimestamp(0)
    // Spark's watermark tracker works in epoch millis (floor of the micros).
    val wmMs = maxTs.getTime - 3600 * 1000L
    def key(r: Row) = (r.getAs[java.sql.Timestamp]("window_start"),
      r.getAs[String]("event_type"), r.getAs[Long]("cnt"))
    val expected = complete
      .filter(_.getAs[java.sql.Timestamp]("window_end").getTime <= wmMs)
      .map(key).toSet
    assert(appended.map(key).toSet == expected,
      s"append set (${appended.length}) must equal finalized subset (${expected.size})")
    assert(expected.nonEmpty && appended.length < complete.length,
      "the still-open tail window must NOT have been emitted")
  }

  test("stream_vec_search equals the batch knn join") {
    import org.apache.spark.sql.Row
    def key(rows: Array[Row]) = rows.map(r => (r.getAs[Long]("q_id"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("cos"), r.getAs[Long]("rk"))).toSet
    val live = key(CdcStream.vecSearch(spark, sfDir).collect())
    val batch = key(graft.operators.Similarity.knnJoin(spark, sfDir).collect())
    assert(live == batch, "streamed scoring must equal the batch search")
  }

  test("stream_replay_dedup recovers exact per-channel counts from a replayed stream") {
    val live = CdcStream.replayDedup(spark, sfDir).collect()
      .map(r => r.getAs[Long]("channel") -> r.getAs[Long]("dedup_cnt")).toMap
    val batch = graft.cdc.Cdc.replayDedup(spark, sfDir).collect()
      .map(r => r.getAs[Long]("channel") -> r.getAs[Long]("dedup_cnt")).toMap
    assert(live == batch, "streaming dedup must equal the batch dedup counts")
    // Event-grain state key ((event_id, ts) — cardinality = the stream):
    // the drain must have sized the state store from the stream's VOLUME
    // (footer row count / StreamRowsPerPartition, clamped to [4, cores]).
    // Measured at 100M events: 70.2 s at 4 partitions vs 34.8 s at 16;
    // at 100k events 5.4 s at 32 vs 1.3 s at 4 (r17) — a constant is
    // wrong at one end or the other. Only meaningful without the override.
    if (sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").isEmpty) {
      val rows = graft.Tables.footerRowCount(spark, s"$sfDir/events.parquet")
      assert(CdcStream.lastStateParts ===
        CdcStream.stateParts(CdcStream.StreamKeys(rows)),
        "event-grain streaming state must size to the stream volume")
    }
  }

  test("state-store partition defaults follow the op's state key grain") {
    assume(sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").isEmpty)
    // The sizing reads the SESSION's parallelism (local[4] here), not the
    // box's CPUs — the driver's reduced-core runs must scale down with it.
    // No fixed ceiling: the cap IS the session's parallelism (a wider
    // cluster gets proportionally more state partitions when the volume
    // warrants them).
    val cpus = spark.sparkContext.defaultParallelism
    // The sizing rule itself (SURVEY §5: partitions track state-key
    // cardinality, capped at cores; stream-grain additionally tracks the
    // stream's VOLUME — ~StreamRowsPerPartition state rows per store).
    assert(CdcStream.stateParts(CdcStream.NarrowKeys) === math.min(4, cpus))
    assert(CdcStream.stateParts(CdcStream.StreamKeys(100000L)) === math.min(4, cpus),
      "100k-row stream: fixed per-store costs dominate past ~4 partitions")
    assert(CdcStream.stateParts(CdcStream.StreamKeys(1000000L)) ===
      math.min(10, cpus), "1M-row stream: 10 stores of ~100k rows")
    assert(CdcStream.stateParts(CdcStream.StreamKeys(100000000L)) === cpus,
      "100M-row stream: volume saturates the core cap")
    assert(CdcStream.stateParts(CdcStream.Keyed(2)) === math.min(2, cpus))
    // The production vchannel width (the 256-channel bench decade): caps
    // at cores on this box, sizes to 256 on a ≥256-core cluster. The
    // msgpack assertion below reads Cdc.NumChannels dynamically, so a
    // SPARK_GRAFT_CHANNELS=256 run of this suite round-trips the env too.
    assert(CdcStream.stateParts(CdcStream.Keyed(256)) === math.min(256, cpus))
    assert(CdcStream.stateParts(CdcStream.Keyed(4096)) === cpus)
    // Per-op application, pinned via the partition count the most recent
    // drain actually ran with (this suite is the only one that drains, and
    // tests within a suite run sequentially).
    CdcStream.windowCounts(spark, sfDir).collect(): Unit
    assert(CdcStream.lastStateParts === 4,
      "window-grain state must keep the narrow default")
    CdcStream.msgpackBatch(spark, sfDir).collect(): Unit
    assert(CdcStream.lastStateParts ===
      math.min(graft.cdc.Cdc.NumChannels, cpus),
      "channel-grain state must size to the channel count")
    CdcStream.cdcState(spark, sfDir).collect(): Unit
    assert(CdcStream.lastStateParts === CdcStream.stateParts(CdcStream.StreamKeys(
      graft.Tables.footerRowCount(spark, s"$sfDir/events.parquet"))),
      "PK-grain state must size to the stream volume")
  }
}
