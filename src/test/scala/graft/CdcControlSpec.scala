package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.cdc.Cdc

/** Control-plane semantics: DDL catalog apply, task-metadata fold,
  * multi-collection watermark, Kafka message format — the round-4 surface
  * mirroring channel_writer.go initAPIEventFuncs, server/cdc_api.go, and
  * kafka_formatter.go.
  */
class CdcControlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ddl_apply folds create/drop into catalog state by barrier order") {
    // Collection 0: create → create_partition → drop_partition  (alive, 0 parts)
    // Collection 1: create (later ddl_id) but DROP applies LAST by barrier_ts
    //   even though its ddl_id is smaller — application order is
    //   (barrier_ts, ddl_id), not ddl_id.
    // Collection 2: partition ops only, never created → not alive.
    val ops = Seq(
      (1000L, ts("2024-01-01 00:00:00"), 0L, "create_collection"),
      (1500L, ts("2024-01-02 00:00:00"), 0L, "create_partition"),
      (2000L, ts("2024-01-03 00:00:00"), 0L, "drop_partition"),
      (2500L, ts("2024-01-05 00:00:00"), 1L, "drop_collection"),
      (3000L, ts("2024-01-04 00:00:00"), 1L, "create_collection"),
      (3500L, ts("2024-01-01 00:00:00"), 2L, "create_partition"))
      .toDF("ddl_id", "barrier_ts", "collection_id", "op")
    val out = Cdc.ddlApplyFrom(ops).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getBoolean(1) === true)   // alive
    assert(out(0L).getLong(5) === 0L)        // live_partitions
    assert(out(0L).getLong(2) === 3L)        // n_ddls
    assert(out(1L).getBoolean(1) === false,
      "drop_collection applies last by barrier_ts despite smaller ddl_id")
    assert(out(2L).getBoolean(1) === false, "never-created collection is not alive")
    assert(out(2L).getLong(5) === 1L)
  }

  test("task_state folds op log last-write-wins and joins positions") {
    val ops = Seq(
      (0L, "create", ts("2024-01-01 00:00:00"), 1L),
      (0L, "pause", ts("2024-01-02 00:00:00"), 2L),
      (1L, "create", ts("2024-01-01 00:00:00"), 3L),
      (1L, "pause", ts("2024-01-02 00:00:00"), 4L),
      (1L, "resume", ts("2024-01-03 00:00:00"), 5L),
      (2L, "delete", ts("2024-01-04 00:00:00"), 6L))
      .toDF("task_id", "op", "ts", "event_id")
    val positions = Seq(
      (0L, ts("2024-02-01 00:00:00"), 100L),
      (1L, ts("2024-02-02 00:00:00"), 101L),
      (2L, ts("2024-02-03 00:00:00"), 102L))
      .toDF("channel", "pts", "pid")
      .select(col("channel"), struct(col("pts").as("ts"), col("pid").as("event_id")).as("p"))
    val out = Cdc.taskStateFrom(ops, positions).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) === "Paused")
    assert(out(1L).getString(1) === "Running")
    assert(out(2L).getString(1) === "Deleted")
    assert(out(1L).getLong(2) === 3L)                 // n_ops
    assert(out(1L).getLong(6) === 101L)               // pos_event_id
    assert(out(0L).getTimestamp(5) === ts("2024-02-01 00:00:00"))
  }

  test("task_state last-op tiebreak follows (ts, event_id)") {
    val ops = Seq(
      (0L, "pause", ts("2024-01-01 00:00:00"), 1L),
      (0L, "resume", ts("2024-01-01 00:00:00"), 2L)) // same ts, larger id wins
      .toDF("task_id", "op", "ts", "event_id")
    val positions = Seq((0L, ts("2024-02-01 00:00:00"), 9L))
      .toDF("channel", "pts", "pid")
      .select(col("channel"), struct(col("pts").as("ts"), col("pid").as("event_id")).as("p"))
    val out = Cdc.taskStateFrom(ops, positions).collect().head
    assert(out.getString(1) === "Running")
    assert(out.getString(3) === "resume")
  }

  test("collection_watermark: per-collection min across its channel maxes") {
    val rows = Cdc.collectionWatermark(spark, sfDir).collect()
    assert(rows.length === 12, "3 collections x 4 channels")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val expect = rs.map(_.getTimestamp(2)).min
      assert(rs.forall(_.getTimestamp(4) === expect),
        "collection watermark must equal min of its channels' max ts")
      assert(rs.map(_.getLong(1)).toSet === Set(0L, 1L, 2L, 3L),
        "every collection spans all channels")
    }
  }

  test("position_log: reload pending equals an independent replay count") {
    val ev = Tables.events(spark, sfDir)
      .select((col("user_id") % 3).as("coll"), (col("user_id") % 4).as("chan"),
        col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime * 1000 +
        r.getTimestamp(2).getNanos / 1000 % 1000, r.getLong(3)))
    val out = Cdc.positionLog(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (coll, chan) = (r.getLong(0), r.getLong(1))
      val posTs = r.getTimestamp(3)
      val posMicros = posTs.getTime * 1000 + posTs.getNanos / 1000 % 1000
      val posId = r.getLong(4)
      assert(posId % 100 === 0, "a persisted position must be a save point")
      val expectPending = ev.count { case (c, h, t, id) =>
        c == coll && h == chan && (t > posMicros || (t == posMicros && id > posId))
      }
      assert(r.getLong(5) === expectPending.toLong,
        s"($coll,$chan): reload must re-consume exactly the post-position tail")
    }
  }

  test("op_messages folds index/load/partition flags last-write-wins (sf0.01 markers)") {
    val out = Cdc.opMessages(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty, "sf0.01 must contain op-message markers")
    out.foreach { r =>
      val (nFlushes, nImports, nOps) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(nOps >= nFlushes + nImports, "n_ops covers every collection-scoped op")
      Seq(1, 3, 4).foreach(i => assert(!r.isNullAt(i), "flags must never be null"))
    }
  }

  test("op log covers the writer's full 23-type dispatch map at sf0.01") {
    // channel_writer.go:117-141 (22 op types) + Import: the surrogate log
    // must exercise every type so the folds are tested on live data.
    val k = expr("event_id DIV 137")
    val seen = Tables.events(spark, "/root/testdata/sf0.01")
      .filter(pmod(col("event_id"), lit(137)) === 0)
      .select(element_at(
        array(Cdc.OpMessageNames.map(lit): _*),
        (pmod(k, lit(Cdc.OpMessageNames.size)) + 1).cast("int")).as("op"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(seen === Cdc.OpMessageNames.toSet,
      s"missing op types at sf0.01: ${Cdc.OpMessageNames.toSet -- seen}")
  }

  test("rbac_state folds lifecycle + grant ops last-write-wins") {
    // credential 7: create → update (bump) → delete  ⇒ dead, version 1
    // role 2: create, two privilege operates           ⇒ alive, version 2
    // user_role (u=7, r=2): grant then revoke LATER    ⇒ dead
    // database 1: create → alter → alter               ⇒ alive, version 2
    val log = Seq(
      ("create_credential", 0L, 7L, 0L, 0L, "grant", ts("2024-01-01 00:00:00"), 1L),
      ("update_credential", 0L, 7L, 0L, 0L, "grant", ts("2024-01-02 00:00:00"), 2L),
      ("delete_credential", 0L, 7L, 0L, 0L, "grant", ts("2024-01-03 00:00:00"), 3L),
      ("create_role", 0L, 0L, 2L, 0L, "grant", ts("2024-01-01 00:00:00"), 4L),
      ("operate_privilege", 0L, 0L, 2L, 0L, "grant", ts("2024-01-02 00:00:00"), 5L),
      ("operate_privilege_v2", 0L, 0L, 2L, 0L, "grant", ts("2024-01-03 00:00:00"), 6L),
      ("operate_user_role", 0L, 7L, 2L, 0L, "grant", ts("2024-01-04 00:00:00"), 7L),
      ("operate_user_role", 0L, 7L, 2L, 0L, "revoke", ts("2024-01-05 00:00:00"), 8L),
      ("create_database", 1L, 0L, 0L, 0L, "grant", ts("2024-01-01 00:00:00"), 9L),
      ("alter_database", 1L, 0L, 0L, 0L, "grant", ts("2024-01-02 00:00:00"), 10L),
      ("alter_database", 1L, 0L, 0L, 0L, "grant", ts("2024-01-03 00:00:00"), 11L))
      .toDF("op", "db_id", "user_sid", "role_id", "group_id", "action", "ts", "event_id")
    val out = Cdc.rbacStateFrom(log).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("credential", 7L)).getBoolean(2) === false, "deleted credential is dead")
    assert(out(("credential", 7L)).getLong(3) === 1L)   // one update
    assert(out(("role", 2L)).getBoolean(2) === true)
    assert(out(("role", 2L)).getLong(3) === 4L,
      "role version counts user-role + privilege operates")
    assert(out(("user_role", 7L * 4 + 2L)).getBoolean(2) === false,
      "revoke after grant leaves the pair dead")
    assert(out(("database", 1L)).getBoolean(2) === true)
    assert(out(("database", 1L)).getLong(3) === 2L)     // two alters
    assert(!out.contains(("privilege_group", 0L)), "no group ops in this log")
  }

  test("position_codec: blob equals an independent protobuf encoder; roundtrip holds") {
    val rows = Cdc.positionCodec(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"), s"decode(encode(p)) != p for $r")
      // The 9-byte varint layout assumes TSO in [2^56, 2^63) — true for
      // any ms epoch after 1978 shifted by 18 logical bits.
      val tso = (r.getAs[Long]("decoded_phys_ms") << 18)
      assert(tso >= (1L << 56) && tso > 0, s"TSO $tso outside the 9-byte varint range")
      // Independent imperative encoder (plain JVM bytes, no Spark/SQL):
      // field 1 name, field 2 8-byte BE msgID, field 4 varint timestamp.
      val name = r.getAs[String]("decoded_channel_name").getBytes("UTF-8")
      val id = r.getAs[Long]("decoded_event_id")
      val fullTso = tso + (id % (1L << 18))
      val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
      bb += 0x0A.toByte += name.length.toByte ++= name
      bb += 0x12.toByte += 8.toByte
      (7 to 0 by -1).foreach(i => bb += ((id >>> (8 * i)) & 0xFF).toByte)
      bb += 0x20.toByte
      var v = fullTso
      while ((v & ~0x7FL) != 0) { bb += ((v & 0x7F) | 0x80).toByte; v >>>= 7 }
      bb += v.toByte
      val expected = java.util.Base64.getEncoder.encodeToString(bb.toArray)
      assert(r.getAs[String]("pos_b64") === expected,
        "columnar encode must equal the imperative protobuf encoding byte-for-byte")
    }
  }

  test("kafka_format produces the reference's message shapes") {
    val out = Cdc.kafkaFormat(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
    assert(out.count() === ev.count(), "one message per change event")
    assert(out.filter(col("msg_type") === "delete").count() ===
      ev.filter(col("event_type") === "error").count())
    // Inserts: JSON array of {name,type,value} per column (InsertParam
    // branch, kafka_formatter.go:44-61); get_json_object returns null on
    // malformed JSON, so these also validate well-formedness.
    val ins = out.filter(col("msg_type") === "insert")
      .select(col("event_id"),
        get_json_object(col("kafka_value"), "$[0].name").as("n0"),
        get_json_object(col("kafka_value"), "$[1].value").as("v1"),
        get_json_object(col("kafka_value"), "$[2].type").as("t2"))
    assert(ins.filter(col("n0") =!= "user_id" || col("t2") =!= "VarChar" ||
      col("v1") =!= col("event_id").cast("string")).count() === 0)
    // Deletes: a single {name,type,value} object for the PK column
    // (DeleteParam branch, kafka_formatter.go:62-76).
    val del = out.filter(col("msg_type") === "delete")
      .select(get_json_object(col("kafka_value"), "$.name").as("n"),
        get_json_object(col("kafka_value"), "$.type").as("t"))
    assert(del.filter(col("n") =!= "user_id" || col("t") =!= "Int64").count() === 0)
    out.unpersist()
  }

  test("msgpack_batch matches a direct replay of packer.Receive (count, size, open tails)") {
    // One channel exercising every rule: two count-capped packs, a pack cut
    // short by an oversize message, back-to-back oversize messages
    // (singleton 'size' packs), an exactly-full pack CLOSED by an oversize
    // message (size wins over count — Receive checks size first), and a
    // short open tail.
    val sizes = Seq.fill(10)(50L) ++ Seq.fill(10)(60L) ++ // 2 count packs
      Seq(50L, 50L, 9999L) ++                             // size-cut pack of 3
      Seq(8888L, 7777L) ++                                // 2 singleton size packs
      (Seq.fill(9)(40L) :+ 5555L) ++                      // 10th msg oversize → 'size'
      Seq(30L, 30L, 30L)                                  // open tail of 3
    val msgs = sizes.zipWithIndex.map { case (sz, i) => (i.toLong * 7 + 3, sz) }
    val expected = PackerReference.fold(msgs, maxCount = 10, maxBytes = 1000L)
    val df = msgs.map { case (id, sz) => (0L, id, sz) }
      .toDF("channel", "event_id", "sz")
    val got = Cdc.msgpackBatchFrom(df, 10, 1000L)
      .orderBy(col("batch_id")).collect()
      .map(r => (r.getAs[Long]("n_msgs"), r.getAs[Long]("batch_bytes"),
        r.getAs[Long]("first_event_id"), r.getAs[Long]("last_event_id"),
        r.getAs[String]("reason"))).toSeq
    assert(got === expected)
    assert(expected.map(_._5).toSet === Set("count", "size", "open"),
      "the vector must exercise all three flush reasons")
  }

  test("task_metrics: counters partition the watched channels' stream; state matches the task fold") {
    val rows = Cdc.taskMetrics(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Counter totals must equal the raw event counts on the channels of
    // REGISTERED tasks (a task exists only once its op log has an entry —
    // at sf0.001 the sparse op-log surrogate registers fewer than NumTasks).
    val present = rows.map(_.getAs[Long]("task_id")).distinct.sorted
    val watched = graft.Tables.events(spark, sfDir)
      .filter(pmod(col("user_id"), lit(Cdc.NumChannels)).isin(present: _*)).count()
    assert(rows.map(_.getAs[Long]("replicate_cnt")).sum === watched)
    // One gauge value per task — identical to cdc_task_state's fold.
    val states = Cdc.taskState(spark, sfDir).collect()
      .map(r => r.getAs[Long]("task_id") -> r.getAs[String]("state")).toMap
    rows.foreach { r =>
      assert(r.getAs[String]("state") === states(r.getAs[Long]("task_id")))
      assert(r.getAs[Long]("replicate_bytes") >= 100 * r.getAs[Long]("replicate_cnt"),
        "byte counter must accumulate the per-message size surrogate")
    }
  }

  test("msgpack_batch: batches partition each channel's stream in order, sizes bounded") {
    val out = Cdc.msgpackBatch(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("channel")).foreach { case (_, rows) =>
      val byId = rows.sortBy(_.getAs[Long]("batch_id"))
      // Contiguous, non-overlapping event ranges; counts within MaxCount.
      byId.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_event_id") < b.getAs[Long]("first_event_id"))
        case _ => ()
      }
      byId.foreach { r =>
        assert(r.getAs[Long]("n_msgs") <= Cdc.PackMaxCount)
        val open = r.getAs[String]("reason") == "open"
        if (open) assert(r.getAs[Long]("batch_id") === byId.last.getAs[Long]("batch_id"),
          "an open pack can only be the channel tail")
      }
    }
  }
}
