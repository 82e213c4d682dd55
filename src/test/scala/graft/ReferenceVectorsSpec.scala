package graft

import org.apache.spark.sql.functions._

import graft.cdc.Cdc

/** The reference's OWN test vectors, re-run against graft's operators —
  * each case mirrors a concrete scenario from a milvus-cdc Go test (cited
  * file:line), so agreement here is agreement with the reference's tested
  * behavior, not just with our reading of its source.
  */
class ReferenceVectorsSpec extends SparkSpec {

  test("ts_manager GetMinTS vector: min across channel maxes (ts_manager_test.go:75-101)") {
    // The Go test: channel a collects ts 2, channel b collects ts 1;
    // GetMinTS must return 1 (the min over per-channel high watermarks).
    import spark.implicits._
    val ch = Seq(("a", 2L), ("b", 1L)).toDF("channel", "ts")
    val rows = Cdc.channelWatermarkFrom(ch).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getAs[Long]("global_watermark") == 1L))
    val maxes = rows.map(r => r.getAs[String]("channel") -> r.getAs[Long]("channel_max_ts")).toMap
    assert(maxes == Map("a" -> 2L, "b" -> 1L))
  }

  test("channel mapping vectors: merge 5→2 / split 2→5 fill by averageCnt (channel_mapping.go:27-80)") {
    import spark.implicits._
    def pairs(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getAs[String]("source_channel") -> r.getAs[String]("target_channel")).toSet
    // sourceCnt > targetCnt: averageCnt = ceil(5/2) = 3; greedy index-order
    // fill caps each target at 3 sources (CheckKeyNotExist) →
    // s0,s1,s2 → t0; s3,s4 → t1. Map key = source side.
    val src5 = (0L to 4L).toDF("src_idx")
    val merge = Cdc.channelMappingResolve(src5,
      Seq(("m", 2L)).toDF("scenario", "target_cnt")).collect()
    assert(merge.forall(r => r.getAs[Long]("average_cnt") == 3L &&
      r.getAs[String]("mode") == "source_more" &&
      r.getAs[String]("key_side") == "source"))
    assert(pairs(merge) == Set(
      "by-dev-rootcoord-dml_0" -> "target-rootcoord-dml_0",
      "by-dev-rootcoord-dml_1" -> "target-rootcoord-dml_0",
      "by-dev-rootcoord-dml_2" -> "target-rootcoord-dml_0",
      "by-dev-rootcoord-dml_3" -> "target-rootcoord-dml_1",
      "by-dev-rootcoord-dml_4" -> "target-rootcoord-dml_1"))
    // sourceCnt < targetCnt: averageCnt = ceil(5/2) = 3; each source takes
    // at most 3 targets → t0,t1,t2 → s0; t3,t4 → s1. Map key = target side.
    val src2 = (0L to 1L).toDF("src_idx")
    val split = Cdc.channelMappingResolve(src2,
      Seq(("s", 5L)).toDF("scenario", "target_cnt")).collect()
    assert(split.forall(r => r.getAs[Long]("average_cnt") == 3L &&
      r.getAs[String]("mode") == "target_more" &&
      r.getAs[String]("key_side") == "target"))
    assert(pairs(split) == Set(
      "by-dev-rootcoord-dml_0" -> "target-rootcoord-dml_0",
      "by-dev-rootcoord-dml_0" -> "target-rootcoord-dml_1",
      "by-dev-rootcoord-dml_0" -> "target-rootcoord-dml_2",
      "by-dev-rootcoord-dml_1" -> "target-rootcoord-dml_3",
      "by-dev-rootcoord-dml_1" -> "target-rootcoord-dml_4"))
    // Equal counts: identity, averageCnt = 1 (channel_mapping.go:65-67).
    val same = Cdc.channelMappingResolve(src2,
      Seq(("e", 2L)).toDF("scenario", "target_cnt")).collect()
    assert(same.forall(r => r.getAs[Long]("average_cnt") == 1L))
    assert(pairs(same) == Set(
      "by-dev-rootcoord-dml_0" -> "target-rootcoord-dml_0",
      "by-dev-rootcoord-dml_1" -> "target-rootcoord-dml_1"))
  }

  test("data barrier vector: fires at ts 2 once BOTH channels pass (data_barrier_test.go:33-64)") {
    // The Go test: a barrier over 2 channels receives time-ticks at ts 2 on
    // v1 and v2; the callback fires with msgTs = 2. With only one channel
    // signalled, it must NOT fire.
    import spark.implicits._
    val ddls = Seq((1L, 2L)).toDF("ddl_id", "ddl_ts")
    val both = Seq(("v1", 2L), ("v2", 2L)).toDF("channel", "ts")
    val fired = Cdc.barrierTsFrom(both, ddls, numChannels = 2).collect()
    assert(fired.length == 1 && fired.head.getAs[Long]("barrier_ts") == 2L)
    val onlyOne = Seq(("v1", 2L)).toDF("channel", "ts")
    assert(Cdc.barrierTsFrom(onlyOne, ddls, numChannels = 2).collect().isEmpty,
      "barrier must wait for every channel")
  }

  test("kafka formatter vector: {name,type,value} marshaling, insert=array / delete=object (kafka_formatter_test.go:71-89)") {
    // The Go test formats an Int64 column through Format(): an InsertParam
    // marshals as a JSON ARRAY of per-column KafkaFormat objects with field
    // order name,type,value (kafka_formatter.go:30-34 struct tag order); a
    // DeleteParam marshals the single PK column as ONE object. Rebuild the
    // expected bytes exactly as Go's json.Marshal would and compare.
    val out = Cdc.kafkaFormat(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)

    val insId = out.filter(col("msg_type") === "insert")
      .orderBy("event_id").limit(1).collect().head.getLong(0)
    val row = ev.filter(col("event_id") === insId).collect().head
    val uid = row.getAs[Long]("user_id")
    val ts = row.getAs[java.sql.Timestamp]("ts")
    val tso = (ts.getTime << 18) + insId % (1L << 18)
    // Backslash before quote — the same order Go json.Marshal (and the
    // operator since round 5) applies; quote-only would silently accept a
    // formatter that stopped escaping backslashes.
    val escapedProps = row.getAs[String]("props")
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val expectedInsert =
      s"""[{"name":"user_id","type":"Int64","value":$uid},""" +
      s"""{"name":"event_id","type":"Int64","value":$insId},""" +
      s"""{"name":"event_type","type":"VarChar","value":"${row.getAs[String]("event_type")}"},""" +
      s"""{"name":"ts","type":"Int64","value":$tso},""" +
      s"""{"name":"props","type":"VarChar","value":"$escapedProps"}]"""
    assert(out.filter(col("event_id") === insId).collect().head.getString(3)
      === expectedInsert)

    val delRow = out.filter(col("msg_type") === "delete")
      .orderBy("event_id").limit(1).collect().head
    val delUid = ev.filter(col("event_id") === delRow.getLong(0))
      .collect().head.getAs[Long]("user_id")
    assert(delRow.getString(3) ===
      s"""{"name":"user_id","type":"Int64","value":$delUid}""")
    out.unpersist()
  }

  test("channel-name vectors: ToPhysicalChannel / GetVChannel (core/util/string_test.go:44-50)") {
    import spark.implicits._
    // The Go test's exact cases: strip everything after the LAST underscore.
    val cases = Seq("abc_" -> "abc", "abc_123" -> "abc", "abc_defgsg" -> "abc",
      "abc___defgsg" -> "abc__", "abcdef" -> "abcdef")
    val got = cases.map(_._1).toDF("v")
      .select(col("v"), Cdc.toPhysicalChannel(col("v")).as("p"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) === want, s"ToPhysicalChannel($in)") }
    val v = Seq(("abc", "m")).toDF("p", "mark")
      .select(Cdc.getVChannel(col("p"), col("mark"))).collect().head.getString(0)
    assert(v === "abc_mv0")
  }

  test("meta-key vectors: task_info / task_position layout (server/store/meta_key_test.go:28-62)") {
    import spark.implicits._
    val r = Seq(("/root", "1234", 5678L)).toDF("root", "task", "coll")
      .select(Cdc.taskInfoKey(col("root"), col("task")).as("ti"),
        Cdc.taskPositionKey(col("root"), col("task"), col("coll")).as("tp"))
      .collect().head
    assert(r.getString(0) === "/root/task_info/1234")
    assert(r.getString(1) === "/root/task_position/1234/5678")
  }

  test("TSO compose vector: ComposeTS(physical, 0) shifts by 18 logical bits (server/cdc_impl.go:781)") {
    // tsoutil.ComposeTS(1732111898778, 0) — the value logged in
    // ts_manager_test.go:107 — must equal physical << 18.
    import spark.implicits._
    val r = Seq(1732111898778L).toDF("phys")
      .select((shiftleft(col("phys"), 18)).as("tso"))
      .collect().head.getAs[Long]("tso")
    assert(r == 1732111898778L << 18)
    assert(r >> 18 == 1732111898778L)
  }

  test("kafka formatter escapes backslash then quote like Go json.Marshal") {
    import spark.implicits._
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        7L, "view", 0.0, """k\v "q""""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Cdc.kafkaFormatProjection(ev).collect().head.getAs[String]("kafka_value")
    // Go json.Marshal escapes backslash and quote: k\v "q  ->  k\\v \"q
    assert(out.contains("""k\\v \"q\""""),
      s"escaped props must appear JSON-escaped in the message, got: $out")
    // The message must stay valid JSON: round-trip the props field.
    val parsed = Seq(out).toDF("j")
      .select(get_json_object(col("j"), "$[4].value").as("v"))
      .collect().head.getString(0)
    assert(parsed === """k\v "q"""", s"JSON round-trip must recover the raw props, got: $parsed")
  }

  test("name mapping vector: exact / db-wildcard / default-db resolution (channel_writer.go:1208-1226)") {
    // mapDBAndCollectionName: "" db defaults to "default"
    // (milvus_client_resource.go:41); an exact db.collection rule remaps
    // both names; a db.* rule remaps the db only; otherwise unchanged.
    import spark.implicits._
    val colls = Seq(
      ("", "users"),          // default-db + exact rule -> fully remapped
      ("db1", "orders"),      // wildcard rule -> db remapped, name kept
      ("db2", "events"))      // no rule -> unchanged
      .toDF("source_db", "source_collection")
    val exact = Seq(("default", "users", "backup", "users_replica"))
      .toDF("rule_src_db", "rule_src_coll", "rule_dst_db", "rule_dst_coll")
    val wild = Seq(("db1", "db1_replica")).toDF("wild_src_db", "wild_dst_db")
    val out = Cdc.nameMappingResolve(colls, exact, wild).collect()
      .map(r => r.getAs[String]("source_collection") ->
        (r.getAs[String]("target_db"), r.getAs[String]("target_collection"),
          r.getAs[String]("rule"))).toMap
    assert(out("users") === (("backup", "users_replica", "exact")))
    assert(out("orders") === (("db1_replica", "orders", "db_wildcard")))
    assert(out("events") === (("db2", "events", "none")))
  }

  test("ValidData vector: equal max insert/delete ts counts as alive (data_diff/main.go:160-175)") {
    // The Go ValidData check is insertTs >= deleteTs — a tie means the
    // upsert wins. Encode the tie case directly.
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, false), (1L, 10L, true), // tie at ts 10 -> alive
      (2L, 5L, false), (2L, 6L, true) // delete after -> dead
    ).toDF("user_id", "ts", "is_delete")
    val alive = ev.groupBy(col("user_id"))
      .agg(max(when(!col("is_delete"), col("ts"))).as("u"),
        max(when(col("is_delete"), col("ts"))).as("d"))
      .filter(col("u").isNotNull && (col("d").isNull || col("u") >= col("d")))
      .collect().map(_.getAs[Long]("user_id")).toSet
    assert(alive == Set(1L))
  }
}
