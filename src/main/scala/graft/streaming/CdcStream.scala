package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Live CDC replication on Structured Streaming — the reference's runtime
  * shape (an ordered change stream folded into per-PK state, with windowed
  * flow metrics), re-expressed as `readStream` → stateful transform →
  * memory sink.
  *
  * Reference semantics: milvus-cdc's replicate channel manager consumes
  * per-channel Insert/Delete streams and folds them into collection state
  * (`server/tool/data_diff/main.go:160-175` ValidData: a PK is alive iff
  * max(insert_ts) >= max(delete_ts)); here `mapGroupsWithState` holds that
  * fold per PK incrementally — the streaming answer equals the batch
  * [[graft.cdc.Cdc.stateSnapshot]], which is exactly what the driver's
  * oracle checks.
  *
  * Scale posture: state is hash-partitioned by PK across executors (RocksDB/
  * HDFS state store on a real cluster); each microbatch shuffles only its
  * delta on the PK key — the 100 TB history never re-materializes.
  * Model follows "Structured Streaming: A Declarative API for Real-Time
  * Applications in Apache Spark" (SIGMOD 2018): incremental view of a
  * batch-equivalent query, which is exactly why the streaming answers can
  * share the batch oracles.
  */
object CdcStream {

  /** One CDC change event (ts in epoch micros — parquet nanos DIV 1000). */
  case class Ev(user_id: Long, tsMicros: Long, event_type: String)

  /** Per-PK fold state: running max upsert/delete ts + counts. */
  case class PkState(lastUpsert: Long, lastDelete: Long, upserts: Long, deletes: Long)

  /** Emitted snapshot row per PK (micros; converted to timestamps on output). */
  case class PkRow(user_id: Long, lastUpsert: Long, lastDelete: Long,
      upserts: Long, deletes: Long)

  private val Sentinel = Long.MinValue
  private val nameSeq = new AtomicInteger(0)

  /** The events parquet as an unbounded stream (file source; ts arrives as
    * raw nanos because parquet TIMESTAMP(NANOS) isn't a Spark type).
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // File-source streams take a directory; select just the events file.
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Run a streaming DataFrame to completion into a memory sink and return
    * the materialized table (bounded input → the stream drains and stops).
    */
  private def drain(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${nameSeq.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  private[graft] def foldPk(userId: Long, evs: Iterator[Ev],
      state: GroupState[PkState]): PkRow = {
    var s = state.getOption.getOrElse(PkState(Sentinel, Sentinel, 0L, 0L))
    evs.foreach { e =>
      s = if (e.event_type == "error")
        s.copy(lastDelete = math.max(s.lastDelete, e.tsMicros), deletes = s.deletes + 1)
      else
        s.copy(lastUpsert = math.max(s.lastUpsert, e.tsMicros), upserts = s.upserts + 1)
    }
    state.update(s)
    PkRow(userId, s.lastUpsert, s.lastDelete, s.upserts, s.deletes)
  }

  /** Live per-PK alive-state via mapGroupsWithState; answer ≡ the batch
    * snapshot, so it shares that oracle.
    */
  def cdcState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs: Dataset[Ev] = eventsStream(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("tsMicros"), col("event_type"))
      .as[Ev]
    val folded = evs.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(foldPk)
    val out = drain(folded.toDF(), "update")
    out
      .select(col("user_id"), pmod(col("user_id"), lit(4)).cast("long").as("channel"),
        when(col("lastUpsert") =!= Sentinel, timestamp_micros(col("lastUpsert"))).as("last_upsert_ts"),
        when(col("lastDelete") =!= Sentinel, timestamp_micros(col("lastDelete"))).as("last_delete_ts"),
        col("upserts"), col("deletes"))
      .filter(col("last_upsert_ts").isNotNull &&
        (col("last_delete_ts").isNull || col("last_upsert_ts") >= col("last_delete_ts")))
  }

  /** End-to-end replication: the live fold streamed into a parquet
    * change-log sink (append mode, one file set per microbatch), plus
    * [[replicaView]] to read the downstream replica back. This is the
    * reference's writer half (core/writer/channel_writer.go:118-139 hands
    * folded changes to the downstream; here the downstream is a lake table).
    *
    * Scale posture: the sink appends only per-batch deltas (update-mode
    * emissions), partitioned by channel; the replica view folds the log by
    * PK at read time — the same last-write-wins fold the reference's target
    * applies on upsert. Nothing rewrites history.
    */
  def replicate(spark: SparkSession, dir: String, sinkDir: String): Unit = {
    import spark.implicits._
    val evs = eventsStream(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("tsMicros"), col("event_type"))
      .as[Ev]
    val folded = evs.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(foldPk)
    val q = folded.toDF()
      .withColumn("channel", pmod(col("user_id"), lit(4)))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").partitionBy("channel").parquet(sinkDir)
      }
      .option("checkpointLocation", s"$sinkDir-ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** The downstream replica: fold the change log last-write-wins per PK.
    * (batch_id, lastUpsert) is monotone per key, so max_by over it recovers
    * the newest emission — one shuffle on the PK.
    */
  def replicaView(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("lastUpsert"), col("lastDelete"), col("upserts"), col("deletes")),
        col("batch_id")).as("m"))
      .select(col("user_id"), pmod(col("user_id"), lit(4)).cast("long").as("channel"),
        when(col("m.lastUpsert") =!= Sentinel, timestamp_micros(col("m.lastUpsert"))).as("last_upsert_ts"),
        when(col("m.lastDelete") =!= Sentinel, timestamp_micros(col("m.lastDelete"))).as("last_delete_ts"),
        col("m.upserts").as("upserts"), col("m.deletes").as("deletes"))
      .filter(col("last_upsert_ts").isNotNull &&
        (col("last_delete_ts").isNull || col("last_upsert_ts") >= col("last_delete_ts")))

  /** Streaming windowed counts per event type with a watermark — the
    * reference's per-channel flow metrics (msg counting between positions)
    * as a live daily-tumbling aggregate. Complete mode: bounded input, the
    * final state is the full history aggregate (oracle: date_trunc in SQL).
    */
  def windowCounts(spark: SparkSession, dir: String): DataFrame = {
    val withTs = eventsStream(spark, dir)
      .select(timestamp_micros(expr("ts DIV 1000")).as("ts"), col("event_type"))
      .withWatermark("ts", "1 hour")
    val counts = withTs
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    drain(counts, "complete")
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("cnt"))
  }
}
