package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}

/** Dev-only: the "decide-with-small-rows" ops scan events twice (grid
  * branch + row branch). This probe A/Bs the accepted double scan against
  * a variant that caches the shared narrow frame INSIDE the timed query —
  * the VERDICT-r17 question "does the second narrow scan actually matter"
  * — on cdc_barrier_ts and cdc_msgpack_batch at the current SF dir.
  */
object ProbeSharedScan {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.cdc.Cdc

    def barrierCached(): Long = {
      val ev = graft.Tables.events(spark, dir)
      val ddls = ev.filter(col("event_type") === "signup" && col("event_id") % 500 === 0)
        .select(col("event_id").as("ddl_id"), col("ts").as("ddl_ts"))
      val ch = ev.select(pmod(col("user_id"), lit(Cdc.NumChannels)).as("channel"), col("ts"))
      val evTsType = ch.schema("ts").dataType
      val ddlIdType = ddls.schema("ddl_id").dataType
      val probes = ddls.crossJoin(ch.select(col("channel")).distinct())
      val evU = ch.select(col("channel"), col("ts"), col("ts").as("ev_ts"),
        lit(null).cast(ddlIdType).as("ddl_id"),
        lit(null).cast(evTsType).as("ddl_ts"), lit(0).as("is_probe"))
      val prU = probes.select(col("channel"), col("ddl_ts").as("ts"),
        lit(null).cast(evTsType).as("ev_ts"),
        col("ddl_id"), col("ddl_ts"), lit(1).as("is_probe"))
      val all = evU.unionAll(prU)
        .withColumn("bucket", expr(s"CAST(ts AS LONG) DIV 86400")).cache()
      try {
        val wLater = Window.partitionBy(col("channel")).orderBy(col("bucket"))
          .rowsBetween(1, Window.unboundedFollowing)
        val bucketGrid = all.groupBy(col("channel"), col("bucket"))
          .agg(min(when(col("is_probe") === 0, col("ev_ts"))).as("bmin"))
          .withColumn("later_min", min(col("bmin")).over(wLater))
          .drop("bmin")
        val wIn = Window.partitionBy(col("channel"), col("bucket"))
          .orderBy(col("ts").desc, col("is_probe").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val crossings = all
          .withColumn("in_bucket_min", min(col("ev_ts")).over(wIn))
          .filter(col("is_probe") === 1)
          .join(broadcast(bucketGrid), Seq("channel", "bucket"))
          .withColumn("first_crossing", least(col("in_bucket_min"), col("later_min")))
          .filter(col("first_crossing").isNotNull)
        crossings.groupBy(col("ddl_id"), col("ddl_ts"))
          .agg(count(lit(1)).as("channels_crossed"),
            max(col("first_crossing")).as("barrier_ts"))
          .filter(col("channels_crossed") === Cdc.NumChannels)
          .count()
      } finally { all.unpersist(): Unit }
    }

    def msgpackCached(): Long = {
      val maxCount = Cdc.PackMaxCount
      val maxBytes = Cdc.PackMaxMsgBytes
      val bucketSize = math.min(65536L, 4096L * math.max(1L, Cdc.NumChannels / 4L))
      val msgs = graft.Tables.events(spark, dir).select(
        pmod(col("user_id"), lit(Cdc.NumChannels)).as("channel"),
        col("event_id"), Cdc.packMsgBytes.as("sz"))
      val e = msgs
        .withColumn("bucket", col("event_id") - pmod(col("event_id"), lit(bucketSize)))
        .withColumn("ov", (col("sz") > maxBytes).cast("long")).cache()
      try {
        val wBuckets = Window.partitionBy(col("channel")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bstats = e.groupBy(col("channel"), col("bucket"))
          .agg(count(lit(1)).as("bcnt"), sum(col("ov")).as("bov"))
          .withColumn("prev_cnt", coalesce(sum(col("bcnt")).over(wBuckets), lit(0L)))
          .withColumn("prev_ov", coalesce(sum(col("bov")).over(wBuckets), lit(0L)))
          .select(col("channel"), col("bucket"), col("prev_cnt"), col("prev_ov"))
        val wRow = Window.partitionBy(col("channel"), col("bucket")).orderBy(col("event_id"))
        val rows = e.join(bstats, Seq("channel", "bucket"))
          .withColumn("seq", col("prev_cnt") + row_number().over(wRow))
          .withColumn("seg", col("prev_ov") + coalesce(
            sum(col("ov")).over(wRow.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
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
            when(col("has_ov") === 1L, lit("size"))
              .when(col("n_msgs") === maxCount, lit("count"))
              .otherwise(lit("open")).as("reason"))
          .count()
      } finally { e.unpersist(): Unit }
    }

    graft.cdc.Cdc.barrierTs(spark, dir).count() // warm
    graft.cdc.Cdc.msgpackBatch(spark, dir).count()
    (1 to 3).foreach { i =>
      Prof.time(s"#$i barrier double-scan")(
        graft.cdc.Cdc.barrierTs(spark, dir).count())
      Prof.time(s"#$i barrier cached-union")(barrierCached())
      Prof.time(s"#$i msgpack double-scan")(
        graft.cdc.Cdc.msgpackBatch(spark, dir).count())
      Prof.time(s"#$i msgpack cached-narrow")(msgpackCached())
    }
    spark.stop()
  }
}
