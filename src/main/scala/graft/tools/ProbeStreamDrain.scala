package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: phase timing of one memory-sink stream drain (the stateless
  * kafka-format projection — no state store, so what's left is pure
  * microbatch machinery: query start, file-source listing, batch
  * planning/execution, commit, stop).
  */
object ProbeStreamDrain {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.CdcStream.kafkaFormat(spark, dir).count() // warm
    (1 to 3).foreach { i =>
      val ev = graft.streaming.CdcStream.eventsStream(spark, dir)
        .select(col("event_id"), timestamp_micros(expr("ts DIV 1000")).as("ts"),
          col("user_id"), col("event_type"), col("props"))
      val out = graft.cdc.Cdc.kafkaFormatProjection(ev)
      val q = Prof.time(s"#$i start")(
        out.writeStream.format("memory").queryName(s"probe_drain_$i")
          .outputMode("append").start())
      Prof.time(s"#$i processAllAvailable")(q.processAllAvailable())
      Prof.time(s"#$i stop")(q.stop())
      Prof.time(s"#$i read sink")(spark.table(s"probe_drain_$i").count())
      spark.catalog.dropTempView(s"probe_drain_$i")
    }
    spark.stop()
  }
}
