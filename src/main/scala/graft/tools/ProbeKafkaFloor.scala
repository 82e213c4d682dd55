package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: attribute stream_kafka_format's 100M-event cost (12-16 s in
  * the r15 events1000x runs, channel-invariant) before anyone "optimizes"
  * it blind. The batch cdc_kafka_format bench rows (0.3-0.4 s) are NOT the
  * formatter's cost — bench's `.count()` prunes the projection to a
  * row-count scan. This probe forces the formatter two ways:
  *   1. agg over length(kafka_value) — scan + format, no sink: the pure
  *      serialization floor, with realized bytes/s;
  *   2. parquet write — scan + format + the same sink the stream drain
  *      pays.
  * If (2) ≈ the stream's 12-16 s, the stream op is AT its floor (format +
  * sink IO) and the residual stream machinery is thin.
  */
object ProbeKafkaFloor {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val fmt = graft.cdc.Cdc.kafkaFormat(spark, dir)

    (1 to 2).foreach { p =>
      val r = Prof.time(s"format+agg pass $p")(
        fmt.agg(count(lit(1)).as("n"), sum(length(col("kafka_value"))).as("bytes"))
          .collect()(0))
      println(s"[kafka] rows=${r.getLong(0)} bytes=${r.getLong(1)} " +
        f"(${r.getLong(1) / 1e9}%.2f GB)")
    }
    val sink = java.nio.file.Files.createTempDirectory("kafka-floor-").toFile
    try {
      (1 to 2).foreach { p =>
        Prof.time(s"format+parquet write pass $p")(
          fmt.write.mode("overwrite").parquet(new java.io.File(sink, s"p$p").getPath))
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(sink)
    }
    spark.stop()
  }
}
