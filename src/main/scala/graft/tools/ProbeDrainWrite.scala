package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: is the parquet-drain's per-batch write serialized on the
  * source's split count? A single-file 100k-row corpus is one split, so
  * the whole formatted emission encodes on one core. A/B the batch write
  * as-is vs round-robin-spread across the session's cores.
  */
object ProbeDrainWrite {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("props"))
    val out = graft.cdc.Cdc.kafkaFormatProjection(ev)
    out.write.format("noop").mode("overwrite").save() // warm
    val par = spark.sparkContext.defaultParallelism
    (1 to 3).foreach { i =>
      val d1 = java.nio.file.Files.createTempDirectory("probe-dw-").toFile
      Prof.time(s"#$i write as-is") {
        out.write.mode("append").parquet(d1.getPath)
      }
      val d2 = java.nio.file.Files.createTempDirectory("probe-dw-").toFile
      Prof.time(s"#$i write spread($par)") {
        out.repartition(par).write.mode("append").parquet(d2.getPath)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d1); rm(d2)
    }
    spark.stop()
  }
}
