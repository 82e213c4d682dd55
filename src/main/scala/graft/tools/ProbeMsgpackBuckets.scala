package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: same-session A/B of [[graft.cdc.Cdc.msgpackBatchFrom]]'s
  * bucket width at a given channel count — the box's day-to-day noise made
  * fresh-JVM comparisons of the 100M-event corpus unreliable (±2x), so
  * this times every width in one JVM, interleaved, twice, with a result
  * checksum to pin width-invariance of the answer.
  *
  * Usage: SPARK_GRAFT_CHANNELS=256 SPARK_GRAFT_SF_DIR=... MAIN=graft.tools
  * .ProbeMsgpackBuckets scripts/bench.sh 4096 65536 262144
  */
object ProbeMsgpackBuckets {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val widths = if (args.nonEmpty) args.map(_.toLong) else Array(4096L, 65536L, 262144L)
    val nch = graft.cdc.Cdc.NumChannels
    println(s"[mp] channels=$nch widths=${widths.mkString(",")}")
    val msgs = graft.Tables.events(spark, dir).select(
      pmod(col("user_id"), lit(nch)).as("channel"),
      col("event_id"), graft.cdc.Cdc.packMsgBytes.as("sz"))
    def run(w: Long): Unit = {
      val df = graft.cdc.Cdc.msgpackBatchFromWidth(msgs, 10, 1050L, w)
      val sig = Prof.time(s"width=$w")(
        df.select(xxhash64(col("channel"), col("batch_id"),
            col("n_msgs"), col("batch_bytes"), col("first_event_id"),
            col("last_event_id"), col("reason")).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0).toSeq)
      println(s"[mp] width=$w sig=$sig")
    }
    for (pass <- 1 to 2; w <- widths) { println(s"[mp] pass $pass"); run(w) }
    spark.stop()
  }
}
