package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: packSequences two-phase plan audit + forced timing. */
object ProbePack {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val q = graft.operators.Pipeline.packSequences(spark, dir)
    Prof.time("pack pass 1")(q.agg(sum(col("tokens_in"))).collect())
    Prof.time("pack pass 2")(q.agg(sum(col("tokens_in"))).collect())
    val plan = q.queryExecution.executedPlan.toString
    println("FileScans: " + "FileScan parquet".r.findAllIn(plan).length)
    println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).length)
    println(plan.take(3000))
    spark.stop()
  }
}
