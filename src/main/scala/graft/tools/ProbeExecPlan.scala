package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the EXECUTED (AQE-final) plan of one declared query: run it,
  * then dump queryExecution — shows ReusedExchange / runtime join
  * strategy that pre-execution EXPLAIN cannot (r17 plan audits).
  * Usage: ProbeExecPlan <query> [sfDir].
  */
object ProbeExecPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.count(): Unit
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
