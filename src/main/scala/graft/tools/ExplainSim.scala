package graft.tools
object ExplainSim {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val fps = graft.operators.Dedup.testSimhashFingerprints(spark, "/root/testdata/sf0.01")
    println(fps.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
