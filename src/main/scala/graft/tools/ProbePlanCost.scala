package graft.tools

/** Dev-only: split one declared query's wall time into plan-side cost
  * (analysis + optimization + physical planning, driver-only) vs
  * execution (noop write of the planned frame), warm. Usage:
  * ProbePlanCost <query> [reps].
  */
object ProbePlanCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Prof.session()
    val dir = Prof.sfDir
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm: JIT, codegen cache, footer probes
    (1 to reps).foreach { i =>
      val df = Prof.time(s"#$i build+analyze")(fn(spark, dir))
      Prof.time(s"#$i optimize+plan") {
        df.queryExecution.executedPlan
        ()
      }
      Prof.time(s"#$i execute(noop)") {
        df.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
