package graft.tools

/** Dev-only: assert the banded-candidate self-join shares its shuffle
  * (ReusedExchange) instead of re-running the signature + bucket aggs.
  */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val g = graft.operators.Dedup.testShingles(graft.Tables.documents(spark, dir))
    val plan = graft.operators.Dedup.testBandedCandidates(g)
      .queryExecution.executedPlan.toString
    val nReuse = "ReusedExchange".r.findAllIn(plan).length
    val nAgg = "collect_list".r.findAllIn(plan).length
    println(s"[probe] ReusedExchange=$nReuse collect_list_ops=$nAgg")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("HashAggregate") || l.contains("Join"))
      .take(30).mkString("\n"))
    spark.stop()
  }
}
