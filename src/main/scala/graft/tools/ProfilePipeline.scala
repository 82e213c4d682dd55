package graft.tools

/** Dev-only probe: why is pipeline_clean_corpus slow, and why are LATER
  * queries slow after it ran? Times each stage, a trivial baseline query,
  * and the session's persistent-RDD footprint.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val dir = Prof.sfDir
    val spark = Prof.session()
    def baseline(): Unit = {
      Prof.time("baseline range.sum")(
        spark.range(100000000L).selectExpr("sum(id)").collect()(0).getLong(0))
      Prof.time("baseline text_quality")(graft.operators.Text.quality(spark, dir).count())
    }
    baseline()
    Prof.time("dedup_clusters")(graft.operators.Dedup.clusters(spark, dir).count())
    baseline()
    Prof.time("pipeline run 1")(graft.operators.Pipeline.cleanCorpus(spark, dir).count())
    baseline()
    Prof.time("pipeline run 2")(graft.operators.Pipeline.cleanCorpus(spark, dir).count())
    baseline()
    println("[prof] rdds=" + spark.sparkContext.getPersistentRDDs.size +
      " defaultParallelism=" + spark.sparkContext.defaultParallelism +
      " shufflePartitions=" + spark.conf.get("spark.sql.shuffle.partitions"))
    graft.operators.Dedup.clearCaches()
    baseline()
    spark.stop()
  }
}
