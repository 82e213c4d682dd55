package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: why is pipeline_clean_corpus slow, and why are LATER
  * queries slow after it ran? Times each stage, a trivial baseline query,
  * and dumps any session conf that changed.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    def baseline(): Unit = {
      t("baseline range.sum")(spark.range(100000000L).selectExpr("sum(id)").collect()(0).getLong(0))
      t("baseline text_quality")(graft.operators.Text.quality(spark, dir).count())
    }
    baseline()
    t("dedup_clusters")(graft.operators.Dedup.clusters(spark, dir).count())
    baseline()
    t("pipeline run 1")(graft.operators.Pipeline.cleanCorpus(spark, dir).count())
    baseline()
    t("pipeline run 2")(graft.operators.Pipeline.cleanCorpus(spark, dir).count())
    baseline()
    println("[prof] rdds=" + spark.sparkContext.getPersistentRDDs.size +
      " defaultParallelism=" + spark.sparkContext.defaultParallelism +
      " shufflePartitions=" + spark.conf.get("spark.sql.shuffle.partitions"))
    graft.operators.Dedup.clearCaches()
    baseline()
    spark.stop()
  }
}
