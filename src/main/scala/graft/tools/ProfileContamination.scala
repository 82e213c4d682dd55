package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only repeat profiler for text_contamination (not part of the
  * contract): is the warm per-run time stable across invocations, and does
  * releasing the suite caches between runs change that?
  */
object ProfileContamination {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$r")
    }
    import graft.operators.Text
    (1 to 5).foreach(i => t(s"contamination run $i (kept warm)")(
      Text.contamination(spark, dir).count()))
    Text.clearCaches()
    (1 to 3).foreach(i => t(s"contamination run $i (cleared)")({
      Text.clearCaches(); Text.contamination(spark, dir).count()
    }))
    spark.stop()
  }
}
