package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: pairwiseDups wall time vs block-grid size at sf0.1. */
object TuneBlocks {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Seq(4, 8, 16, 32).foreach { nb =>
      graft.operators.Similarity.pairwiseDups(spark, dir, 0.45, nb).count()
      val t0 = System.nanoTime
      val n = graft.operators.Similarity.pairwiseDups(spark, dir, 0.45, nb).count()
      println(f"nBlocks=$nb%2d pairs=$n time=${(System.nanoTime - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
