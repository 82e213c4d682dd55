package graft.tools

import org.apache.spark.sql.SparkSession

/** Times pairwiseDups at several grid sizes on one session — the nBlocks
  * sensitivity probe behind the r17 scale-adaptive grid decision.
  */
object ProbePairBlocks {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { pass =>
      Seq(1, 2, 4, 8).foreach { nb =>
        val t0 = System.nanoTime()
        val n = graft.operators.Similarity.pairwiseDups(spark, dir, nBlocks = nb).count()
        println(f"pass $pass nBlocks=$nb%2d rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
