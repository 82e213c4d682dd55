package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev check: is the banded-LSH candidate set a superset of the exact
  * τ=0.5 gram-join pairs at every SF (i.e. can clusters() take its edges
  * from LSH without changing the oracle answer)?
  */
object CheckLshRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1").map(sf => s"/root/testdata/$sf")
    dirs.foreach { dir =>
      val exact = Dedup.ngramJaccard(spark, dir, 0.5).select("doc_a", "doc_b")
      val lsh = Dedup.minhashLsh(spark, dir, 0.5).select("doc_a", "doc_b")
      val missed = exact.except(lsh).count()
      val extra = lsh.except(exact).count()
      println(s"RECALL $dir exact=${exact.count()} missed=$missed extra=$extra")
      // Release this SF's tracked shingle/pair caches before the next one —
      // the three SFs would otherwise accumulate in one session's storage.
      Dedup.clearCaches()
    }
    spark.stop()
  }
}
