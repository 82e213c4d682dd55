package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: what SimHash Hamming distance do the exact-Jaccard near-dup
  * pairs land at, per SF? Picks the (tau, maxHamming) operating point where
  * chunk-banded SimHash candidates have recall 1 against the exact pairs.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val fps = Dedup.testSimhashFingerprints(spark, dir)
      val pairs = Dedup.ngramJaccard(spark, dir, 0.3)
      val joined = pairs
        .join(fps.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
        .join(fps.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      println(s"== $sf ==")
      joined.groupBy((floor(col("jaccard") * 10) / 10).as("j_bucket"))
        .agg(count(lit(1)).as("n"), max(col("hamming")).as("max_ham"),
          expr("percentile(hamming, 0.9)").as("p90_ham"))
        .orderBy(col("j_bucket"))
        .show(50, false)
      Dedup.clearCaches()
    }
    spark.stop()
  }
}
