package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Dev evidence for the 100 TB posture: measure, per SF (a 10× corpus step
  * each), the candidate volume and wall time of the banded-LSH near-dup
  * path vs the quadratic gram self-join. The LSH candidate count and time
  * should track corpus size ~linearly while the gram join's pair volume
  * grows super-linearly — the measured basis for wiring cluster edges to
  * the LSH path (Dedup.clusterEdges).
  */
object ScalingReport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"sf"}%-8s ${"docs"}%8s ${"grams"}%10s ${"lsh_cand"}%9s " +
      f"${"gram_pairs"}%10s ${"lsh_s"}%7s ${"gram_s"}%7s")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val docs = graft.Tables.documents(spark, dir)
      val nDocs = docs.count()
      val g = Dedup.testShingles(docs)
      val nGrams = g.count()
      // LSH candidate pairs (pre-verify): the REAL banding via
      // Dedup.bandedCandidates, so this report can't drift from the
      // operator it measures.
      val (lshCand, _) = time(Dedup.bandedCandidates(g).count())
      // Gram self-join pair volume (what the old cluster edges paid).
      val (gramPairs, _) = time(g.as("a").join(g.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count())
      // End-to-end wall times, warm second run reported.
      Seq(1, 2).foreach(_ => Dedup.minhashLsh(spark, dir).count())
      val (_, lshS) = time(Dedup.minhashLsh(spark, dir).count())
      Seq(1, 2).foreach(_ => Dedup.ngramJaccard(spark, dir).count())
      val (_, gramS) = time(Dedup.ngramJaccard(spark, dir).count())
      println(f"$sf%-8s $nDocs%8d $nGrams%10d $lshCand%9d $gramPairs%10d " +
        f"$lshS%7.2f $gramS%7.2f")
      Dedup.clearCaches()
    }
    spark.stop()
  }
}
