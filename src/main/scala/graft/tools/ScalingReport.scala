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
  *
  * NOTE: the 10x row's naive gram-pair count needs a bigger driver heap
  * than the 8g default — run with SPARK_DRIVER_MEM=48g (the naive join is
  * the measured ANTI-pattern; the operators themselves stay within 8g).
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
      f"${"pp01"}%9s ${"pp05"}%7s ${"gram_pairs"}%10s ${"lsh_s"}%7s ${"gram_s"}%7s")
    val dirs = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1") ++
      (if (new java.io.File("/root/repo/testdata-sf1/documents.parquet").exists())
        Seq("10x" -> "/root/repo/testdata-sf1") else Nil)
    dirs.foreach { case (sf, dir) =>
      val docs = graft.Tables.documents(spark, dir)
      val nDocs = docs.count()
      val g = Dedup.testShingles(docs)
      val nGrams = g.count()
      // LSH candidate pairs (pre-verify): the REAL banding via
      // Dedup.bandedCandidates, so this report can't drift from the
      // operator it measures.
      val (lshCand, _) = time(Dedup.bandedCandidates(g).count())
      // PPJoin prefix+position candidates at MinTau (what the exact pair
      // path verifies now) and at the 0.5 knee — pruning grows with τ:
      // at 0.1 the candidate floor is the bound s ≤ c + suffix allowance
      // (see prefixCandidates scaladoc), at 0.5 it approaches the output.
      val (ppCand, _) = time(Dedup.prefixCandidates(g, Dedup.MinTau).count())
      val (ppCand05, _) = time(Dedup.prefixCandidates(g, 0.5).count())
      val (gramPairs, _) = time(g.as("a").join(g.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count())
      // End-to-end wall times, warm second run reported.
      Seq(1, 2).foreach(_ => Dedup.minhashLsh(spark, dir).count())
      val (_, lshS) = time(Dedup.minhashLsh(spark, dir).count())
      // Sub-knee opt-in path timed explicitly (the operator default is
      // the τ=0.5 prefix path since round 11).
      Seq(1, 2).foreach(_ => Dedup.ngramJaccard(spark, dir, Dedup.MinTau).count())
      val (_, gramS) = time(Dedup.ngramJaccard(spark, dir, Dedup.MinTau).count())
      println(f"$sf%-8s $nDocs%8d $nGrams%10d $lshCand%9d $ppCand%9d " +
        f"$ppCand05%7d $gramPairs%10d $lshS%7.2f $gramS%7.2f")
      Dedup.clearCaches()
    }
    spark.stop()
  }
}
