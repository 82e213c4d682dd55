package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for the LSH pipeline (not part of the contract). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, dir)
    // warm
    docs.count()
    val g = t("shingles")(Dedup.testShingles(docs).cache())
    t("shingles count")(println("  grams=" + g.count()))
    val sigs = t("signatures")(Dedup.testSignatures(g))
    t("signatures count")(println("  sigs=" + sigs.count()))
    val cand = Dedup.testBandedCandidates(g).cache()
    t("bandedCandidates count")(println("  cand=" + cand.count()))
    t("verify join count")(println("  verified=" +
      Dedup.testVerifiedJaccard(g, cand).count()))
    cand.unpersist()
    t("full minhashLsh")(println("  pairs=" + Dedup.minhashLsh(spark, dir).count()))
    t("full minhashLsh again")(println("  pairs=" + Dedup.minhashLsh(spark, dir).count()))
    t("pairwise_dups")(println("  dups=" + graft.operators.Similarity.pairwiseDups(spark, dir).count()))
    t("pairwise_dups again")(println("  dups=" + graft.operators.Similarity.pairwiseDups(spark, dir).count()))
    spark.stop()
  }
}
