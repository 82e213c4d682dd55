package graft.tools
import graft.operators.Dedup

/** Dev-only: stage timing of the PPJoin prefix path (the dedup_ngram_jaccard
  * default) — candidate generation vs verify, cold vs warm.
  */
object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val docs = graft.Tables.documents(spark, dir)
    val g = Dedup.testShingles(docs)
    Prof.time("shingles count")(g.count())
    val cand = Dedup.prefixCandidates(g, Dedup.PrefixKnee).cache()
    Prof.time("prefix candidates cold")(cand.count())
    Prof.time("verify (cand cached)")(Dedup.testVerifiedJaccard(g, cand).count())
    cand.unpersist()
    Prof.time("full ngram tau=0.5 #1")(Dedup.ngramJaccard(spark, dir).count())
    Prof.time("full ngram tau=0.5 #2")(Dedup.ngramJaccard(spark, dir).count())
    spark.stop()
  }
}
