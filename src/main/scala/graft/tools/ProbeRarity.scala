package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only: stage timings for text_rarity_score's distinct-(doc,tok)
  * reshape — cache build, freq agg, head/tail split, final agg — so the
  * docs100x cost is attributed, not guessed.
  */
object ProbeRarity {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Text
    // Pass 1: cold (includes the perDoc cache build).
    Prof.time("rarity pass 1 (cold)")(
      Text.rarityScore(spark, dir).agg(sum(col("rarity_sum"))).collect())
    Prof.time("rarity pass 2 (warm cache)")(
      Text.rarityScore(spark, dir).agg(sum(col("rarity_sum"))).collect())
    Prof.time("rarity pass 3 (warm cache)")(
      Text.rarityScore(spark, dir).agg(sum(col("rarity_sum"))).collect())
    val docTok = Text.testDocTok(spark, dir)
    Prof.time("docTok explode+count (warm)")(docTok.count())
    Prof.time("freq agg")(
      docTok.groupBy(col("tok")).agg(sum(col("c"))).count())
    Prof.time("head takeOrdered")(
      docTok.groupBy(col("tok")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(1024).collect())
    Prof.time("doc-grain agg only")(
      docTok.groupBy(col("doc_id")).agg(sum(col("c"))).count())
    Text.clearCaches()
    spark.stop()
  }
}
