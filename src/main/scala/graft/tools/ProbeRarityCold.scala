package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: the FORCED-EVALUATION cost of the fused rarity route (bench's
  * count() legitimately prunes the narrow-map kernel, so this is where the
  * operator's real per-pass cost is recorded): construction (vocab
  * read + collect) and two evaluated passes, no docTok cache anywhere.
  */
object ProbeRarityCold {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Text
    val q = Prof.time("rarityScore construction (vocab collect)")(
      Text.rarityScore(spark, dir))
    Prof.time("forced eval pass 1")(q.agg(sum(col("rarity_sum"))).collect())
    Prof.time("forced eval pass 2")(q.agg(sum(col("rarity_sum"))).collect())
    Text.clearCaches()
    spark.stop()
  }
}
