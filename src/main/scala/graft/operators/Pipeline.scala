package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a training-data pipeline
  * actually ships: near-dup clustering keeps one canonical doc per cluster,
  * then quality and language gates drop the junk. Each stage is one of the
  * already-verified operators ([[Dedup.clusters]], [[Text.quality]],
  * [[Text.langid]]); composing them keeps every stage's scale posture
  * (LSH-edge clustering, narrow codegen'd scoring maps) and Catalyst fuses
  * the gate predicates into the joined scan.
  *
  * Pipeline extension beyond the reference's surface (SURVEY §2 36):
  * the reference replicates corpora; this is the curation pass a consumer
  * runs on the replicated lake before training.
  */
object Pipeline {

  /** Canonical, quality- and language-gated corpus view: one row per
    * surviving doc with its gate evidence (lang guess, score, tokens).
    *
    * Scale: clusters' labels are pair-graph sized; the quality/langid maps
    * are narrow projections over the corpus scan; the three frames join on
    * doc_id — co-partitioned after one hash shuffle each, with the gates
    * pushed below the joins by Catalyst.
    */
  def cleanCorpus(spark: SparkSession, dir: String, tau: Double = 0.5,
      minScore: Double = 0.72): DataFrame = {
    val canon = Dedup.clusters(spark, dir, tau)
      .filter(col("is_canonical")).select(col("doc_id"))
    val quality = Text.quality(spark, dir)
      .select(col("doc_id"), col("score"), col("n_tokens"))
    val lang = Text.langid(spark, dir)
      .select(col("doc_id"), col("guess"))
    canon.join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .filter(col("score") >= minScore && col("guess") =!= "und")
      .select(col("doc_id"), col("guess").as("lang_guess"),
        col("score"), col("n_tokens"))
  }
}
