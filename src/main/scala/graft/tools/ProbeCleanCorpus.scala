package graft.tools

import org.apache.spark.sql.functions._

/** Attribution probe for pipeline_clean_corpus at scale: times the
  * canonical-set read, the one-scan gate projection, and the assembled
  * pipeline separately (warm, second run of each), so the dominant stage
  * is measured rather than guessed.
  */
object ProbeCleanCorpus {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.{Dedup, Pipeline, Text}
    import graft.Tables.documents
    (1 to 2).foreach { pass =>
      Prof.time(s"canon only (clusters filter) p$pass") {
        Dedup.clusters(spark, dir).filter(col("is_canonical")).count()
      }
      Prof.time(s"gates, Column HOF formulation p$pass") {
        documents(spark, dir).select(col("doc_id"),
          Text.guessCol(col("text")).as("lang_guess"),
          Text.scoreCol(col("text")).as("score"),
          size(Text.toks(col("text"))).cast("long").as("n_tokens"))
          .filter(col("score") >= 0.72 && col("lang_guess") =!= "und").count()
      }
      Prof.time(s"gates, TextGates kernel p$pass") {
        Text.gateFrame(spark, dir)
          .filter(col("score") >= 0.72 && col("lang_guess") =!= "und").count()
      }
      Prof.time(s"full clean_corpus p$pass") {
        Pipeline.cleanCorpus(spark, dir).count()
      }
    }
  }
}
