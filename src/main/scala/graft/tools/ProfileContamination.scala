package graft.tools

/** Dev-only repeat profiler for text_contamination (not part of the
  * contract): is the warm per-run time stable across invocations, and does
  * releasing the suite caches between runs change that?
  */
object ProfileContamination {
  def main(args: Array[String]): Unit = {
    val dir = Prof.sfDir
    val spark = Prof.session()
    import graft.operators.Text
    (1 to 5).foreach(i => Prof.time(s"contamination run $i (kept warm)")(
      Text.contamination(spark, dir).count()))
    Text.clearCaches()
    (1 to 3).foreach(i => Prof.time(s"contamination run $i (cleared)")({
      Text.clearCaches(); Text.contamination(spark, dir).count()
    }))
    spark.stop()
  }
}
