package graft.tools

/** Dev-only: replay the text/dedup bench sequence twice and report block-
  * manager storage usage plus per-query time, to see whether pass-2 warm
  * times degrade because cached suite frames get evicted.
  */
object ProbeStorage {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.{Dedup, Text, Pipeline}
    val qs: Seq[(String, () => Long)] = Seq(
      "clusters" -> (() => Dedup.clusters(spark, dir).count()),
      "minhash" -> (() => Dedup.minhashLsh(spark, dir).count()),
      "ngram" -> (() => Dedup.ngramJaccard(spark, dir).count()),
      "simhash" -> (() => Dedup.simhash(spark, dir).count()),
      "contamination" -> (() => Text.contamination(spark, dir).count()),
      "ngram_freq" -> (() => Text.ngramFreq(spark, dir).count()),
      "rarity" -> (() => Text.rarityScore(spark, dir).count()),
      "clean_corpus" -> (() => Pipeline.cleanCorpus(spark, dir).count()))
    def storageGb: (Double, Double) = {
      val s = org.apache.spark.SparkEnv.get.blockManager.master.getMemoryStatus.values
      val usedOnHeap = s.map { case (max, rem) => max - rem }.sum / 1e9
      val max = s.map(_._1).sum / 1e9
      (usedOnHeap, max)
    }
    (1 to 2).foreach { pass =>
      qs.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        val sec = (System.nanoTime() - t0) / 1e9
        val (u, m) = storageGb
        println(f"[probe] pass$pass $name%-14s ${sec}%7.2fs storage=${u}%.1f/${m}%.1fGB")
      }
    }
    spark.stop()
  }
}
