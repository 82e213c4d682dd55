package graft.tools

/** Dev-only probe for the round-6 warm-time question: with every suite
  * cache hot, how much of a repeated dedup query's wall time is (a) plan
  * construction + analysis, (b) physical planning, (c) execution? Run
  * twice back-to-back per query so JIT/codegen effects show as the delta
  * between repeats.
  */
object ProbeWarmDrift {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Dedup
    // Warm every cache the bench steady state would have.
    Dedup.minhashLsh(spark, dir).count()
    Dedup.clusters(spark, dir).count()
    (1 to 3).foreach { pass =>
      Seq(
        "minhash_lsh" -> (() => Dedup.minhashLsh(spark, dir)),
        "clusters" -> (() => Dedup.clusters(spark, dir))
      ).foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        val df = mk()
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // forces analysis + optimization + planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"[probe] pass$pass $name%-12s construct=${(t1 - t0) / 1e9}%.3fs " +
          f"plan=${(t2 - t1) / 1e9}%.3fs exec=${(t3 - t2) / 1e9}%.3fs " +
          f"total=${(t3 - t0) / 1e9}%.3fs")
      }
    }
    spark.stop()
  }
}
