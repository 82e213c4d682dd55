package graft.tools

/** Dev-only: quantify small-stage task overhead on the warm dedup path.
  * Conclusion recorded in the verify skill: with shuffle.partitions=32 the
  * warm time is dominated by per-task overhead on tiny stages; AQE's
  * default parallelism-first coalescing measured BETTER than advisory-size
  * coalescing (parallelismFirst=false) because the signature aggregation is
  * CPU-dense despite being small in bytes — keep the defaults.
  */
object ProbeAqeOverhead {
  def main(args: Array[String]): Unit = {
    val dir = Prof.sfDir
    val spark = Prof.session()
    import graft.operators.{Dedup, Relational}
    (1 to 2).foreach { _ =>
      Dedup.minhashLsh(spark, dir).count()
      Relational.q1Agg(spark, dir).count()
      Relational.q5StarJoin(spark, dir).count()
    }
    (1 to 3).foreach(i => Prof.time(s"minhashLsh warm aqe=on  #$i")(
      Dedup.minhashLsh(spark, dir).count()))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 3).foreach(i => Prof.time(s"minhashLsh warm aqe=off #$i")(
      Dedup.minhashLsh(spark, dir).count()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    (1 to 3).foreach(i => Prof.time(s"minhashLsh warm pf=false #$i")(
      Dedup.minhashLsh(spark, dir).count()))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    (1 to 3).foreach(i => Prof.time(s"minhashLsh warm parts=8 #$i")(
      Dedup.minhashLsh(spark, dir).count()))
    (1 to 2).foreach(i => Prof.time(s"q1_agg warm #$i")(Relational.q1Agg(spark, dir).count()))
    (1 to 2).foreach(i => Prof.time(s"q5_star warm #$i")(Relational.q5StarJoin(spark, dir).count()))
    spark.stop()
  }
}
