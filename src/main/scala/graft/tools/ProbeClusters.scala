package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: per-iteration timing of the clusters label-propagation loop
  * (warm caches), to see where the warm wall time goes — join+min jobs,
  * localCheckpoint materialization, or the convergence count.
  */
object ProbeClusters {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Dedup
    Dedup.clusters(spark, dir).count() // warm caches + JIT
    (1 to 2).foreach { i =>
      Prof.time(s"clusters warm #$i")(Dedup.clusters(spark, dir).count())
    }
    // Replicated loop with per-iteration timing (same code shape).
    (1 to 3).foreach { i =>
      Prof.time(s"clusterEdges construct #$i")(Dedup.clusterEdges(spark, dir, 0.5))
      Prof.time(s"clusterEdges count #$i")(Dedup.clusterEdges(spark, dir, 0.5).count())
    }
    val pairs = Dedup.clusterEdges(spark, dir, 0.5)
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = Prof.time("init labels")(
      sym.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id"))
        .localCheckpoint())
    var done = false
    var iter = 0
    while (!done && iter < 20) {
      val nbr = sym
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("dst_label")), "dst")
        .groupBy(col("src")).agg(min(col("dst_label")).as("nbr_min"))
      val next = labels.join(nbr, labels("doc_id") === nbr("src"), "left")
        .select(labels("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          (col("cluster_id") > col("nbr_min")).as("lowered"))
        .localCheckpoint(eager = false)
      done = Prof.time(s"iter $iter (join+min+count)")(
        next.filter(col("lowered")).count() == 0L)
      labels = next.drop("lowered")
      iter += 1
    }
    println(s"[probe] iterations: $iter")
    spark.stop()
  }
}
