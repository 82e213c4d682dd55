package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: isolate [[graft.operators.Dedup]]'s label-propagation loop
  * cost vs the shuffle-partition count (the loop is a driver-sequenced
  * chain of join+agg+localCheckpoint jobs whose per-iteration fixed cost
  * scales with partitions at toy edge counts). Runs the loop body shape
  * over the REAL sf pair frame at several partition counts.
  */
object ProbeLabelLoop {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    // Warm: build/load the durable pair frame outside the timed loops.
    val pairs = graft.operators.Dedup.minhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    println(s"[prof] edges=${pairs.count()}")
    for (parts <- Seq(32, 8, 4, 1); rep <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      Prof.time(s"loop parts=$parts rep=$rep") {
        val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .cache()
        var labels = sym.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
          .select(col("src").as("doc_id"), col("cluster_id"))
          .localCheckpoint()
        var iter = 0
        var done = false
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
          done = next.filter(col("lowered")).count() == 0L
          labels = next.drop("lowered")
          iter += 1
        }
        sym.unpersist()
        iter
      }
    }
    spark.stop()
  }
}
