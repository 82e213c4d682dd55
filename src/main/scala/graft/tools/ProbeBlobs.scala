package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: the dedup_semantic hot-cluster stress on the blobs corpus
  * (make_sf1.py mode `blobs`): report the realized cluster-size tail,
  * time the production routing (hot clusters > SemGridMinCluster on the
  * block grid), and check route equivalence on the REAL oversized
  * clusters by forcing them through the member-gather kernel.
  */
object ProbeBlobs {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Similarity

    // Realized cluster sizes (the operator's own assignment): how hot is
    // the tail the blobs were built to create?
    val nlist = Similarity.semNlist(
      graft.Tables.embeddings(spark, dir).count())
    println(s"[blobs] nlist = $nlist")
    val sizes = Prof.time("cluster sizes (index build + agg)")(
      Similarity.testIvfIndexed(spark, dir, nlist)._1
        .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(8).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    println(s"[blobs] top clusters: $sizes")

    // Order-independent EXACT row digest: summing raw double max_cos
    // would differ across partition orders in the last ulps; max_cos is a
    // 4-decimal value so ×10⁴ is integral and the per-row xxhash64 sum is
    // an exact set comparison.
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("n_earlier")),
        bit_xor(xxhash64(col("vec_id"), col("cluster"), col("n_earlier"),
          round(col("max_cos") * 10000).cast("long")))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // Production routing: blobs (> 20k) on the grid, the rest kernel.
    val prod1 = Prof.time("semantic prod routing pass 1")(
      checksum(Similarity.semanticDedup(spark, dir)))
    val prod2 = Prof.time("semantic prod routing pass 2")(
      checksum(Similarity.semanticDedup(spark, dir)))
    println(s"[blobs] prod checksum: $prod1 / $prod2")

    // Forced-kernel routing: the SAME oversized clusters through the
    // member-gather kernel (threshold above the hottest cluster).
    val dflt = Similarity.SemGridMinCluster
    try {
      Similarity.SemGridMinCluster = Long.MaxValue
      val kern = Prof.time("semantic all-kernel routing")(
        checksum(Similarity.semanticDedup(spark, dir)))
      println(s"[blobs] kernel checksum: $kern")
      println(s"[blobs] routes agree: ${kern == prod2}")
    } finally Similarity.SemGridMinCluster = dflt
    spark.stop()
  }
}
