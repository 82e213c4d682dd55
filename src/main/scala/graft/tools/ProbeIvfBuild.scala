package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.Vec

/** Dev-only: time the IVF index build stages (exact vs two-level coarse
  * assignment, then the partitioned write) at k-means-scale nlist — the
  * dedup_semantic auto-nlist path. Also reports exact/coarse agreement so
  * the assignment cut's quality cost is measured, not assumed.
  * Args: [skipExact] — pass "skipExact" at corpora where the O(n·k·d)
  * exact assignment is the thing being avoided (20M × 16k would be
  * minutes).
  */
object ProbeIvfBuild {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val skipExact = args.contains("skipExact")
    val n = graft.Tables.embeddings(spark, dir).count()
    val nlist = Similarity.semNlist(n)
    println(s"[probe] n=$n nlist=$nlist")
    val nf = Similarity.testNormed(spark, dir)
    val cents = nf.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    println(s"[probe] cents=${cents.length}")
    val nCells = Similarity.coarseCellsOf(cents.length)
    val probe = Similarity.coarseProbe(nCells)
    println(s"[probe] nCells=$nCells probe=$probe " +
      s"(scores ~${nCells + probe * (cents.length / nCells)} of ${cents.length} centroids/vec)")
    val t0 = System.nanoTime()
    val coarseCol = Vec.nearestCentroidCoarse(col("embedding"), col("nrm"), cents, nCells, probe)
    println(f"[probe] driver coarse-cell Lloyd: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val coarse = nf.withColumn("cluster", coarseCol)
    Prof.time("coarse assignment (count by cluster)")(
      coarse.groupBy(col("cluster")).count().count())
    if (!skipExact) {
      val exact = nf.withColumn("cluster",
        Vec.nearestCentroid(col("embedding"), col("nrm"), cents))
      Prof.time("exact assignment (count by cluster)")(
        exact.groupBy(col("cluster")).count().count())
      val agree = Prof.time("agreement join")(
        nf.select(col("vec_id"),
          (Vec.nearestCentroid(col("embedding"), col("nrm"), cents) ===
            Vec.nearestCentroidCoarse(col("embedding"), col("nrm"), cents, nCells, probe))
            .cast("long").as("same"))
          .agg(sum(col("same")), count(lit(1))).collect()(0))
      println(s"[probe] agreement: ${agree.getLong(0)}/${agree.getLong(1)} = " +
        f"${agree.getLong(0).toDouble / agree.getLong(1)}%.4f")
    }
    val p = java.nio.file.Files.createTempDirectory("probe-ivf-").toFile
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    Prof.time("partitioned write (repartition first, committer v2)")(
      coarse.repartition(col("cluster")).write.partitionBy("cluster")
        .mode("overwrite").parquet(p.getPath + "/b"))
    spark.stop()
  }
}
