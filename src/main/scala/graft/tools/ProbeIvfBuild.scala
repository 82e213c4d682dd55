package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.Vec

/** Dev-only: time the IVF index build stages (assignment vs partitioned
  * write) at k-means-scale nlist, the dedup_semantic auto-nlist path.
  */
object ProbeIvfBuild {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val n = graft.Tables.embeddings(spark, dir).count()
    val nlist = Similarity.semNlist(n)
    println(s"[probe] n=$n nlist=$nlist")
    val nf = Similarity.testNormed(spark, dir)
    val cents = nf.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    println(s"[probe] cents=${cents.length}")
    val assigned = nf.withColumn("cluster",
      Vec.nearestCentroid(col("embedding"), col("nrm"), cents))
    Prof.time("assignment only (count by cluster)")(
      assigned.groupBy(col("cluster")).count().count())
    val p = java.nio.file.Files.createTempDirectory("probe-ivf-").toFile
    Prof.time("partitioned write (direct)")(
      assigned.write.partitionBy("cluster").mode("overwrite").parquet(p.getPath + "/a"))
    Prof.time("partitioned write (repartition first)")(
      assigned.repartition(col("cluster")).write.partitionBy("cluster")
        .mode("overwrite").parquet(p.getPath + "/b"))
    spark.stop()
  }
}
