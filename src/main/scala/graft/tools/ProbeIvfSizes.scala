package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: realized IVF cluster-size distribution at the corpus in
  * SPARK_GRAFT_SF_DIR (auto nlist), under the CURRENT assignment defaults
  * and optionally a forced probe (SPARK_GRAFT_COARSE_PROBE). The
  * within-cluster pair work Σ|c|²/2 is what dedup_semantic owes, so the
  * size TAIL explains its wall time across assignment-quality changes.
  */
object ProbeIvfSizes {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Similarity
    sys.env.get("SPARK_GRAFT_COARSE_PROBE").foreach { v =>
      Similarity.CoarseProbe = v.toInt
    }
    val nlist = Similarity.semNlist(graft.Tables.embeddings(spark, dir).count())
    val sizes = Prof.time(s"index build+sizes (nlist=$nlist, probe=${Similarity.CoarseProbe})")(
      Similarity.testIvfIndexed(spark, dir, nlist)._1
        .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .select(col("n")).collect().map(_.getLong(0)).sorted)
    val m = sizes.length
    def pct(p: Double) = sizes(math.min(m - 1, (p * m).toInt))
    val pairWork = sizes.map(s => s * s / 2).sum
    println(s"[sizes] clusters=$m median=${pct(0.5)} p90=${pct(0.9)} " +
      s"p99=${pct(0.99)} max=${sizes.last} top8=${sizes.takeRight(8).mkString(",")}")
    println(f"[sizes] pair work sum(|c|^2/2) = ${pairWork / 1e9}%.2fB pairs")
    spark.stop()
  }
}
