package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: assignment agreement of the two-level coarse quantizer vs
  * exact argmax at the corpus in SPARK_GRAFT_SF_DIR (auto nlist). The
  * index contract calls cell-boundary drift a RECALL knob, not a
  * correctness surface — this probe puts a number on it per corpus
  * (SimilaritySpec pins ~0.89 at nlist=64 / dim 64; the 768-dim corpora
  * are measured via this probe and recorded in TESTDATA).
  */
object ProbeCoarseAgreement {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Similarity
    sys.env.get("SPARK_GRAFT_COARSE_PROBE").foreach { v =>
      Similarity.CoarseProbe = v.toInt
    }
    val nlist = Similarity.semNlist(graft.Tables.embeddings(spark, dir).count())
    val cells = Similarity.coarseCellsOf(nlist)
    println(s"[coarse] nlist=$nlist cells=$cells probe=${Similarity.coarseProbe(cells)}")
    val coarse = Prof.time("coarse build+read")(
      Similarity.testIvfIndexed(spark, dir, nlist)._1
        .select(col("vec_id"), col("cluster").as("c_coarse")).cache())
    println(s"[coarse] rows=${coarse.count()}")
    Similarity.resetIvfMemo()
    val dflt = Similarity.CoarseMinNlist
    try {
      Similarity.CoarseMinNlist = Int.MaxValue // force exact argmax
      val exact = Prof.time("exact build+read")(
        Similarity.testIvfIndexed(spark, dir, nlist)._1
          .select(col("vec_id"), col("cluster").as("c_exact")).cache())
      println(s"[coarse] rows=${exact.count()}")
      val r = coarse.join(exact, "vec_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("c_coarse") === col("c_exact"), 1L).otherwise(0L)).as("same"))
        .collect()(0)
      println(f"[coarse] agreement ${r.getLong(1)}/${r.getLong(0)} = " +
        f"${r.getLong(1).toDouble / r.getLong(0)}%.4f")
    } finally Similarity.CoarseMinNlist = dflt
    spark.stop()
  }
}
