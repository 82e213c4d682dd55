package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose the banded-candidate stage (agg → bucket routing →
  * pair expansion → distinct) to find where the cold cost sits at a given
  * corpus. Rebuilds the same shapes as Dedup.bandedCandidates from the
  * test seams so each sub-plan can be timed in isolation.
  */
object ProbeBanding {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    val g = Dedup.testShingles(docs)
    Prof.time("shingles materialize")(g.count())
    val sigs = Dedup.testSignatures(g).cache()
    Prof.time("signatures materialize")(sigs.count())
    // Reconstruct the banding frame the way bandedCandidates consumes it.
    val bands = Prof.time("bands construct")(Dedup.testBands(g))
    val bucketed = bands
      .groupBy(col("band"), col("bk")).agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1)
    Prof.time("bucket agg count")(println("  buckets=" + bucketed.count()))
    Prof.time("bucket size histo")(
      bucketed.groupBy(size(col("ds")).as("s")).count()
        .orderBy(col("s")).collect().take(20)
        .foreach(r => println(s"  size=${r.get(0)} buckets=${r.get(1)}")))
    val sorted = bucketed.select(col("band"), col("bk"), sort_array(col("ds")).as("ds"))
    val inRow = sorted
      .select(explode(flatten(transform(sequence(lit(1), size(col("ds")) - 1), i =>
        transform(slice(col("ds"), i + 1, size(col("ds")) - i), b =>
          struct(element_at(col("ds"), i).as("doc_a"), b.as("doc_b")))))).as("p"))
    Prof.time("in-row expand (no distinct)")(println("  rows=" + inRow.count()))
    Prof.time("in-row expand + distinct")(println("  pairs=" +
      inRow.select(col("p.doc_a"), col("p.doc_b")).distinct().count()))
    Prof.time("full bandedCandidates")(println("  cand=" +
      Dedup.testBandedCandidates(g).count()))
    Prof.time("full bandedCandidates again")(println("  cand=" +
      Dedup.testBandedCandidates(g).count()))
    spark.stop()
  }
}
