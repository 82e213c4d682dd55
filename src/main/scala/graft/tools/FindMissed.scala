package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object FindMissed {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val exact = Dedup.ngramJaccard(spark, dir, 0.5)
    val lsh = Dedup.minhashLsh(spark, dir, 0.5)
    val missed = exact.join(lsh.select(col("doc_a"), col("doc_b")),
      Seq("doc_a", "doc_b"), "left_anti")
    missed.show(20, false)
    println("missed=" + missed.count())
    spark.stop()
  }
}
