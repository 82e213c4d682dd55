package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: split vec_scalar_quantize's pre-execution cost into the fit
  * job (posexplode + groupBy + collect) vs alternatives.
  */
object ProbeSq8 {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    graft.operators.Similarity.scalarQuantize(spark, dir).count() // warm
    (1 to 3).foreach { i =>
      Prof.time(s"#$i fit posexplode+groupBy") {
        graft.Tables.embeddings(spark, dir)
          .select(posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("pos"))
          .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
          .orderBy(col("pos")).collect().length
      }
      Prof.time(s"#$i fit no-orderBy, driver sort") {
        graft.Tables.embeddings(spark, dir)
          .select(posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("pos"))
          .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
          .collect().sortBy(_.getInt(0)).length
      }
    }
    spark.stop()
  }
}
