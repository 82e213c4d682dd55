package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: stage timing of the narrow-map simhash pipeline. */
object ProbeSimhash2 {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val docs = graft.Tables.documents(spark, dir)
    Prof.time("docs count")(docs.count())
    val fps = Dedup.testSimhashFingerprints(spark, dir)
    Prof.time("fps count")(fps.count())
    Prof.time("fps agg checksum")(
      fps.agg(countDistinct(col("simhash"))).collect()(0).getLong(0))
    Prof.time("full simhash")(Dedup.simhash(spark, dir).count())
    spark.stop()
  }
}
