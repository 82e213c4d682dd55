package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: quantify small-stage task overhead — parallelismFirst=false
  * lets AQE coalesce tiny shuffles to the advisory size instead of keeping
  * one partition per core; measure warm dedup + a fact-table query to
  * check nothing big regresses.
  */
object ProbeAqeOverhead {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.operators.{Dedup, Relational}
    (1 to 2).foreach(_ => { Dedup.minhashLsh(spark, dir).count(); Relational.q1Agg(spark, dir).count(); Relational.q5StarJoin(spark, dir).count() })
    (1 to 3).foreach(i => t(s"minhashLsh warm pf=false #$i")(Dedup.minhashLsh(spark, dir).count()))
    (1 to 2).foreach(i => t(s"q1_agg warm pf=false #$i")(Relational.q1Agg(spark, dir).count()))
    (1 to 2).foreach(i => t(s"q5_star warm pf=false #$i")(Relational.q5StarJoin(spark, dir).count()))
    (1 to 2).foreach(i => t(s"clusters warm pf=false #$i")(Dedup.clusters(spark, dir).count()))
    spark.stop()
  }
}
