package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes one `<outDir>/<query><suffix>.txt` formatted pre-execution plan
  * per requested query — the before/after evidence files under plans/rNN.
  * Usage: DumpPlanFiles <outDir> <suffix> <query,query,...> [sfDir].
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val queries = args(2).split(",").toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    queries.foreach { name =>
      val text =
        try graft.SparkEntry.queries(name)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"error: ${e.getMessage}" }
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), text)
      println(s"wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
