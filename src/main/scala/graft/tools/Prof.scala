package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared scaffolding for the dev profiling tools: one bench-shaped local
  * session (local[32], 32 shuffle partitions, UI off — the same conditions
  * graft.Bench measures under) plus a wall-clock stage timer, so probe
  * outputs stay comparable across tools.
  */
object Prof {
  def session(): SparkSession = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def sfDir: String = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs" +
      (r match { case () => ""; case v => s" ($v)" }))
    r
  }
}
