package graft.tools

/** Dev-only: per-invocation cost of parquet schema inference at read
  * construction (every declared query re-builds its reads each bench
  * pass) vs an explicit-schema read that skips footer inference.
  */
object ProbeSchemaInfer {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema // warm
    (1 to 3).foreach { i =>
      Prof.time(s"#$i infer x6") {
        (1 to 6).foreach(_ => spark.read.parquet(s"$dir/lineitem.parquet").schema)
      }
      Prof.time(s"#$i explicit x6") {
        (1 to 6).foreach(_ =>
          spark.read.schema(schema).parquet(s"$dir/lineitem.parquet").schema)
      }
    }
    spark.stop()
  }
}
