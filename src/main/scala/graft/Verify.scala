package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Oracle-consistency guard: every CDC oracle SQL statement hard-codes
    * the 4-channel rule (`user_id % 4`), so an oracle dump under a
    * `SPARK_GRAFT_CHANNELS` override (a SCALE-measurement-only knob)
    * would silently hash-mismatch. Refuse to start instead.
    */
  private[graft] def requireOracleChannels(n: Int): Unit =
    require(n == 4,
      s"Verify needs the 4-channel rule the oracle SQL states, got $n " +
        "channels — unset SPARK_GRAFT_CHANNELS for correctness runs " +
        "(it exists only for wide-channel scale measurements)")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    requireOracleChannels(graft.cdc.Cdc.NumChannels)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev knob (driver never sets it): SPARK_GRAFT_QUERIES=a,b,c re-dumps
    // a subset into an existing outDir, e.g. after a targeted fix.
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    // Dev knob (driver never sets it): SPARK_GRAFT_SEM_GRID_MIN=n forces
    // dedup_semantic's cluster-size routing base, so the CELL-kernel route
    // can be dumped on a gated corpus and DuckDB-compared INDEPENDENTLY of
    // the member-gather kernel it is spec-pinned against (the two share
    // round4/unpack code; the oracle shares nothing).
    sys.env.get("SPARK_GRAFT_SEM_GRID_MIN").foreach { v =>
      graft.operators.Similarity.SemGridMinCluster = v.toLong
    }
    // Dev knob (driver never sets it): SPARK_GRAFT_COARSE_MIN=n overrides
    // the two-level coarse-assignment threshold. The coarse quantizer is a
    // RECALL knob by contract (cell-boundary vectors may land off the
    // exact argmax) and the oracle states exact argmax — so a corpus whose
    // auto-nlist exceeds CoarseMinNlist (first seen: 140k × 768-dim,
    // nlist 112) can only be VALUE-checked with the coarse path disabled
    // (set it above nlist); the coarse path's agreement is measured
    // separately (SimilaritySpec + the TESTDATA corpus notes).
    sys.env.get("SPARK_GRAFT_COARSE_MIN").foreach { v =>
      graft.operators.Similarity.CoarseMinNlist = v.toInt
    }
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Release the suite caches and drained stream sinks — Verify is a
    // long-lived session that has now run every operator, and each result
    // is already written out (parquet drain dirs are safe to delete).
    graft.operators.Dedup.clearCaches()
    graft.operators.Text.clearCaches()
    graft.operators.Similarity.clearCaches()
    graft.operators.Pipeline.clearCaches()
    graft.streaming.CdcStream.dropSinks(spark)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
