package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tracked-cache registry shared by the operator suites (Dedup's shingle
  * and pair-stat frames, Text's winnow fingerprints). Spark's CacheManager
  * dedups cache() by plan equality, so one in-memory copy serves every
  * consumer; dedup the REGISTRY too (sameResult on analyzed plans — raw
  * plans of separately built identical frames differ by exprIds) so a long
  * session doesn't accumulate duplicate references. Frames are
  * deliberately NOT unpersisted per-operator; a long-lived session
  * (graft.Bench does) calls `clear()` when done with a suite.
  */
private[graft] final class CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def tracked(df: DataFrame): DataFrame = synchronized {
    if (!frames.exists(_.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)))
      frames += df
    df.cache()
  }

  def clear(): Unit = synchronized {
    // Reverse registration order (dependents before their inputs: kept
    // before wf) so uncaching a base frame never forces the CacheManager to
    // re-plan a still-registered dependent entry; blocking so the store is
    // actually empty before the next cache build races the async drop.
    frames.reverseIterator.foreach(_.unpersist(blocking = true))
    frames.clear()
  }
}

/** Column-pruned loaders for the driver testdata tables.
  *
  * Every loader returns the raw parquet scan; callers `.select` the columns
  * they need so Catalyst prunes the parquet `ReadSchema` — at 100 TB a scan
  * that reads all columns for a 2-column projection is the first bottleneck.
  */
object Tables {
  /** Parquet read with a MEMOIZED schema: plain `spark.read.parquet`
    * re-infers the schema from file footers on every call — measured
    * ~100-140 ms per read construction through the DataSource machinery
    * (ProbeSchemaInfer) — and every declared query re-builds its reads
    * each bench pass, 1-6 tables per query. The memo key carries the
    * file set's (total length, max mtime) like [[footerRowCount]]'s, so
    * a corpus regenerated in place re-infers instead of serving a stale
    * schema. The explicit-schema read (~20 ms) still lists and validates
    * files at planning; only the footer inference is skipped.
    */
  private def readTable(spark: SparkSession, path: String): DataFrame = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
      else Seq(f)
    val fs = walk(new java.io.File(path))
    val sig = (path, fs.map(_.length).sum,
      fs.map(_.lastModified).maxOption.getOrElse(0L))
    val schema = schemaCache.computeIfAbsent(sig,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/region.parquet")
  /** `events.ts` has shipped in two physical encodings: parquet
    * TIMESTAMP(NANOS) (which Spark 4 refuses to read as a timestamp — with
    * `nanosAsLong` it surfaces as a raw-nanos LongType) and plain
    * TIMESTAMP_MICROS (a regular TimestampType). Adapt on the footer
    * schema: nanos-long is integer-divided to micros — identical to
    * DuckDB's nanos→TIMESTAMP truncation, so oracle compares agree (double
    * division would lose precision: epoch-nanos ≈ 1.7e18 > 2^53) — and
    * micros is already the timestamp both engines see.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val tsType = eventsTsType(spark, dir) // also sets nanosAsLong on a miss
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = readTable(spark, s"$dir/events.parquet")
    tsType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ: same micros, reinterpreted in session tz
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** `dir`'s events.ts type as the parquet footer reports it: LongType for
    * the legacy TIMESTAMP(NANOS) encoding (under `nanosAsLong`),
    * TimestampNTZType for pyarrow's tz-less TIMESTAMP_MICROS, TimestampType
    * for tz-adjusted micros. Memoized per directory (a corpus never changes
    * encoding mid-session) — the probe is a footer read at planning time,
    * but every batch query and every stream drain starts with one, so a
    * long-lived bench session would otherwise pay file-listing per call.
    */
  def eventsTsType(spark: SparkSession, dir: String): org.apache.spark.sql.types.DataType =
    tsTypeCache.computeIfAbsent(dir, { d =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    })

  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.DataType]()

  /** Driver-side parquet footer row count: block row counts summed from the
    * file footers — metadata-only, NO Spark job. Shared by the scale-
    * adaptive sizers (streaming state partitions, the pack broadcast-cap
    * decision): at 100 TB the row count is the signal that turns "tuned for
    * local mode" constants into functions of the input. Recurses into
    * subdirectories so a partitioned layout (dir/part=x/file.parquet)
    * counts fully. Memoized on (path, total length, max mtime): same files
    * → same count, a regenerated corpus misses the memo and re-reads.
    */
  def footerRowCount(spark: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def walk(st: FileStatus): Seq[FileStatus] = {
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Seq.empty
      else if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else Seq(st)
    }
    val files = walk(fs.getFileStatus(p))
    val sig = (path, files.map(_.getLen).sum, files.map(_.getModificationTime).maxOption.getOrElse(0L))
    rowCountCache.computeIfAbsent(sig, { _ =>
      files.map { f =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try rdr.getRecordCount finally rdr.close()
      }.sum
    })
  }

  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Long]()

  /** Driver-side parquet footer (min, max) of an INT64 column — metadata
    * only, NO Spark job, memoized like [[footerRowCount]]. Feeds the
    * broadcast-grid gates in [[graft.cdc.Cdc]]: the ts span bounds the
    * time-bucket count, turning a "broadcast the grid" hint into a
    * decision a 100 TB corpus can veto. None when any row group lacks
    * stats for the column (never observed on real corpora; callers fall
    * back to the planner's choice).
    */
  def footerLongRange(spark: SparkSession, path: String,
      column: String): Option[(Long, Long)] = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def walk(st: FileStatus): Seq[FileStatus] = {
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Seq.empty
      else if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else Seq(st)
    }
    val files = walk(fs.getFileStatus(p))
    val sig = (path, column, files.map(_.getLen).sum,
      files.map(_.getModificationTime).maxOption.getOrElse(0L))
    longRangeCache.computeIfAbsent(sig, { _ =>
      val perChunk = files.flatMap { f =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try {
          import scala.jdk.CollectionConverters._
          rdr.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == column).map { c =>
              val st = c.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else (st.genericGetMin(), st.genericGetMax()) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  Some((mn.longValue(), mx.longValue()))
                case _ => None
              }
            }.getOrElse(None) :: Nil
          }.toSeq
        } finally rdr.close()
      }
      if (perChunk.isEmpty || perChunk.exists(_.isEmpty)) None
      else {
        val vs = perChunk.flatten
        Some((vs.map(_._1).min, vs.map(_._2).max))
      }
    })
  }

  private val longRangeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Long, Long), Option[(Long, Long)]]()
  def documents(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    readTable(spark, s"$dir/embeddings.parquet")

  /** Register every testdata table as a temp view (plus the vector SQL
    * functions), so the whole engine is reachable from `spark.sql` — the
    * switch-over surface for a user coming from the reference:
    *
    *   Tables.registerAll(spark, dir)
    *   spark.sql("SELECT vec_id FROM embeddings ORDER BY vec_cosine(...) DESC LIMIT 10")
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    Seq("lineitem" -> lineitem _, "orders" -> orders _, "customer" -> customer _,
      "supplier" -> supplier _, "part" -> part _, "nation" -> nation _,
      "region" -> region _, "events" -> events _, "documents" -> documents _,
      "embeddings" -> embeddings _)
      .foreach { case (name, load) => load(spark, dir).createOrReplaceTempView(name) }
  }

  /** Ensure at least default parallelism before a compute-heavy map or
    * nested-loop stage. A small single-file parquet scan is ONE split, so
    * an O(n²) stage downstream would run on one core; the tiny repartition
    * fixes that. At real data sizes the scan is already well-split and this
    * is a no-op (the condition is false) — it never adds a shuffle at scale.
    */
  /** Filesystem-safe key for a corpus path, used by the durable derived-
    * state roots (`SPARK_GRAFT_IVF_DIR`, `SPARK_GRAFT_DEDUP_DIR`):
    * sanitized name for readability plus an MD5 tag of the RAW path —
    * sanitization alone can alias distinct dirs (data/sf1 vs data_sf1),
    * and silently reusing another corpus's derived state returns wrong
    * results.
    */
  private[graft] def corpusKey(dir: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}-$md5"
  }

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    // Decide from the optimizer's size estimate (a catalog/file-length
    // lookup, already computed during planning) instead of touching df.rdd,
    // which would force physical planning + RDD DAG construction per call.
    // The scan yields ~size/maxPartitionBytes splits, so anything estimated
    // under par × maxPartitionBytes would under-parallelize the downstream
    // compute-heavy stage; at real data sizes the estimate is far larger
    // and this is a no-op — it never adds a shuffle at scale.
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Frames without real stats (local relations, some non-file plans)
    // report defaultSizeInBytes (Long.MaxValue) — that's "unknown", not
    // "huge": spread them. The former fallback read df.rdd.getNumPartitions,
    // which forces physical planning + RDD DAG construction on the DRIVER
    // per call — a latent cost spike for any statless caller. Statless
    // frames here are local/constructed relations (tiny by construction);
    // file scans (every production caller) carry real stats and never hit
    // this branch.
    if (est >= BigInt(spark.sessionState.conf.defaultSizeInBytes)) df.repartition(par)
    else if (est < BigInt(par) * BigInt(maxSplit)) df.repartition(par)
    else df
  }
}
