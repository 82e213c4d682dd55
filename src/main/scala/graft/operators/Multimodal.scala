package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded per-partition. The decode step is a
  * DETERMINISTIC STUB (no image/audio libs in this environment) — it derives
  * fake dimensions from the byte length and hashes the payload — but the
  * Spark-side plumbing is real: binary column + metadata struct schema,
  * column-pruned input, typed `mapPartitions` batch shape (one decoder
  * instance per partition, the same contract a JNI/FFmpeg decoder needs),
  * and deterministic frame sampling via byte-range slicing.
  *
  * The corpus blobs are the UTF-8 bytes of `documents.text` (pure ASCII in
  * the testdata), which lets the DuckDB oracle recompute every derived value
  * from the text column — the stub is oracle-checked, not just smoke-tested.
  */
object Multimodal {
  import graft.Tables._

  /** documents → (doc_id, content binary, meta struct) — the multimodal
    * table shape: payload + typed sidecar metadata.
    */
  private[operators] def blobs(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(col("n_chars"), col("source"), col("lang")).as("meta"))

  /** Input slice for the decode stub (typed, column-pruned). */
  case class Blob(doc_id: Long, content: Array[Byte], source: String)

  /** Decoded record: payload digest + stub "dimensions". */
  case class Decoded(doc_id: Long, source: String, byte_len: Long,
      content_md5: String, width: Long, height: Long, n_frames: Long)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** Per-partition decode: one MessageDigest ("decoder handle") per
    * partition, streamed over the rows — the batch shape a real decoder
    * (libjpeg/FFmpeg via JNI) plugs into. Runs AFTER column pruning: only
    * (doc_id, content, source) reach the partition iterator.
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in: Dataset[Blob] = blobs(spark, dir)
      .select(col("doc_id"), col("content"), col("meta.source").as("source"))
      .as[Blob]
    in.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition decoder handle
      rows.map { b =>
        md.reset()
        val digest = hex(md.digest(b.content))
        val len = b.content.length.toLong
        // STUB: a real decoder parses the container header here.
        Decoded(b.doc_id, b.source, len, digest,
          64L + (len * 2654435761L) % 960L, 64L + (len * 40503L) % 704L,
          (len - 1L) / 256L + 1L)
      }
    }.toDF()
  }

  /** Batched feature record (see [[featureBatch]]). */
  case class Features(doc_id: Long, n_bytes: Long, byte_sum: Long,
      distinct_bytes: Long, mean_byte: Double, entropy: Double)

  /** Batched feature extraction — the `mapInPandas` shape in Scala: the
    * partition iterator is consumed in fixed-size BATCHES, scratch buffers
    * (here the 256-bin histogram) are allocated once per batch and reused
    * across its rows — exactly how an Arrow-batch UDF amortizes model /
    * buffer setup over rows. Features are deterministic byte statistics
    * (a real image/audio featurizer slots into the same loop), so the
    * oracle recomputes them from the text payload.
    */
  def featureBatch(spark: SparkSession, dir: String, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val in = blobs(spark, dir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val hist = new Array[Long](256) // per-batch scratch, reused per row
        batch.map { case (id, bytes) =>
          java.util.Arrays.fill(hist, 0L)
          var i = 0; var sum = 0L
          while (i < bytes.length) {
            val b = bytes(i) & 0xFF
            hist(b) += 1; sum += b; i += 1
          }
          val n = bytes.length.toLong
          var distinct = 0L; var ent = 0.0
          var v = 0
          while (v < 256) {
            if (hist(v) > 0) {
              distinct += 1
              val p = hist(v).toDouble / n
              ent -= p * (math.log(p) / math.log(2.0))
            }
            v += 1
          }
          // Half-UP rounding (like SQL round()), not rint's half-even:
          // integer byte sums divided by n land exactly on .xxx5 often.
          def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
          Features(id, n, sum, distinct, r4(sum.toDouble / n), r4(ent))
        }
      }
    }.toDF()
  }

  /** "Resize" stub: sample `target` evenly spaced bytes from the payload —
    * the fixed-output-size shape of an image resize (variable-size input →
    * fixed-size signature), without a pixel decoder. Pure Column code; the
    * sampled signature and its digest are fully determined by the bytes, so
    * the oracle recomputes them from the text column.
    */
  def resize(spark: SparkSession, dir: String, target: Int = 32): DataFrame = {
    val len = length(col("content"))
    blobs(spark, dir)
      .select(col("doc_id"), col("content"),
        transform(sequence(lit(0), lit(target - 1)),
          i => substring(col("content"), floor(i * len / target).cast("int") + 1, lit(1))
            .cast("string")).as("samples"))
      .select(col("doc_id"),
        lit(target).cast("long").as("target_size"),
        array_join(col("samples"), "").as("signature"))
      .withColumn("sig_md5", md5(col("signature").cast("binary")))
  }

  /** Deterministic frame sampling: every `stride` bytes, slice a
    * `frameLen`-byte "frame" and fingerprint it — the video-keyframe shape
    * (seek + bounded read) without a real container parser. Pure Column
    * code: stays in whole-stage codegen, no shuffle.
    */
  def frameSample(spark: SparkSession, dir: String,
      stride: Int = 256, frameLen: Int = 64): DataFrame = {
    val nFrames = floor((length(col("content")).cast("long") - 1L) / stride).cast("long") + 1L
    blobs(spark, dir)
      .select(col("doc_id"), col("content"),
        posexplode(sequence(lit(0L), nFrames - 1L)))
      .select(
        col("doc_id"), col("pos").cast("long").as("frame_idx"),
        (col("pos").cast("long") * stride).as("byte_offset"),
        md5(substring(col("content"), lit(1) + col("pos").cast("int") * stride, lit(frameLen)))
          .as("frame_md5"),
        length(substring(col("content"), lit(1) + col("pos").cast("int") * stride, lit(frameLen)))
          .cast("long").as("frame_bytes"))
  }
}
