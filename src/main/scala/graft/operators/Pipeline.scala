package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a training-data pipeline
  * actually ships: near-dup clustering keeps one canonical doc per cluster,
  * then quality and language gates drop the junk. Each stage is one of the
  * already-verified operators ([[Dedup.clusters]], [[Text.quality]],
  * [[Text.langid]]); composing them keeps every stage's scale posture
  * (LSH-edge clustering, narrow codegen'd scoring maps) and Catalyst fuses
  * the gate predicates into the joined scan.
  *
  * Pipeline extension beyond the reference's surface (SURVEY §2 36):
  * the reference replicates corpora; this is the curation pass a consumer
  * runs on the replicated lake before training.
  */
object Pipeline {
  import graft.Tables.documents

  /** Canonical, quality- and language-gated corpus view: one row per
    * surviving doc with its gate evidence (lang guess, score, tokens).
    *
    * Scale: clusters' labels are pair-graph sized; both gates (score and
    * language) are computed in ONE narrow projection over ONE corpus scan
    * — the earlier three-frame formulation scanned and tokenized the
    * corpus once per gate and paid a second doc_id shuffle join to
    * reunite columns that never left the same row (at 100 TB that is a
    * whole extra pass over the lake). Codegen subexpression elimination
    * evaluates the shared token split once per row across both gate
    * expressions; the surviving rows then hash-join the canonical set —
    * both sides corpus-scale, so a shuffle join (never broadcast) with
    * the gate predicates already applied below it.
    */
  def cleanCorpus(spark: SparkSession, dir: String, tau: Double = 0.5,
      minScore: Double = 0.72): DataFrame =
    cleanCorpusWithCanon(spark, dir,
      Dedup.clusters(spark, dir, tau)
        .filter(col("is_canonical")).select(col("doc_id")),
      minScore)

  /** The gate-and-join stage behind [[cleanCorpus]] with the canonical set
    * injected — split out so the plan audit can pin the one-text-scan
    * property on the LARGE local corpora too (where constructing the real
    * clusters frame would execute a multi-minute label build just to look
    * at a plan).
    */
  private[graft] def cleanCorpusWithCanon(spark: SparkSession, dir: String,
      canon: DataFrame, minScore: Double = 0.72): DataFrame = {
    // Both gates evaluate inside ONE native kernel pass per doc
    // ([[graft.functions.TextGates]] — parity with Text.scoreCol/guessCol
    // spec-pinned): the HOF formulation's interpreted lambdas measured
    // ~25 s of the pipeline's ~26 s at 5M docs. The kernel frame is
    // cached as a materialization barrier so predicate pushdown cannot
    // sink the score/guess gates below the projection and re-run the
    // kernel once per predicate (the contamination lesson).
    val g = Text.gateFrame(spark, dir)
      .filter(col("score") >= minScore && col("lang_guess") =!= "und")
    canon.join(g, Seq("doc_id"))
      .select(col("doc_id"), col("lang_guess"), col("score"), col("n_tokens"))
  }

  /** Sequence-packing audit — the data-loading step of LM training:
    * documents are concatenated shard by shard in deterministic doc_id
    * order and chunked into fixed context windows of `window` tokens
    * ("concat-then-chunk", the packing used by GPT-style pipelines); a doc
    * belongs to the bin its first token lands in (bin = exclusive prefix
    * token sum DIV window). Emits per (source shard, bin): docs starting
    * there, their token mass, and the doc_id range — the audit a packing
    * job publishes so training can address any window (source, bin)
    * without re-scanning text.
    *
    * Scale: packing is a per-shard prefix sum, computed as the textbook
    * TWO-PHASE parallel scan so parallelism is sources × doc_id-range
    * buckets, never just the shard count: (1) a window cumsum WITHIN each
    * (source, doc_id DIV B) bucket — bucket order refines doc_id order,
    * so bucket-local prefixes are exact; (2) bucket totals (a tiny
    * metadata-grain frame) get their own exclusive per-source cumsum and
    * broadcast back as offsets. The single-phase per-source window was
    * measured as a real cap: 5 shards × 1M docs ran the corpus cumsum in
    * FIVE tasks (8.7 s of the 5M-doc suite; 2.9 s two-phase). Both
    * consumers sit above ONE exchange (ReuseExchange), so the corpus is
    * scanned and tokenized once; the bucket window stays spec-pinned
    * shard-partitioned — never a global-order window.
    */
  /** Bucket width in doc_id space for [[packSequences]]'s two-phase scan
    * (ids need not be dense — empty buckets simply don't exist; uneven
    * buckets only skew task sizes, never results). 64k keeps the
    * bucket-total frame metadata-sized at any plausible id range while
    * giving each shard ≥ corpus/64k-way parallelism. A spec seam (var) so
    * tests can force MULTIPLE buckets per source on the tiny spec corpus
    * and exercise the bucket-offset arm (boff window + offset join) that
    * a corpus whose ids all fit one bucket never touches.
    */
  private[graft] var PackBucketWidth: Long = 65536L

  /** Row cap on [[packSequences]]' broadcast of the per-(source, bucket)
    * offset frame. Offset rows grow as id-range/bucket-width per source —
    * ~1.5M rows per source at a dense 10¹¹ id range — so like every other
    * broadcast/driver structure in the engine (ngram winner cap, rarity
    * vocab cap, SQ8 constants) it carries an explicit cap: past it the
    * offsets join back as a plain shuffle join on (source, bkt) — both
    * sides already partition-compatible, results identical.
    */
  private[graft] var PackOffsetBroadcastCap = 1L << 20

  /** Session memo of [[packSequences]] frames (same contract as the
    * Similarity suite's slim-index memo: corpus path = identity). Repeat
    * invocations — bench pass-min, audits — reuse ONE plan and ONE pair of
    * tracked cache entries instead of registering fresh ones per call.
    */
  private val packed = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** Driver-side parquet footer row count ([[graft.Tables.footerRowCount]]
    * — no Spark job), so the broadcast-under-cap decision below is
    * metadata-only whenever the DOC count already fits the cap: offset
    * rows are one per non-empty (source, bucket), each holding ≥ 1 doc,
    * so docs ≤ cap ⇒ offsets ≤ cap. Only a corpus with MORE docs than the
    * cap (where offsets may still be few) pays a real count — once per
    * session, and that count scans the cached slim agg the query needs
    * anyway. The shared helper recurses into partition subdirectories, so
    * the implication stays sound for any parquet layout.
    */
  private def footerRowCount(spark: SparkSession, path: String): Long =
    graft.Tables.footerRowCount(spark, path)

  def packSequences(spark: SparkSession, dir: String, window: Int = 512): DataFrame = {
    val B = PackBucketWidth
    val cap = PackOffsetBroadcastCap
    // Memo key carries the corpus fingerprint (parity with DerivedState's
    // durable-frame staleness contract). NOTE the protection is
    // cross-JVM-session: DerivedState.fingerprint is itself memoized per
    // dir for the JVM's lifetime, so a corpus regenerated in place is
    // re-fingerprinted (and this memo missed) only by a fresh session —
    // the same contract the durable frames have. The plan is
    // built OUTSIDE the map's compute lambda under a per-key lock —
    // packPlan runs Spark jobs, and computeIfAbsent would serialize
    // unrelated corpora that hash to the same bin behind them (the same
    // anti-pattern DerivedState documents). Entries of stopped sessions
    // are swept so dead sessions don't pin their frames.
    packed.keys.asScala.filter(_._1.sparkContext.isStopped)
      .foreach(packed.remove)
    val key = (spark, s"$dir#${graft.DerivedState.fingerprint(dir)}#$window#$B#$cap")
    val hit = packed.get(key)
    if (hit != null) hit
    else packLocks.computeIfAbsent(key._2, _ => new Object).synchronized {
      Option(packed.get(key)).getOrElse {
        val df = packPlan(spark, dir, window, B, cap)
        packed.put(key, df)
        df
      }
    }
  }

  private val packLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def packPlan(spark: SparkSession, dir: String, window: Int,
      B: Long, cap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The slim (doc_id, source, tc, bkt) frame is CACHED: the cumsum
    // branch and the bucket-offset branch both consume it, and without a
    // materialization barrier column pruning specializes each branch's
    // exchange (the offset branch drops the window), ReuseExchange finds
    // nothing, and the corpus is scanned and TOKENIZED twice (measured:
    // 2 FileScans, 7.8 s vs 3.4 s at 5M docs).
    val tc = tracked(documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(Text.toks(col("text"))).cast("long").as("tc"))
      .withColumn("bkt", expr(s"doc_id DIV $B")))
    val wLocal = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val local = tc.withColumn("lcum", coalesce(sum(col("tc")).over(wLocal), lit(0L)))
    val wBkt = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = tc.groupBy(col("source"), col("bkt"))
      .agg(sum(col("tc")).as("bsum"))
      .withColumn("boff", coalesce(sum(col("bsum")).over(wBkt), lit(0L)))
      .select(col("source"), col("bkt"), col("boff"))
    // Broadcast under the cap (the overwhelmingly common case: offsets are
    // metadata-grain); a dense-id mega-corpus whose offset frame overflows
    // it joins by shuffle instead. The decision is metadata-only (footer
    // row counts ≤ cap ⇒ offsets ≤ cap) whenever possible, so constructing
    // the frame stays LAZY — a plan-only audit never runs a tokenize job.
    // A corpus with more docs than the cap counts distinct (source,
    // bucket) over a SEPARATE two-column scan: offset cardinality never
    // depends on token counts, so counting through the tokenizing `offs`
    // plan (as r15 did) paid a full corpus tokenize for a decision a slim
    // dictionary-column scan answers — measured 29.0 s pass-1 / 6.5 s
    // pass-min at 5M docs vs 2.8 s once decoupled.
    val offsC = tracked(offs)
    val offsSide =
      if (footerRowCount(spark, s"$dir/documents.parquet") <= cap ||
          documents(spark, dir)
            .select(col("source"), expr(s"doc_id DIV $B"))
            .distinct().count() <= cap) broadcast(offsC)
      // merge hint: an over-cap frame must never reach the driver even if
      // the planner's size estimate disagrees with the cap.
      else offsC.hint("merge")
    local.join(offsSide, Seq("source", "bkt"))
      .withColumn("cum", col("lcum") + col("boff"))
      .withColumn("bin", expr(s"cum DIV $window"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("tokens_in"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  /** Frames cached by this suite — same contract as the other operator
    * registries (graft.Bench / Verify release at exit).
    */
  private val caches = new graft.CacheRegistry
  private def tracked(df: DataFrame): DataFrame = caches.tracked(df)

  /** Unpersist every frame this suite has cached. */
  def clearCaches(): Unit = {
    caches.clear(); packed.clear(); packLocks.clear()
  }
}
