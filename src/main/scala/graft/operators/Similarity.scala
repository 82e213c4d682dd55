package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vec

/** Similarity search over the `embeddings` table — the Milvus query surface
  * (ANN top-k, range search) re-expressed Spark-first. Reference semantics:
  * milvus-cdc replicates collections (Insert/Delete of vector-field rows,
  * reference: core/writer/milvus_handler.go:156-178) whose downstream query
  * API is scalar-filtered vector search; these operators ARE that query API
  * on Spark, so a replicated corpus stays queryable without Milvus.
  *
  * Scale posture: the query set is always broadcast (≤ MBs); scoring is a
  * narrow map over the corpus (codegen'd HOFs, norms precomputed once per
  * row); top-k goes through TakeOrderedAndProject (per-partition partial
  * top-k) or a per-query window — never a global sort of the corpus.
  * Brute force is the exactness baseline; [[ivfSearch]] is the 10⁹-vector
  * path (centroid pruning cuts the scored candidates by ~nprobe/nlist).
  */
object Similarity {
  import graft.Tables._

  /** Long-lived frames this suite caches (today: [[semanticDedup]]'s slim
    * index read — one in-memory copy serves every join branch and every
    * repeated invocation). Long-lived sessions (Bench, Verify) clear it
    * per suite like Dedup's and Text's registries.
    */
  private val caches = new graft.CacheRegistry
  private def tracked(df: DataFrame): DataFrame = caches.tracked(df)

  /** Unpersist every frame this suite has cached. */
  def clearCaches(): Unit = { semSlims.clear(); caches.clear() }

  /** (vec_id, embedding, nrm) — norms computed once, reused per pair. */
  private def normed(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Vec.l2Norm(col("embedding")).as("nrm"))

  private def cosTo(qe: Column, qn: Column): Column =
    round(Vec.cosinePrenorm(col("embedding"), qe, col("nrm"), qn), 4)

  /** Cosine top-k for one fixed query vector (vec_id 0) — Milvus `search`.
    * ORDER BY+LIMIT on the rounded score → TakeOrderedAndProject.
    */
  def knnBruteforce(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val n = normed(spark, dir)
    val q = n.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    n.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("vec_id"), cosTo(col("qe"), col("qn")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Scalar-filtered ANN top-k — THE Milvus query shape (`search` with a
    * filter expression): the scalar predicate prunes the corpus AT THE SCAN
    * (parquet PushedFilters), so the expensive scoring map only ever sees
    * surviving rows. At 100 TB the filter selectivity, not the index, is the
    * first lever.
    */
  def filteredKnn(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), Vec.l2Norm(col("embedding")).as("qn"))
    e.filter(col("vec_id") =!= 0 && col("label").isin(1, 3, 5))
      .select(col("vec_id"), col("label"), col("embedding"),
        Vec.l2Norm(col("embedding")).as("nrm"))
      .join(broadcast(q))
      .select(col("vec_id"), col("label"), cosTo(col("qe"), col("qn")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Top-k per query for a broadcast query set (vec_id < 8) against the
    * corpus (vec_id >= 8) — Milvus batched `search`. One narrow scoring map
    * (|corpus| × |queries| rows), then a per-query window rank; the shuffle
    * key is q_id so ranking parallelizes across queries.
    */
  def knnJoin(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val n = normed(spark, dir)
    val q = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = n.filter(col("vec_id") >= 8)
      .join(broadcast(q))
      .select(col("q_id"), col("vec_id"), cosTo(col("qe"), col("qn")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** All vectors with cosine ≥ τ to the query — Milvus range search. Pure
    * filter over the scoring map: no shuffle at all.
    */
  def rangeSearch(spark: SparkSession, dir: String, tau: Double = 0.25): DataFrame = {
    val n = normed(spark, dir)
    val q = n.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    n.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("vec_id"), cosTo(col("qe"), col("qn")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Norm audit: L2 norm, dimension, first normalized component — the
    * sanity pass before any cosine math (catches zero vectors / dim drift).
    */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    normed(spark, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(col("nrm"), 4).as("l2_norm"),
        round(element_at(col("embedding"), 1).cast("double") / col("nrm"), 4).as("head_norm"))

  /** Embedding near-dup pairs: exact cosine ≥ τ, vec_id_a < vec_id_b, via a
    * BLOCK-GRID join — the distributed exact all-pairs shape, not a
    * cartesian.
    *
    * Why exact, not LSH: at τ = 0.45 the qualifying pairs are wide-angle
    * (acos 0.45 ≈ 63°; measured cos on the test corpora spans 0.45-0.60,
    * ~90% of pairs cross label clusters). Sign-projection banding at that
    * angle collides on random pairs almost as often as on true pairs
    * (p_bit ≈ 0.65 vs 0.5): the only recall-safe banding (R=2, B=32, miss
    * ≈ 3e-8) admits ~ALL pairs as candidates, i.e. quadratic work plus LSH
    * overhead — measured IVF top-2 blocking covers only ~57% of true pairs.
    * When the output itself is near the random tail, exact all-pairs IS the
    * algorithm; banding pays off only in the high-τ regime (τ ≥ 0.8, where
    * R=16-bit bands reject random pairs 1e-5 vs 2.5e-2 for true ones) —
    * that regime is served by [[Dedup.simhash]]-style chunk buckets.
    *
    * The scale problem with the naive formulation is not the O(n²) scoring
    * (inherent) but the BroadcastNestedLoopJoin: one side materialized
    * whole on every executor. The block grid fixes that: vectors hash into
    * NB blocks by id; each unordered block pair (i ≤ j) is one join-key
    * group, sides replicated ~NB/2× — a plain shuffled equi-join where
    * per-task memory is bounded by 2 block sizes (tune NB ∝ √cores so
    * blocks fit executors), parallelism = NB(NB+1)/2 grid cells, and no
    * relation is ever broadcast or nested-loop scanned.
    */
  def pairwiseDups(spark: SparkSession, dir: String, tau: Double = 0.45,
      nBlocks: Int = 8): DataFrame = {
    val n = normed(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        pmod(col("vec_id"), lit(nBlocks)).as("blk"))
    // a-side owns grid cells (blk, q) for q >= blk; b-side cells (p, blk)
    // for p <= blk — every unordered block pair meets in exactly one cell.
    // spread: the probe side of the broadcast grid join inherits the scan's
    // split count — a small single-file corpus is ONE split, so the whole
    // O(n²/2) scoring loop ran on one core (measured 2.0 s for 2M pairs at
    // sf0.1, ~1 µs-core/pair vs the ~60 ns FMA floor; 0.35 s spread).
    // No-op at real corpus sizes where the scan is already well-split.
    val a = graft.Tables.spread(n)
      .withColumn("gj", explode(array((0 until nBlocks).map(lit): _*)))
      .filter(col("blk") <= col("gj"))
      .select(col("blk").as("gi"), col("gj"),
        col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = n
      .withColumn("gi", explode(array((0 until nBlocks).map(lit): _*)))
      .filter(col("gi") <= col("blk"))
      .select(col("gi"), col("blk").as("gj"),
        col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    // Off-diagonal cells pair distinct blocks, so every match is a distinct
    // unordered pair (normalize id order on output); on the diagonal both
    // orderings meet, so keep the a < b half. Cosine is symmetric.
    a.join(b, Seq("gi", "gj"))
      .filter(col("gi") =!= col("gj") || col("vec_a") < col("vec_b"))
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"),
        round(Vec.cosinePrenorm(col("ea"), col("eb"), col("na"), col("nb")), 4).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Point lookup — Milvus `get(ids=[...])`: fetch rows by primary key
    * with projected output fields. The id set reaches the parquet scan as
    * an In PushedFilter; at 100 TB with a sorted/bucketed layout this is a
    * few row groups, not a scan.
    */
  def pointGet(spark: SparkSession, dir: String,
      ids: Seq[Long] = Seq(3L, 17L, 42L, 99L, 123L)): DataFrame =
    embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        round(Vec.l2Norm(col("embedding")), 4).as("l2_norm"))

  /** L2 (euclidean) top-k — Milvus `metric_type=L2`. dist² = |a|² + |b|² −
    * 2⟨a,b⟩ from the precomputed norms: one dot per pair, same narrow
    * scoring map as cosine. Smallest distance first.
    */
  def l2Knn(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val n = normed(spark, dir)
    val q = n.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    n.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("vec_id"),
        round(sqrt(greatest(lit(0.0),
          col("nrm") * col("nrm") + col("qn") * col("qn") -
            lit(2.0) * Vec.dot(col("embedding"), col("qe")))), 4).as("l2_dist"))
      .orderBy(col("l2_dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Inner-product top-k — Milvus `metric_type=IP` (un-normalized dot). */
  def ipKnn(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val n = normed(spark, dir)
    val q = n.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    n.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("vec_id"),
        round(Vec.dot(col("embedding"), col("qe")), 4).as("ip"))
      .orderBy(col("ip").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Binary-vector Hamming top-k — Milvus BINARY_VECTOR + `HAMMING`.
    * Vectors binarize by sign bit (the standard float→binary quantization),
    * packed into two 32-bit words so the packing sum never overflows a
    * signed long; distance = Σ bit_count(xor(word_i)). The scoring map is
    * pure integer ops — at 100 TB this is the cheapest metric there is.
    */
  def binaryKnn(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // Pack bit i of word w as 2^i when embedding[w*32 + i + 1] > 0 — one
    // codegen'd loop (Vec.signPackWord); the literal 32-branch
    // when(element_at…) tree per word re-checked bounds/null per branch
    // and made this the slowest knn (0.92 s vs siblings' ~0.2 at sf0.1).
    def word(e: Column, w: Int): Column = Vec.signPackWord(e, w * 32)
    val withWords = embeddings(spark, dir)
      .select(col("vec_id"), word(col("embedding"), 0).as("w0"),
        word(col("embedding"), 1).as("w1"))
    val q = withWords.filter(col("vec_id") === 0)
      .select(col("w0").as("qw0"), col("w1").as("qw1"))
    withWords.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("vec_id"),
        (bit_count(col("w0").bitwiseXOR(col("qw0"))) +
          bit_count(col("w1").bitwiseXOR(col("qw1")))).cast("long").as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH-bucketed ANN — the other scale path next to [[ivfSearch]]:
    * sign-random-projection buckets (here axis-aligned sign bits — fully
    * deterministic, so the probe set and therefore the result is
    * oracle-checkable), multi-probe over all buckets within Hamming ≤ 1 of
    * the query's bucket, exact cosine re-rank of the candidates.
    *
    * Scale: candidates ≈ corpus × probes / 2^bits; the bucket key is a
    * pure narrow map (ideal as a partition/sort key at ingest, making the
    * probe a partition-pruned read), re-rank touches candidates only.
    */
  def lshSearch(spark: SparkSession, dir: String, k: Int = 10,
      bits: Int = 8): DataFrame = {
    def bucket(e: Column): Column =
      (0 until bits).map { i =>
        when(element_at(e, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    val n = normed(spark, dir).withColumn("bk", bucket(col("embedding")))
    // The query's bucket is index metadata (one row) — resolve it driver-
    // side, then multi-probe = the 1+bits buckets within Hamming <= 1.
    val q = n.filter(col("vec_id") === 0)
      .select(col("embedding"), col("nrm"), col("bk")).collect().head
    val (qe, qn, qb) = (q.getSeq[Float](0).toArray, q.getDouble(1), q.getLong(2))
    val probes = qb +: (0 until bits).map(i => qb ^ (1L << i))
    n.filter(col("bk").isin(probes: _*) && col("vec_id") =!= 0)
      .select(col("vec_id"), col("bk").as("bucket"),
        round(Vec.cosinePrenorm(col("embedding"), typedlit(qe), col("nrm"), lit(qn)), 4)
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Milvus grouping search (`search` with `group_by_field`): top-k where
    * each GROUP contributes its single best hit — the best match per label,
    * then the k best labels. Per-group argmax via max_by (map-side partial
    * fold, one shuffle on the label), then a k-row TakeOrdered — the
    * corpus is never globally sorted.
    */
  def groupedKnn(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val n = embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        Vec.l2Norm(col("embedding")).as("nrm"))
    val q = n.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    n.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("label"), col("vec_id"), cosTo(col("qe"), col("qn")).as("cos"))
      .groupBy(col("label"))
      // Argmax on (cos, -vec_id): lowest vec_id breaks exact-cos ties
      // deterministically; max_by folds map-side (no per-group sort).
      .agg(max_by(
        struct(col("cos").as("cos"), (-col("vec_id")).as("negid")),
        struct(col("cos").as("cos"), (-col("vec_id")).as("negid"))).as("m"))
      .select(col("label"), (-col("m.negid")).as("best_vec_id"), col("m.cos").as("cos"))
      .orderBy(col("cos").desc, col("label").asc)
      .limit(k)
  }

  /** Milvus hybrid search (multi-vector `hybrid_search` + RRFRanker): two
    * query vectors each produce a bounded top-`cand` candidate list; the
    * lists fuse by reciprocal rank: rrf = Σ 1/(60 + rank_i), inner-joined
    * (Milvus fuses the returned lists — a vector absent from either list
    * is out).
    *
    * Scale: each list is TakeOrderedAndProject over the broadcast-scored
    * corpus (per-partition partial top-k, NO global sort); the rank window
    * then runs over ≤ `cand` rows — corpus size never reaches a window.
    */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10,
      cand: Int = 100, rrfK: Int = 60): DataFrame = {
    val n = normed(spark, dir)
    def ranked(qid: Int, rankName: String): DataFrame = {
      val q = n.filter(col("vec_id") === qid)
        .select(col("embedding").as("qe"), col("nrm").as("qn"))
      val w = Window.orderBy(col("cos").desc, col("vec_id").asc)
      n.filter(col("vec_id") >= 2)
        .join(broadcast(q))
        .select(col("vec_id"), cosTo(col("qe"), col("qn")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(cand)
        .withColumn(rankName, row_number().over(w).cast("long"))
        .select(col("vec_id"), col(rankName))
    }
    ranked(0, "rank_a").join(ranked(1, "rank_b"), "vec_id")
      .select(col("vec_id"), col("rank_a"), col("rank_b"),
        round(lit(1.0) / (lit(rrfK) + col("rank_a")) +
          lit(1.0) / (lit(rrfK) + col("rank_b")), 4).as("rrf"))
      .orderBy(col("rrf").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Per-label centroid audit: count, mean norm, and the first four centroid
    * components per label — the grouped statistics behind partition-level
    * vector quality checks (and the seed step of a per-label IVF build).
    * One shuffle on the label with map-side partial avgs.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("label"), col("embedding"), Vec.l2Norm(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(col("nrm")), 4).as("avg_norm"),
        round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("c1"),
        round(avg(element_at(col("embedding"), 2).cast("double")), 4).as("c2"),
        round(avg(element_at(col("embedding"), 3).cast("double")), 4).as("c3"),
        round(avg(element_at(col("embedding"), 4).cast("double")), 4).as("c4"))

  /** Per-dimension feature statistics across the corpus (mean/sd/min/max per
    * embedding coordinate) — what a quantizer or normalizer is fit on.
    *
    * Scale: posexplode multiplies rows by dim (64×), but the groupBy on the
    * dimension id partial-aggregates map-side, so the shuffle carries only
    * #partitions × dim tiny agg buffers — at 100 TB this is scan-bound.
    */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("x")), 4).as("mean"),
        round(stddev_samp(col("x")), 4).as("sd"),
        round(min(col("x")), 4).as("mn"),
        round(max(col("x")), 4).as("mx"))

  /** Per-session materialized IVF index dirs, keyed by (corpus dir, nlist).
    * Cleaned by a JVM shutdown hook — the index is scratch derived state,
    * rebuildable from the corpus.
    */
  private val ivfIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Session-memoized corpus row counts, so nlist auto-sizing
    * ([[semanticDedup]]) costs ONE count scan per corpus dir per session,
    * not one per invocation. An immutable-corpus assumption identical to
    * the index lifecycle's (the key is the path).
    */
  private val corpusCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def corpusCount(spark: SparkSession, dir: String): Long =
    corpusCounts.computeIfAbsent(dir, _ => embeddings(spark, dir).count())

  /** Test seam for the durable-index root (env vars can't be set in-JVM);
    * production reads `SPARK_GRAFT_IVF_DIR`.
    */
  private[graft] var ivfDirOverride: Option[String] = None

  /** nlist at or above which the index-build assignment switches from the
    * exact single-level argmax to the two-level coarse quantizer. 256
    * keeps every driver-gated corpus (nlist ≤ 16) on the exact path —
    * and below it exact assignment is wall-faster anyway (r16 retune,
    * measured with ProbeCoarseAgreement); a spec seam (var) lets tests
    * force the two-level path at small nlist to measure agreement.
    */
  private[graft] var CoarseMinNlist: Int = 256
  /** Coarse cells probed per vector — CONSTANT, deliberately: with probe ∝
    * nCells the probed-centroid count is probe·k/nCells ∝ k and the build
    * is back to O(n·k·d) with a smaller constant (measured: 292 s at 20M
    * vectors, scoring 2016 of 16k centroids/vec). A constant probe keeps
    * the per-vector cost at nCells + probe·k/nCells, which [[coarseCellsOf]]
    * minimizes to 2·√(probe·k) — the real O(√k) per vector.
    *
    * Probe 16 and threshold 256 are MEASURED (r16, ProbeCoarseAgreement,
    * 1M × 768-dim / k=800): probe 4 agreed with exact argmax on only
    * 69.4% of assignments at production width (89% at dim 64 — high-dim
    * cosine concentration makes cell shortlists miss more), probe 16
    * reaches 85.3% while still scoring only 2√(16k) ≈ 6% of centroids at
    * the k=16000 regime the two-level path exists for. Below k=256 the
    * coarse path saves nothing even in wall time (k=112 × 768-dim:
    * exact 4.1 s vs coarse 6.2 s — overheads dominate the 2.7× FLOP cut),
    * so small-k builds go exact: free agreement.
    */
  private[graft] var CoarseProbe = 16
  private[graft] def coarseProbe(nCells: Int): Int = CoarseProbe
  /** Cell count minimizing nCells + probe·k/nCells: √(probe·k). At k=16000
    * → 253 cells, ~506 of 16k centroids scored per vector (vs 2016 for the
    * √k-cells/probe-∝-cells formulation this replaces).
    */
  private[graft] def coarseCellsOf(k: Int): Int =
    math.max(2, math.min(k,
      math.round(math.sqrt(CoarseProbe.toDouble * k)).toInt))
  /** Test seam: forget session-memoized index paths (simulates a fresh
    * session against the same durable index root).
    */
  private[graft] def resetIvfMemo(): Unit = ivfIndexDirs.clear()

  /** Build-once IVF index for `dir`: centroids = the deterministic vec_id <
    * nlist seed rows (collected once — an ANN index always materializes its
    * centroid metadata), corpus assigned to its nearest centroid by a
    * literal-expression argmax (a NARROW MAP — no shuffle at any corpus
    * size) and written CLUSTER-PARTITIONED parquet. Probes then prune at
    * the file source: a query touching nprobe of nlist clusters reads
    * nprobe/nlist of the files — the partition-pruning shape a 100 TB
    * serving corpus needs (Milvus keeps its IVF inverted lists exactly so;
    * on Spark the inverted list IS a partition directory). The write
    * happens once per (dir, nlist) per session; every search afterwards is
    * probe-only. Assignment ties break to the smallest cid (strict-max
    * loop over ascending cids), matching the oracle's ORDER BY cos DESC,
    * cid.
    *
    * Index LIFECYCLE: by default the index lives in a session-scoped temp
    * dir (a local[*] convenience — scratch derived state, rebuilt per
    * session, removed by a shutdown hook). Set `SPARK_GRAFT_IVF_DIR` to a
    * durable location and the index lands there keyed by (corpus dir,
    * nlist); a later session REUSES it without rebuilding — on a real
    * cluster that directory belongs in the lake next to the corpus, like
    * any ANN index. Rebuild-on-corpus-change is the caller's contract
    * (same as Milvus index lifecycle): the key encodes the corpus PATH,
    * not its contents, so replacing the corpus in place requires clearing
    * the index dir.
    */
  private def ivfIndexed(spark: SparkSession, dir: String, nlist: Int)
      : (DataFrame, Array[(Long, Array[Float], Double)]) = {
    val n = normed(spark, dir)
    val cents: Array[(Long, Array[Float], Double)] = n.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val path = ivfIndexDirs.computeIfAbsent(s"$dir#$nlist", { _ =>
      val durable = ivfDirOverride.orElse(sys.env.get("SPARK_GRAFT_IVF_DIR")).map { root =>
        // Key by corpus ([[graft.Tables.corpusKey]]: sanitized path + MD5
        // tag so distinct dirs can never alias) + nlist, so one root dir
        // serves many corpora and index configurations side by side.
        new java.io.File(root, s"${graft.Tables.corpusKey(dir)}#$nlist")
      }
      durable match {
        case Some(d) if new java.io.File(d, "_SUCCESS").isFile =>
          d.getPath // pre-built by an earlier session — reuse, no rebuild
        case maybeDir =>
          // Assignment = one codegen'd argmax loop over the centroid
          // matrix (Vec.nearestCentroid): same double math (and ties) as
          // a greatest(struct(cos, -cid)) literal tree, but codegen size
          // no longer grows with nlist — a k-means-scale build (k ∝
          // corpus, see semanticDedup) stays one narrow map. Above
          // CoarseMinNlist centroids the argmax goes two-level (coarse
          // quantizer — assign to one of ~√k cells first, then argmax in
          // the probed cells' centroid subsets): O(n·√k·d) instead of
          // O(n·k·d), which with k ∝ n is the difference between an
          // O(n^1.5) and an O(n²) index build. Every oracle-gated corpus
          // runs nlist ≤ 16 and therefore the exact path; the two-level
          // path's agreement with exact argmax is spec-measured
          // (SimilaritySpec) — cell-boundary vectors may differ, which
          // for an IVF/SemDeDup partitioning is a recall knob, not a
          // correctness surface.
          val assignCol =
            if (cents.length >= CoarseMinNlist) {
              val nCells = coarseCellsOf(cents.length)
              Vec.nearestCentroidCoarse(col("embedding"), col("nrm"), cents,
                nCells, coarseProbe(nCells))
            } else Vec.nearestCentroid(col("embedding"), col("nrm"), cents)
          val assigned = n.withColumn("cluster", assignCol)
            // Cluster-align BEFORE the partitioned write: without it every
            // write task holds an open parquet writer per cluster it sees
            // (tasks × nlist small files — measured 151 s vs 22 s at 2M
            // vectors / nlist=1600); after the shuffle each cluster is
            // written by one task as one file, which is also the
            // read-side layout a partition-pruned probe wants.
            .repartition(col("cluster"))
          val p = maybeDir.getOrElse {
            val t = java.nio.file.Files.createTempDirectory("graft-ivf-").toFile
            Runtime.getRuntime.addShutdownHook(new Thread(() => {
              def rm(f: java.io.File): Unit = {
                Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
              }
              rm(t)
            }))
            t
          }
          // Task-commit-direct output (FileOutputCommitter v2): the
          // default v1 job commit merges every partition dir sequentially
          // on the driver — at k-means-scale nlist (16k dirs, 20M
          // vectors) that merge measured 534 s vs 148 s with v2, which
          // moves task output to its final location at task commit, in
          // parallel. Benign session-wide setting (v2 trades atomic job
          // commit for speed; the _SUCCESS marker below remains the
          // reuse gate, so a torn build is never mistaken for an index).
          spark.sparkContext.hadoopConfiguration
            .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
          assigned.write.partitionBy("cluster").mode("overwrite").parquet(p.getPath)
          p.getPath
      }
    })
    // Partition-column values read back as the inferred integer type; cast
    // to the long the un-indexed plan produced so output schemas agree.
    (spark.read.parquet(path)
      .withColumn("cluster", col("cluster").cast("long")), cents)
  }

  private[graft] def testIvfIndexed(spark: SparkSession, dir: String, nlist: Int)
      : (DataFrame, Array[(Long, Array[Float], Double)]) = ivfIndexed(spark, dir, nlist)

  private[graft] def testNormed(spark: SparkSession, dir: String): DataFrame =
    normed(spark, dir)

  /** IVF-style ANN: `nlist` centroids (deterministic seed rows), each corpus
    * vector assigned to its nearest centroid once ([[ivfIndexed]] — the
    * "index build", materialized cluster-partitioned), then the query
    * probes only the `nprobe` nearest clusters — READING ~nprobe/nlist of
    * the index via partition pruning instead of scanning all of it.
    * Exactness within probed clusters; recall vs brute force is the spec's
    * measured quantity. This is the 10⁹-vector scale path.
    */
  def ivfSearch(spark: SparkSession, dir: String, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    require(nlist >= 2 && nprobe >= 1)
    val (idx, cents) = ivfIndexed(spark, dir, nlist)
    // Probe selection is driver-side math on the collected centroids —
    // the same sequential double fold the scoring expression (and the
    // oracle's list_sum) uses, so the ordering is bit-identical.
    val (qe, qn) = cents.find(_._1 == 0L)
      .map(c => (c._2, c._3))
      .getOrElse(throw new IllegalStateException("query vector must exist"))
    val probed: Seq[Long] = cents
      .map { case (cid, ce, cn) => (cid, ddot(ce, qe) / (cn * qn)) }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(nprobe).map(_._1).toSeq
    // Search only the probed clusters: partition-pruned scan + narrow
    // scoring map + partial top-k. Zero exchanges end to end.
    idx
      .filter(col("cluster").isin(probed: _*) && col("vec_id") =!= 0)
      .select(col("vec_id"), col("cluster"),
        round(Vec.cosinePrenorm(col("embedding"), typedlit(qe), col("nrm"), lit(qn)), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sequential left-to-right double dot — the SAME fold order as the
    * columnar scoring expression and the oracle's list_sum, so driver-side
    * probe selection is bit-identical to both.
    */
  private def ddot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** IVF-accelerated multi-query top-k — Milvus batched `search` (nq > 1)
    * on an IVF index, the scale path [[knnJoin]] lacks: the same
    * deterministic index as [[ivfSearch]] (centroids = the vec_id < nlist
    * seed rows; each corpus vector assigned once by centroid argmax), and
    * each of the nq queries probes only its own nprobe nearest clusters.
    *
    * Scale: the corpus-side work is one partition-pruned scan of the
    * materialized index ([[ivfIndexed]] — clusters no query probes are
    * never read) plus one BROADCAST join against the (q_id, cluster, qe,
    * qn) probe table (nq·nprobe rows) — each corpus row is scored only by
    * the queries probing its cluster, ~nq·nprobe/nlist× the corpus instead
    * of [[knnJoin]]'s nq× full scoring; the per-query top-k is a window
    * keyed on q_id over candidates only. At 10⁹ vectors × thousands of
    * queries this is the difference between a full-corpus re-scan per
    * query batch and a cluster-pruned probe.
    *
    * Probe sets are driver-side math over the collected index metadata
    * (nlist centroids × nq query rows), with [[ddot]] keeping the fold
    * order bit-identical to the oracle's list_sum — which is what makes
    * this SQL-restatable and therefore oracle-gated like every other op.
    */
  def ivfJoin(spark: SparkSession, dir: String, k: Int = 3,
      nlist: Int = 16, nprobe: Int = 4, nq: Int = 8): DataFrame = {
    require(nlist >= 2 && nprobe >= 1 && nq >= 1)
    val (idx, cents) = ivfIndexed(spark, dir, nlist)
    val assigned = idx.filter(col("vec_id") >= nq)
    // Query rows are index-metadata-sized (nq rows), collected like the
    // centroids; per-query probe sets = top-nprobe centroids by cosine.
    val queries: Array[(Long, Array[Float], Double)] =
      normed(spark, dir).filter(col("vec_id") < nq)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val probeRows = queries.toSeq.flatMap { case (qid, qe, qn) =>
      cents.map { case (cid, ce, cn) => (cid, ddot(ce, qe) / (cn * qn)) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(nprobe)
        .map { case (cid, _) => (qid, cid, qe, qn) }
    }
    import spark.implicits._
    val probes = probeRows.toDF("q_id", "cluster", "qe", "qn")
    // Partition-prune the index scan to the UNION of the probe sets before
    // the broadcast join — clusters no query probes are never read.
    val probedAny: Seq[Long] = probeRows.map(_._2).distinct
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    assigned
      .filter(col("cluster").isin(probedAny: _*))
      .join(broadcast(probes), "cluster")
      .select(col("q_id"), col("vec_id"), col("cluster"),
        cosTo(col("qe"), col("qn")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Semantic (embedding-space) dedup, SemDeDup-style (Abbas et al. 2023):
    * cluster the corpus (the same deterministic IVF assignment as
    * [[ivfSearch]] — at 100 TB the k-means step an ANN index build already
    * ran), then compare pairs only WITHIN a cluster; a vector is a
    * duplicate iff some lower-vec_id cluster-mate sits at cosine ≥ τ.
    * Returns the duplicates with their cluster, earlier-neighbor count,
    * and max cosine — `anti-join on vec_id` is the keep-side.
    *
    * Scale: clustering cuts candidate pairs from n²/2 to Σ|c|²/2 (~n²/2k
    * for balanced clusters), and the within-cluster all-pairs are
    * decomposed by the SAME block grid as [[pairwiseDups]] — the join key
    * is (cluster, gi, gj), so parallelism is Σ NB_c(NB_c+1)/2 grid cells
    * (not nlist — a cluster-only key caps every task at one whole
    * cluster and |c|² work, the textbook skewed-key quadratic at 10⁸+
    * vectors) and per-task memory is bounded by two sub-blocks of one
    * cluster regardless of cluster size. NB is WORK-BASED per cluster —
    * max(nBlocks, ⌈|c| / T(dim)⌉) — so every cell owes at most the same
    * FMA budget the routing threshold encodes at any embedding width
    * (r16; the fixed NB=4 it replaces left a 49k × 768-dim blob as 10
    * cells of up to ~134 s). Both join sides read the materialized
    * cluster-partitioned index ([[ivfIndexed]]), so the scan cost is
    * already paid; replication is ~NB_c/2× per side. At a real corpus
    * you also scale nlist with n (SemDeDup uses k ∝ n) — the grid makes
    * hot clusters survivable either way.
    */
  /** Minimum nlist / target cluster size for [[semanticDedup]]'s auto
    * nlist = max(SemMinNlist, ⌈n / SemClusterTarget⌉) — SemDeDup's k ∝ n:
    * with a FIXED k the within-cluster pair work is n²/2k (quadratic —
    * measured 69.7 s at 200k vectors with k=16), with k ∝ n it is
    * (SemClusterTarget/2)·n (linear). 1250 keeps the driver-gated corpora
    * (2k and 20k vectors) at exactly nlist=16, so auto-scaling changes
    * nothing below 20k vectors. The oracle SQL states the same rule.
    */
  private[graft] val SemMinNlist = 16
  private[graft] val SemClusterTarget = 1250
  private[graft] def semNlist(n: Long): Int =
    math.max(SemMinNlist, math.ceil(n.toDouble / SemClusterTarget).toInt)

  /** Cluster size above which [[semanticDedup]] routes a cluster through
    * the block-grid CELL KERNEL instead of the whole-cluster member-gather
    * kernel. The whole-cluster kernel's single-task ceiling is T²/2 pair
    * dots — at 20,000 that is ≤ 200M pairs ≈ low tens of seconds, an
    * acceptable largest task; above it the cell decomposition bounds
    * per-task memory at two sub-blocks AND spreads one hot cluster's pair
    * work over NB(NB+1)/2 tasks (measured on the round-14 blobs corpus,
    * 4 clusters of 38-61k members: cell route 45 s for the 1M-vector
    * corpus vs 162 s for the forced single-task-per-cluster kernel; the
    * former pair-ROW grid did not finish in 17 min on the same corpus).
    * The first kernel cut used 5000 — at the 20M corpus the real size
    * distribution (median 451, p90 6210, max 6955) put 93% of all pair
    * work ABOVE that threshold; thresholds must clear the corpus's
    * natural hot-cluster tail, not the mean. A spec seam (var) lets tests
    * force every cluster through the cell route and pin the two routes'
    * results identical.
    *
    * The 20,000 base is calibrated at [[SemGridRefDim]] = 64 dims; both
    * the single-task FLOP count (T²/2 · dim) and the gather bytes scale
    * with dim, so the EFFECTIVE threshold is work-based: T(dim) =
    * base · √(refDim/dim) keeps the largest whole-cluster task at the
    * same ~1.3e10-FMA budget at any embedding width (dim 768 → ~5,700;
    * dim 1536 → ~4,000). Gather memory per task then grows only as
    * √dim (T·dim floats).
    */
  private[graft] var SemGridMinCluster = 20000L
  private[graft] val SemGridRefDim = 64
  private[graft] def semGridMinCluster(dim: Int): Long =
    // Floor at 256 so an absurd dim can't route toy clusters through the
    // grid — but never above the base itself, which keeps the force-grid
    // spec seam (base = 0 → every cluster through the cell kernel) intact.
    math.max(math.min(SemGridMinCluster, 256L), (SemGridMinCluster *
      math.sqrt(SemGridRefDim.toDouble / math.max(1, dim))).toLong)

  /** Session memo of [[semanticDedup]]'s slim cached index reads (plus the
    * corpus embedding dim, read off the index centroids), keyed by
    * (session, corpus dir, nlist): re-invocations (bench pass-min, repeated
    * API calls) reuse ONE DataFrame — and therefore one InMemoryFileIndex
    * listing of the nlist cluster directories — instead of re-listing per
    * call (at 20M vectors / 16k dirs the double per-call listing was a
    * measured chunk of the 31×/decade residual).
    */
  private val semSlims = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Int)]()

  def semanticDedup(spark: SparkSession, dir: String, tau: Double = 0.45,
      nlist: Int = 0, nBlocks: Int = 4): DataFrame = {
    val nlistEff =
      if (nlist > 0) nlist
      else semNlist(corpusCount(spark, dir))
    // ONE cached read of the cluster-partitioned index serves every join
    // branch below (small a/b, big a/b) and every later invocation: the
    // un-cached formulation paid a FileScan over nlist partition dirs —
    // plus its InMemoryFileIndex listing — per join side per call.
    val (slim, dim) = semSlims.computeIfAbsent((spark, s"$dir#$nlistEff"), { _ =>
      val (idx, cents) = ivfIndexed(spark, dir, nlistEff)
      (tracked(idx.select(col("cluster"), col("vec_id"), col("embedding"), col("nrm"))),
        cents.headOption.map(_._2.length).getOrElse(SemGridRefDim))
    })
    val gridMin = semGridMinCluster(dim)
    // Cluster sizes are index metadata (nlist rows): derive once from the
    // cached frame, broadcast back on, and route each cluster by size.
    val sizes = slim.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
    val n = slim.join(broadcast(sizes), "cluster")
    // SMALL clusters (≤ the dim-scaled gridMin — with k ∝ n, essentially all
    // them): ONE shuffle gathers each cluster's members into an array and
    // the m²/2 within-cluster dots run inside the [[graft.functions
    // .SemanticPairStats]] kernel — a primitive loop over the cluster's
    // unpacked embeddings. The earlier self-join shape materialized every
    // candidate pair as a row carrying BOTH embeddings (~512 B copied per
    // pair — measured ~20× the cost of the dot itself at 2M vectors); the
    // kernel keeps the pair loop entirely task-local, so the operator's
    // cost is the Σ|c|²/2 float math it actually owes plus one corpus
    // shuffle. Per-task memory is one cluster's members, capped by the
    // routing threshold; rounding parity with the grid route (and the
    // DuckDB oracle) is spec-pinned by the forced-grid equivalence test.
    val small = n.filter(col("csize") <= gridMin)
    val smallStats = small
      .select(col("cluster"),
        struct(col("vec_id"), col("embedding"), col("nrm")).as("mrow"))
      .groupBy(col("cluster"))
      .agg(collect_list(col("mrow")).as("ms"))
      // explode_OUTER: plain explode lets InferFiltersFromGenerate slip a
      // `size(kernel(ms)) > 0` filter under the Generate, re-running the
      // whole kernel a second time per cluster; outer generates a null row
      // for duplicate-free clusters instead, filtered right after.
      .select(col("cluster"),
        explode_outer(Vec.semanticPairStats(col("ms"), tau)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("s.id_b").as("vec_id"), col("cluster"),
        col("s.n_earlier").as("n_earlier"), col("s.max_cos").as("max_cos"))
    // BIG clusters: the CELL KERNEL — the block-grid decomposition (sub-
    // blocks by pmod(vec_id, NB); every unordered sub-block pair of a
    // cluster meets in exactly one (gi ≤ gj) cell) stays in the plan, and
    // each cell's cross-block pair dots run inside [[graft.functions
    // .SemanticCellStats]] over two gathered member arrays. The former
    // pair-ROW grid join paid the ~20× row-machinery tax (plus a Round
    // per pair) on every cross pair — measured >17 min on a real
    // 61k-member blob cluster whose pair math owes seconds; the kernel
    // runs the same cells at the FMA floor. Per-task memory is still two
    // sub-blocks of one cluster however hot the cluster is; each member
    // crosses the exchange once per covering cell side (NB+1 copies),
    // the same replication the pair-row grid paid per SIDE — but never
    // per PAIR. The explicit repartition by cell key is LOAD-BEARING:
    // the cell frame is only hot-clusters × NB(NB+1)/2 rows, and without
    // it AQE coalesces those few fat rows into one task (observed: a
    // single thread grinding all four blob cells).
    // Fan-out is WORK-BASED, per cluster: NB = max(nBlocks, ⌈csize /
    // T(dim)⌉), so a sub-block never holds more than ~T(dim) members and
    // every cell owes at most the same ~1.3e10-FMA budget the routing
    // threshold encodes — with the fixed NB=4 a 49k blob at dim 768
    // decomposed into only 10 cells of up to ~134 s each (measured, r15),
    // i.e. per-cell work GREW with cluster size while the threshold
    // shrank with dim. Member replication stays NB+1 copies per row —
    // linear in csize, the same trade the grid already accepts. When the
    // spec seam forces base = 0 (gridMin 0), fall back to the static
    // nBlocks: the forced route should exercise multi-member cells, not
    // csize singleton blocks.
    val fanBase = if (gridMin > 0) gridMin else Long.MaxValue
    val big = n.filter(col("csize") > gridMin)
      .withColumn("nb", greatest(lit(nBlocks),
        ceil(col("csize").cast("double") / lit(fanBase.toDouble)).cast("int")))
      .withColumn("blk", pmod(col("vec_id"), col("nb")))
    val blocks = big
      .groupBy(col("cluster"), col("blk"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"), col("nrm"))).as("ms"))
    val cells = blocks.select(col("cluster"), col("blk").as("gi"), col("ms").as("msa"))
      .join(blocks.select(col("cluster"), col("blk").as("gj"), col("ms").as("msb")),
        Seq("cluster"))
      .filter(col("gi") <= col("gj"))
      // 8× cores so the (few, fat) cell rows hash into mostly-solo
      // partitions — at 32 partitions for ~90 cells the collision tail
      // decides the wave count; empty extra tasks are ~ms each.
      .repartition(spark.sparkContext.defaultParallelism * 8,
        col("cluster"), col("gi"), col("gj"))
    val bigStats = cells
      .select(col("cluster"), explode_outer(Vec.semanticCellStats(
        col("msa"), col("msb"), col("gi") === col("gj"), tau)).as("s"))
      .filter(col("s").isNotNull)
      // Cells partition the pair set: per-vector partials sum exactly.
      .groupBy(col("s.id_b").as("vec_id"))
      .agg(max(col("cluster")).as("cluster"),
        sum(col("s.n_earlier")).as("n_earlier"),
        max(col("s.max_cos")).as("max_cos"))
      .select(col("vec_id"), col("cluster"), col("n_earlier"), col("max_cos"))
    // Every cluster takes exactly one route (and every vector lives in
    // exactly one cluster), so both sides are already final per-vector
    // stats and the union is disjoint — no re-aggregation needed.
    smallStats.unionAll(bigStats)
  }

  /** One Lloyd refinement iteration over the IVF assignment — the "train
    * the index" step ([[ivfIndexed]]'s centroids are seed rows; a real IVF
    * build iterates assignment → per-cluster mean until centroids settle).
    * Emits per cluster: assigned count, cosine between the seed centroid
    * and the refined mean (`shift_cos` — the convergence measure a build
    * loop would threshold on), and the first refined component.
    *
    * Scale: the per-dim mean is posexplode → groupBy (cluster, dim) with
    * map-side partials — the shuffle carries #partitions × nlist × dim agg
    * buffers, not data. The seed-centroid join side is nlist × dim rows,
    * broadcast. Iterating = re-running this agg with the refined centroids
    * as the new literals; each iteration is one scan + one tiny shuffle.
    */
  def kmeansRefine(spark: SparkSession, dir: String, nlist: Int = 16): DataFrame = {
    val (idx, cents) = ivfIndexed(spark, dir, nlist)
    import spark.implicits._
    val centDf = cents.toSeq.flatMap { case (cid, ce, cn) =>
      ce.zipWithIndex.map { case (x, d) => (cid, (d + 1).toLong, x.toDouble, cn) }
    }.toDF("cluster", "dim", "oldx", "oldn")
    idx
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("cluster"), (col("pos") + 1).cast("long").as("dim"),
        col("x").cast("double").as("x"))
      .groupBy(col("cluster"), col("dim"))
      .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
      .join(broadcast(centDf), Seq("cluster", "dim"))
      .groupBy(col("cluster"))
      .agg(max(col("n")).as("n_assigned"),
        round(sum(col("m") * col("oldx")) /
          (sqrt(sum(col("m") * col("m"))) * max(col("oldn"))), 4).as("shift_cos"),
        round(max(when(col("dim") === 1, col("m"))), 4).as("c1_new"))
  }

  /** SQ8 scalar quantization audit — Milvus's IVF_SQ8 compression: each
    * dimension affine-mapped to an 8-bit code by the corpus per-dim
    * min/max, here fit (one exact min/max agg — order-independent, so the
    * oracle refits identically) and applied in one pass, reporting per
    * vector the first code and the reconstruction error (mean/max absolute
    * over dims). The rounding is `floor(x + 0.5)` on both engines — no
    * round-half mode ambiguity.
    *
    * Scale: the fit is one posexplode + groupBy(dim) (dim-sized output,
    * collected like index metadata); the apply is a narrow map with the
    * 2×dim fit constants as array literals. At 100 TB: fit on a sample or
    * per partition, apply stays a scan-speed map — 4× corpus shrink for
    * ~0.4% of the value range in per-dim error (measured by this audit).
    * Assumes every dim has spread (min < max) — true of any real embedding
    * corpus; a constant dim would quantize to NaN and fail the gate.
    */
  def scalarQuantize(spark: SparkSession, dir: String): DataFrame = {
    // No orderBy before the collect: sorting dim rows range-partitions the
    // agg output, and RangePartitioning's boundary-sampling pass re-runs
    // the whole fit subtree as a second job (measured 0.4-0.7 s with vs
    // 0.33-0.39 s without at sf0.1 — ProbeSq8). The driver sorts the
    // dim-sized result instead; values are identical.
    val stats = embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .collect().sortBy(_.getInt(0))
    val mins = stats.map(_.getDouble(1))
    val spans = stats.map(r => r.getDouble(2) - r.getDouble(1))
    // Enforce the documented assumption instead of surfacing it as an
    // opaque NaN-code oracle mismatch downstream.
    require(spans.forall(_ > 0),
      s"constant embedding dimension(s) ${spans.zipWithIndex.collect { case (s, i) if s <= 0 => i }.mkString(",")} cannot be SQ8-quantized (min == max)")
    val mnL = typedlit(mins)
    val spL = typedlit(spans)
    def codeAt(i: Column): Column =
      floor((element_at(col("embedding"), i).cast("double") - element_at(mnL, i)) /
        element_at(spL, i) * lit(255.0) + lit(0.5))
    val errs = transform(sequence(lit(1), size(col("embedding"))), i =>
      abs(element_at(col("embedding"), i).cast("double") -
        (element_at(mnL, i) + codeAt(i) * element_at(spL, i) / lit(255.0))))
    embeddings(spark, dir)
      .select(col("vec_id"), errs.as("err"), codeAt(lit(1)).cast("long").as("code1"))
      .select(col("vec_id"), col("code1"),
        round(aggregate(col("err"), lit(0.0), (a, x) => a + x) /
          size(col("err")).cast("double"), 6).as("mae"),
        round(array_max(col("err")), 6).as("max_err"))
  }
}
