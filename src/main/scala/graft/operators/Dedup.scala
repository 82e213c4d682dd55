package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` — exact, n-gram Jaccard, MinHash-LSH,
  * SimHash. The exact-Jaccard token join is the small-SF oracle; MinHash-LSH
  * and SimHash are the 100 TB scale paths (candidate generation stays
  * ~linear via band/chunk bucketing instead of the quadratic gram join).
  *
  * Pipeline extension beyond the reference's own surface (SURVEY §2 24-28):
  * the reference dedups only replayed message positions (mirrored in
  * [[graft.cdc.Cdc.replayDedup]], reference: core/reader/collection_reader
  * .go:107-144 skip-state handling); content-level dedup is what a
  * training-data pipeline layers on top.
  */
object Dedup {
  import graft.Tables._
  import Text.{normText, toks}

  /** Frames cached by this suite (shingles, pair stats, cluster edges) —
    * see [[graft.CacheRegistry]] for the sharing/release contract.
    */
  private val caches = new graft.CacheRegistry
  private def tracked(df: DataFrame): DataFrame = caches.tracked(df)

  /** Build-scratch registration: frames cached ONLY to serve one
    * derived-state build (the banding chunk frame feeding the candidate
    * self-join). Once the verified pair frame they feed is materialized
    * they are dead weight — several GB of storage plus the upstream
    * shuffle files their lineage pins against the ContextCleaner — so
    * [[graft.DerivedState]] scopes a registry per build and releases it
    * the moment the build's write commits (at the 5M-doc corpus the
    * pinned banding state was the difference between the next operator's
    * verify join fitting in memory and the kernel OOM-killing the
    * session). Direct callers outside a build (plan audit, probes)
    * register into `buildCaches`, released with [[clearCaches]].
    */
  private val buildCaches = new graft.CacheRegistry
  private def buildTracked(df: DataFrame): DataFrame =
    graft.DerivedState.buildTracked(buildCaches)(df)

  /** Unpersist every frame this suite has cached. */
  def clearCaches(): Unit = { buildCaches.clear(); caches.clear() }

  /** Distinct HASHED token-3-gram shingles per doc: (doc_id, gh: long).
    * Grams are xxhash64'd to 64 bits inside the transform, so the explode,
    * the shuffle, and every downstream join/agg carry 8-byte longs instead
    * of ~20-byte strings — at 100 TB that halves-or-better every exchange
    * in this file. Set semantics are preserved up to 64-bit collisions
    * (P ≈ n²/2⁶⁵ per doc-pair gram set — negligible at any corpus size
    * whose pairs you could enumerate at all).
    */
  private def shingles(docs: DataFrame): DataFrame = {
    // Materialize the token array in its own projection FIRST: referencing
    // the split expression directly inside the transform lambda would
    // re-tokenize the document once per gram index (O(tokens²) per doc —
    // measured 5× slower at sf0.1). CollapseProject keeps its hands off
    // because the attribute is referenced more than once.
    val t = col("tk")
    val grams = when(size(t) < 3, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), size(t) - 2),
        i => xxhash64(concat_ws(" ",
          element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
    // cache(): all three near-dup operators (and the signature + verify
    // branches within one) hang off this same logical plan — Spark's
    // CacheManager dedups by plan equality, so one in-memory copy of the
    // (doc_id, gh) pairs serves every consumer instead of re-tokenizing
    // the corpus per query.
    tracked(graft.Tables.spread(docs)
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), explode(array_distinct(grams)).as("gh")))
  }

  /** Exact dedup: md5(normalized text) → canonical doc per group.
    * Scale: one shuffle on the 128-bit fingerprint; partial agg map-side.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), md5(normText(col("text")).cast("binary")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Minimum τ the exact pair path supports: the naive pair cache keeps
    * every gram-sharing pair's Jaccard, so any τ ≥ MinTau filter reads an
    * exact answer from one materialized frame.
    */
  private[graft] val MinTau = 0.1

  /** τ at/above which the PPJoin prefix filter pays for itself. The prefix
    * bound keeps n − ⌈τ·n⌉ + 1 of each doc's n grams: at τ=0.5 that halves
    * the join input and the position filter cuts candidates 73x below the
    * naive pair volume (measured, tools/ScalingReport) — but at τ=0.1 it
    * keeps ~90%, so the "filtered" join is nearly the naive join while
    * each side drags (gh, r, n) payload through a df join plus two windows,
    * and the position filter's 4-buffer groupBy runs over a near-quadratic
    * candidate set. Measured at the 10x corpus: the τ=0.1 prefix path took
    * 294.7 s and OOM'd the session where the lean naive join finishes
    * inside a 48 s full-suite run. Sub-knee output is near-quadratic no
    * matter the algorithm, so the cheapest formulation of the quadratic —
    * one slim (doc_id, gh) self-join feeding the overlap count directly —
    * is the right tool below the knee.
    */
  private[graft] val PrefixKnee = 0.5

  /** Exact token-3-gram Jaccard ≥ τ pairs (τ ≥ [[MinTau]]), routed by τ:
    * at/above [[PrefixKnee]] the PPJoin prefix filter prunes the candidate
    * join (rarest grams only — the quadratic bulk never enters); below the
    * knee, where the prefix bound cannot prune, the lean naive gram
    * self-join computes overlaps directly. Both are exact (the DuckDB
    * oracle is the naive full self-join); [[minhashLsh]] remains the
    * probabilistic-candidate scale path with the same verify.
    *
    * The DEFAULT is τ = [[PrefixKnee]]: sub-knee τ is an explicit opt-in,
    * not an operating point this operator can promise at scale — below the
    * knee the OUTPUT pair set itself is near-quadratic in corpus size (no
    * algorithm fixes that; the lean naive join is merely its cheapest
    * exact form), measured 358 s for τ=0.1 at 500k docs where the τ=0.5
    * prefix path stays in seconds. Callers who opt into τ < [[PrefixKnee]]
    * own that bound: keep the corpus under ~10⁵ docs (≲10⁷ gram rows), or
    * use [[minhashLsh]]-style candidate generation with a recall target
    * instead of an exact listing.
    */
  def ngramJaccard(spark: SparkSession, dir: String, tau: Double = PrefixKnee): DataFrame = {
    require(tau >= MinTau,
      s"the pair cache is built for tau >= $MinTau; tau=$tau would lose pairs")
    val pairs = if (tau >= PrefixKnee) prefixPairJaccard(spark, dir)
    else pairJaccard(spark, dir)
    pairs.filter(col("jaccard") >= tau)
  }

  /** Naive pair Jaccard over ALL gram-sharing doc pairs, cached — the
    * sub-knee operating point. One slim self-join on the 8-byte gram hash
    * whose groupBy IS the overlap count (no candidate stage, no windows,
    * no per-row payload beyond doc_id), then two count joins. Every
    * sub-knee consumer (the τ=0.1 oracle query, low-τ cluster edges,
    * threshold sweeps) filters the SAME materialized frame.
    */
  private def pairJaccard(spark: SparkSession, dir: String): DataFrame = {
    val g = shingles(documents(spark, dir))
    val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = g.as("a").join(g.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("s"))
    tracked(shared
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("s").cast("double") /
          (col("ca.n") + col("cb.n") - col("s")).cast("double"), 4).as("jaccard")))
  }

  /** Verified pair Jaccard over the [[PrefixKnee]]-prefix candidate pairs,
    * cached: every τ ≥ [[PrefixKnee]] consumer filters the SAME
    * materialized pair stats instead of re-running the candidate join.
    */
  private def prefixPairJaccard(spark: SparkSession, dir: String): DataFrame =
    durablePairs(spark, dir, s"prefix-tau$PrefixKnee")(prefixPairJaccardBuild(spark, dir))

  /** The uncached candidate+verify pipeline behind [[prefixPairJaccard]] —
    * exposed (like [[lshVerifiedPlan]]) so the plan audit pins the prefix
    * path even when the production frame answers from a durable dir.
    */
  private[graft] def prefixPairJaccardPlan(spark: SparkSession, dir: String): DataFrame = {
    val g = shingles(documents(spark, dir))
    verifiedJaccard(g, prefixCandidates(g, PrefixKnee))
  }

  /** PHASED build of the prefix pair frame: materialize the SLIM candidate
    * pairs with their own action ([[buildCaches]] scratch), then hand the
    * verify a cache scan. Fused into one query, the candidate generation's
    * shuffles (the pre-distinct prefix join is ~1B rows at 5M docs) and
    * the verify's set-attached exchanges are all live at once — the SUM of
    * the two phases' footprints, measured as a kernel OOM kill at the
    * 5M-doc corpus, where the staged phases fit with tens of GB to spare
    * (candidates 125 s + verify 11 s at 86M candidates). On a cluster the
    * same staging bounds peak shuffle-store footprint per executor.
    */
  private def prefixPairJaccardBuild(spark: SparkSession, dir: String): DataFrame = {
    val g = shingles(documents(spark, dir))
    val cand = buildTracked(prefixCandidates(g, PrefixKnee))
    cand.count(): Unit
    verifiedJaccard(g, cand)
  }

  /** PPJoin-style prefix filter (Chaudhuri et al., "A Primitive Operator
    * for Similarity Joins in Data Cleaning", ICDE 2006; Xiao et al.,
    * "Efficient Similarity Joins for Near Duplicate Detection", WWW 2008):
    * order each doc's grams rarest-first by global document frequency; a
    * pair with J ≥ τ has overlap s ≥ ⌈τ·max(n_a, n_b)⌉, so its
    * order-minimal shared gram must sit inside BOTH docs' first
    * n − ⌈τ·n⌉ + 1 grams — joining only those prefixes finds every true
    * pair. Plus the length filter min(n_a,n_b) ≥ τ·max(n_a,n_b).
    *
    * Why this kills the quadratic: bucket blowup in the naive join comes
    * from globally-frequent grams (df² pairs each); rarest-first ordering
    * pushes exactly those to the suffix. The prefix bound prunes them from
    * the join, and the POSITION filter prunes the candidates they still
    * produce: the first matched gram is provably the pair's order-minimal
    * shared gram (an earlier shared gram would rank earlier on both sides,
    * hence inside both prefixes, hence match first), so every shared gram
    * sits at rank ≥ i in a and ≥ j in b, bounding the overlap at
    * s ≤ min(n_a−i, n_b−j)+1 — a pair whose only shared grams are
    * frequent matches late and cannot reach the required
    * α = ⌈τ/(1+τ)·(n_a+n_b)⌉, which is exactly the quadratic bulk.
    *
    * Thresholds are compared in exact integer math at 10⁻⁶ granularity,
    * rounded DOWN and then slackened by HALF THE VERIFY STAGE'S ROUNDING
    * ULP (50/10⁶ = 0.00005): the verify filter compares round(J, 4) ≥ τ,
    * which admits pairs with true J ∈ [τ − 0.00005, τ), so candidates are
    * generated at τ′ = τ − 0.00005 to guarantee every pair that can pass
    * the rounded comparison survives pruning. Under-estimating τ may only
    * enlarge a prefix or relax a bound — never prune a true pair.
    *
    * Scale: df counting, the doc-frequency rank, and the prefix join are
    * all single hash shuffles on gh or doc_id — linear in gram instances;
    * candidates (not the corpus) pay the verify join.
    */
  private[graft] def prefixCandidates(g: DataFrame, tau: Double): DataFrame = {
    // ≤ τ − half of round(·,4)'s ulp: see the scaladoc — a borderline pair
    // whose true J rounds UP to τ must still generate a candidate.
    val tauScaled = math.floor(tau * 1e6).toLong - 50L
    val dfreq = g.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    // Rarest-first ordering as ONE per-doc agg + an O(grams/doc · log)
    // in-row array sort, then posexplode of JUST the prefix slice. The
    // window formulation this replaces (row_number + count over doc_id
    // partitions) paid a full partition sort of the whole gram frame and
    // emitted every gram row only to filter most of them — the agg+slice
    // shape shuffles the same rows once but sorts per-row arrays and
    // never materializes suffix grams (measured ~22 s → ~13 s for the
    // candidate stage at 500k docs / 26M grams).
    val arr = g.join(dfreq, "gh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("gh")))).as("a"))
      .select(col("doc_id"), size(col("a")).cast("long").as("n"), col("a"))
    // prefix length = n − s_min + 1, s_min = ⌈τ'·n⌉ in integer math.
    val prefix = arr
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("a"), lit(1),
          greatest(lit(0L), col("n") - expr(s"($tauScaled * n + 999999) DIV 1000000") + 1)
            .cast("int"))))
      .select(col("doc_id"), col("col.gh").as("gh"), (col("pos") + 1).cast("long").as("r"),
        col("n"))
    // Position filter applied PER JOIN ROW, before any aggregation: the
    // pair's min-ranks (i, j) both come from the order-minimal shared
    // gram — ONE row of this join (rank order is the one global order on
    // both sides) — and ub = min(na−r_a, nb−r_b)+1 is decreasing in the
    // ranks, so a pair passes the aggregate position filter iff its
    // minimal row passes the row filter (other rows only ever have
    // smaller ub and are pruned harder). Keep iff ub·(1+τ') ≥ τ'·(na+nb)
    // — integer math, no ceil needed on a direct product comparison.
    // This replaces the former groupBy-then-filter, which aggregated the
    // FULL shared-prefix pair set before pruning (measured at 500k docs:
    // 104M join rows → 86M grouped pairs → 8.6M survivors; the 86M-pair
    // aggregation was the stage's cost, not the join itself).
    prefix.as("a").join(prefix.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(1000000L) >= lit(tauScaled) * col("b.n") &&
          col("b.n") * lit(1000000L) >= lit(tauScaled) * col("a.n"))
      .filter((least(col("a.n") - col("a.r"), col("b.n") - col("b.r")) + 1) *
        lit(1000000L + tauScaled) >= lit(tauScaled) * (col("a.n") + col("b.n")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Per-doc gram SETS (doc_id, ghs: array<long>, n), cached — the verify
    * stage's join side. One corpus-sized groupBy re-packs the exploded
    * shingle frame into 1 row/doc; candidates then fetch both docs' sets
    * with two slim hash joins instead of double-joining the exploded gram
    * frame (which materialized a |cand| × grams/doc intermediate —
    * ~276M rows at 500k docs — and re-shuffled it on (doc, gh)).
    */
  private def gramSets(g: DataFrame): DataFrame =
    tracked(g.groupBy(col("doc_id"))
      .agg(collect_list(col("gh")).as("ghs"), count(lit(1)).as("n")))

  /** Exact Jaccard for a candidate pair set over the (cached) per-doc gram
    * sets — the shared verify stage of both the prefix-filtered exact path
    * and the banded-LSH path. Overlap = |array_intersect| per pair (gram
    * sets are distinct by construction): the verify cost is two hash joins
    * of the candidate list against the 1-row/doc set frame plus a narrow
    * per-pair set intersection — linear in candidates, never in grams ×
    * candidates (the previous exploded-join verify measured 58 s at 500k
    * docs / 5.3M candidates; this shape runs it in seconds).
    */
  private def verifiedJaccard(g: DataFrame, cand: DataFrame): DataFrame = {
    // SHUFFLE_HASH on the set side, both joins: per shuffle partition the
    // build map is 1-row/doc — ~70 MB at 5M docs / 32 partitions — while
    // the probe side is the candidate frame dragging gram ARRAYS
    // (~450 B/doc attached to every pair). A sort-merge join SORTS that
    // wide probe side (~25 GB at 5M docs), doubling its on-disk footprint
    // with spill runs — measured as the kernel OOM-killing the 5M-doc
    // suite on tmpfs scratch; the hash join streams it through untouched.
    // Same property at cluster scale: the per-partition set map stays
    // executor-sized no matter the corpus (it shards with the shuffle),
    // so never sorting the pair-grain side is strictly less IO.
    val sets = gramSets(g).hint("shuffle_hash")
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ghs").as("ga"), col("n").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ghs").as("gb"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("s"),
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        round(col("s").cast("double") /
          (col("na") + col("nb") - col("s")).cast("double"), 4).as("jaccard"))
  }

  /** MinHash signature length / LSH banding: K = B*R. R=2 sets the
    * per-band collision probability j²; B over-bands the τ≈0.5 knee so
    * recall holds even for pairs sitting essentially AT the threshold:
    * P(miss | j) = (1-j²)^B. The B history is a scale lesson in itself —
    * B=16's 1% knee miss rate showed up as 191 missed pairs at the 10x
    * near-dup corpus (round 7); B=48 (P(miss|0.5)≈10⁻⁶) held at 10x but
    * missed exactly ONE pair (J=0.5152, P(miss)≈4·10⁻⁷) among the 472,580
    * true pairs of the 100x/500k-doc corpus (round 11) — per-pair miss
    * probability must be sized against the COUNT of near-knee pairs, which
    * grows linearly with the corpus. B=64 puts P(miss|0.5) at ~10⁻⁸
    * (expected misses ≈ 0.005 per million knee pairs); at 10⁹+ docs you'd
    * grow B again (or accept a stated recall SLO) — the knob and the math
    * stay the same. Cost is linear in B and candidates stay verify-bounded.
    * (MinHash: Broder, "On the resemblance and containment of documents",
    * 1997; banding analysis as in Mining of Massive Datasets ch. 3.)
    */
  private val R = 2
  private val B = 64
  private val K = R * B

  /** MinHash signatures: per doc, K min-hashes over its HASHED shingles —
    * one groupBy with K partial-aggregating mins (map-side combine; no row
    * blowup). Seeded family via xxhash64(seed, gh): hashing a fixed-width
    * long is a handful of mixes, vs K full string hashes per gram in the
    * naive formulation.
    */
  private[operators] def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFrom(shingles(docs))

  private[graft] def testShingles(docs: DataFrame): DataFrame = shingles(docs)

  private[graft] def testBandedCandidates(g: DataFrame): DataFrame = bandedCandidates(g)
  private[graft] def testVerifiedJaccard(g: DataFrame, cand: DataFrame): DataFrame =
    verifiedJaccard(g, cand)

  private[graft] def testSimhashFingerprints(spark: SparkSession, dir: String): DataFrame =
    simhashFingerprints(documents(spark, dir))
  private[graft] def testSignatures(g: DataFrame): DataFrame = minhashSignaturesFrom(g)

  private def minhashSignaturesFrom(g: DataFrame): DataFrame =
    g.groupBy(col("doc_id"))
      .agg(min(xxhash64(lit(0), col("gh"))).as("h0"),
        (1 until K).map(i => min(xxhash64(lit(i), col("gh"))).as(s"h$i")): _*)

  /** MinHash+LSH near-dup pairs: sigs → band keys → bucket self-join →
    * candidate pairs → exact-Jaccard verification ≥ τ.
    * Scale: candidates ≈ linear (bucket join on 64-bit band keys); only
    * candidate pairs pay the verification join — this is the operator you
    * run at 100 TB where [[ngramJaccard]] cannot.
    */
  /** Banded candidate pairs (pre-verify) from a shingle frame — the real
    * banding, also exposed to dev tooling (tools/ScalingReport) so its
    * measurements can never drift from what [[minhashLsh]] executes.
    */
  private[graft] def bandRows(g: DataFrame): DataFrame = {
    val sigs = minhashSignaturesFrom(g)
    val bandKey = (b: Int) =>
      xxhash64(lit(b) +: (0 until R).map(r => col(s"h${b * R + r}")): _*)
    sigs.select(col("doc_id"),
      explode(array((0 until B).map(b => struct(lit(b).as("band"), bandKey(b).as("bk"))): _*))
        .as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bk"))
  }
  private[graft] def testBands(g: DataFrame): DataFrame = bandRows(g)

  private[graft] def bandedCandidates(g: DataFrame): DataFrame = {
    val bands = bandRows(g)
    // Bucket-local pair generation instead of a band self-join: ONE
    // shuffle of the band rows into (band, bk) buckets, then pairs are
    // expanded over a CHUNK GRID — each bucket's sorted doc list is cut
    // into [[LshBucketChunk]]-doc slices (posexplode: total row volume =
    // s, no duplication), and every unordered chunk pair meets in exactly
    // one cell of a self-join on (band, bk, ci ≤ cj). A diagonal cell
    // expands its chunk's triangle, an off-diagonal cell the full cross
    // (chunk order = doc order ⇒ a < b either way), so the pair set is
    // identical to in-row expansion while per-row memory is bounded by
    // chunk² structs (~4 MB at 512) no matter how degenerate the dup
    // group — unrelated-doc collisions are ~2⁻¹²⁸ (128 hashed signature
    // bits), but TRUE dup groups collide in all B bands by construction,
    // and a 100k-identical-doc group would build a multi-billion-struct
    // array if pairs were expanded from the bucket row directly.
    //
    // tracked() on the chunk frame is THE load-bearing call: the self-join
    // must read ONE materialization of the signature agg + bucket agg +
    // chunk split. Without it each join side re-executes the whole
    // pipeline — exchange reuse is not dependable here (AQE broadcast
    // conversion builds the build side from scratch; measured
    // collect_list running 2× and the banding stage at 173 s vs ~25 s at
    // 500k docs in a pre-cache formulation that routed small buckets
    // around the join through a union). The cached frame is band-rows
    // sized (B rows per doc, arrays of ≤ chunk ids) — the same volume the
    // join would shuffle once anyway.
    // Ordinary buckets (≲ chunk docs) are one chunk: their only cell is
    // the diagonal triangle, expanded in-row exactly as the pre-grid code
    // did.
    val ds = sort_array(col("ds"))
    val chunks = buildTracked(bands
      .groupBy(col("band"), col("bk")).agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(col("band"), col("bk"), posexplode(transform(
        sequence(lit(0), ceil(size(ds) / lit(LshBucketChunk.toDouble)).cast("int") - 1),
        ci => slice(ds, ci * LshBucketChunk + 1, lit(LshBucketChunk)))).as(Seq("ci", "chunk"))))
    chunks.as("x").join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.ci") <= col("y.ci"))
      .select(when(col("x.ci") === col("y.ci"),
          // Diagonal cell: triangle within one chunk.
          flatten(transform(sequence(lit(1), size(col("x.chunk")) - 1), i =>
            transform(slice(col("x.chunk"), i + 1, size(col("x.chunk")) - i), b =>
              struct(element_at(col("x.chunk"), i).as("doc_a"), b.as("doc_b"))))))
        .otherwise(
          // Off-diagonal: full cross (chunk order = doc order, so a < b).
          flatten(transform(col("x.chunk"), a =>
            transform(col("y.chunk"), b =>
              struct(a.as("doc_a"), b.as("doc_b")))))).as("ps"))
      .select(explode(col("ps")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** Chunk size for the bucket pair grid: per-join-row expansion is
    * ≤ chunk² structs (~4 MB at 512). A spec seam (var) lets tests drive
    * multi-chunk buckets with tiny inputs.
    */
  private[graft] var LshBucketChunk = 512

  def minhashLsh(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame =
    lshVerified(spark, dir).filter(col("jaccard") >= tau)

  /** Verified exact Jaccard for every banded candidate pair
    * (pre-threshold), cached: the τ-filtered pair query and the cluster
    * edge set ([[clusterEdges]]) probe the SAME materialized frame — at
    * scale the candidate+verify pass runs once and every consumer (pair
    * listing, clustering, threshold sweeps at/above the banding knee)
    * filters it, exactly the contract [[pairJaccard]] gives the exact
    * path. Candidate pairs are ~linear in docs, so the cached frame is
    * tiny relative to the corpus.
    */
  /** Durable pair-frame lifecycle — see [[graft.DerivedState]] (the memo
    * key includes the resolved root, the first-build runs under a per-key
    * lock, and build scratch is registry-scoped per build). The test
    * seams forward to it so the existing spec surface keeps working.
    */
  private[graft] def dedupDirOverride: Option[String] =
    graft.DerivedState.rootOverride
  private[graft] def dedupDirOverride_=(v: Option[String]): Unit =
    graft.DerivedState.rootOverride = v
  private[graft] def resetDedupMemo(): Unit = graft.DerivedState.reset()

  /** Durable-or-session lifecycle shared by every verified-pair frame
    * ([[lshVerified]], [[prefixPairJaccard]], [[simhash]], the converged
    * cluster labels): without `SPARK_GRAFT_DEDUP_DIR` the frame is
    * session-materialized; with it, written once under `root/corpusKey#tag`
    * and re-read by later sessions without re-mining — cold ≈ warm. `tag`
    * must encode every constant the frame depends on (K, B, R — a banding
    * change invalidates the key).
    */
  private def durablePairs(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    tracked(graft.DerivedState.materialized(spark, dir, tag)(build))

  private def lshVerified(spark: SparkSession, dir: String): DataFrame =
    durablePairs(spark, dir, s"K$K-B$B")(lshVerifiedBuild(spark, dir))

  /** The uncached candidate+verify pipeline behind [[lshVerified]] —
    * exposed to the plan audit so the banding path stays pinned even when
    * the production frame answers from cache.
    */
  private[graft] def lshVerifiedPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    // Shingles feed both the signatures and the verification join — one
    // cached copy (see shingles()) serves both.
    val g = shingles(docs)
    verifiedJaccard(g, bandedCandidates(g))
  }

  /** PHASED build of the LSH pair frame — same candidate-then-verify
    * staging as [[prefixPairJaccardBuild]], same OOM rationale.
    */
  private def lshVerifiedBuild(spark: SparkSession, dir: String): DataFrame = {
    val g = shingles(documents(spark, dir))
    val cand = buildTracked(bandedCandidates(g))
    cand.count(): Unit
    verifiedJaccard(g, cand)
  }

  /** Near-dup CLUSTERS: connected components over the verified ≥ τ pair
    * graph, labels = min doc_id per component — the final stage of a dedup
    * pipeline (pairs → clusters → one canonical doc kept per cluster).
    *
    * Iterative min-label propagation: label(v) ← min(label(v), min of
    * neighbors' labels) until fixpoint, bounded by the component diameter
    * (near-dup clusters are shallow). Each pass is one join + one grouped
    * min on the PAIR graph — corpus-sized data never enters the loop; at
    * 10⁹+ edges the same loop takes the large-star/small-star refinement
    * (Kiveris et al., "Connected Components in MapReduce", SoCC 2014).
    * `localCheckpoint` cuts lineage growth per iteration.
    */
  /** Edge source for [[clusters]], routed by τ. At or above the banding
    * knee (τ ≥ 0.5) edges come from the banded-LSH candidate path —
    * candidates stay ~linear, and the verify step inside [[minhashLsh]]
    * re-checks exact Jaccard ≥ τ, so the edge set equals the exact τ-pair
    * set whenever banding recall is 1 (tools/CheckLshRecall measures
    * missed=0, extra=0 at sf0.001/0.01/0.1 AND the knee-heavy 500k-doc
    * corpus for τ=0.5; at B=64/R=2 a missed pair needs all 64 bands to
    * split a j ≥ 0.5 pair — P ≈ (1−j²)⁶⁴ ≈ 10⁻⁸, sized against the
    * knee-pair count, see the [[B]] scaladoc).
    * Below the knee banding recall collapses, so low-τ requests route to
    * the exact gram join instead (see the inline note). The recursive-CTE
    * oracle stays the exact transitive closure either way. PlanAuditSpec
    * pins the τ=0.5 edge plan to the minhash path; TextDedupSpec pins
    * low-τ recall.
    */
  private[graft] def clusterEdges(spark: SparkSession, dir: String,
      tau: Double): DataFrame =
    // The R=2 banding targets the τ≈0.5 knee; below it the candidate
    // probability collapses (P = 1-(1-j²)^B ≈ 0.2 at j=0.1, B=64) and banding
    // would silently drop true edges — but a sub-knee τ also means a
    // near-quadratic OUTPUT, where the exact gram join is the correct
    // tool, so route low-τ requests there instead of guessing.
    if (tau >= 0.5) minhashLsh(spark, dir, tau).select(col("doc_a"), col("doc_b"))
    else ngramJaccard(spark, dir, tau).select(col("doc_a"), col("doc_b"))

  /** Converged label frames are DURABLE derived state ([[durablePairs]]
    * lifecycle, tag = every constant the fixpoint depends on): the
    * propagation loop is a driver-sequenced chain of join+agg jobs that
    * no plan-equality cache can dedupe, so every downstream consumer —
    * the clusters query itself, [[Pipeline.cleanCorpus]]'s canonical
    * gate, and any later SESSION on a populated root — reads the same
    * materialized (doc_id, cluster_id) frame instead of re-running the
    * loop (at the 5M-doc corpus the cold loop re-mined 320M band rows:
    * 382 s that a populated root now skips entirely).
    */
  def clusters(spark: SparkSession, dir: String, tau: Double = 0.5,
      maxIter: Int = 20): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"))
    val labels = durablePairs(spark, dir, s"labels-tau$tau-it$maxIter-K$K-B$B")(
      propagateLabels(spark, dir, tau, maxIter))
    docs.join(labels.withColumnRenamed("cluster_id", "pair_cluster"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pair_cluster"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
  }

  /** Target edge rows per shuffle partition of the propagation loop —
    * each iteration is a join + grouped min over the EDGE frame, so the
    * loop's parallelism should track the edge count, not the session
    * default: every extra partition costs a task + exchange slot PER
    * ITERATION, and at toy edge counts (256 edges at sf0.1) the fixed
    * cost dominates (measured loop wall: 0.95-1.5 s at 32 partitions vs
    * 0.66-0.71 s at 1 — ProbeLabelLoop). ~250k edge rows is a few MB per
    * task; a 5M-doc near-dup corpus (~10M sym edges) still saturates a
    * 32-core session.
    */
  private[graft] val EdgesPerPartition = 250000L

  private def propagateLabels(spark: SparkSession, dir: String, tau: Double,
      maxIter: Int): DataFrame = {
    val pairs = clusterEdges(spark, dir, tau)
    // buildTracked: the symmetric edge frame only serves the propagation
    // loop below, which always runs inside the durable-labels build —
    // released the moment the label frame's write commits.
    val sym = buildTracked(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    // The count doubles as the eager materialization of the cached edge
    // frame (the first iteration would pay it anyway) and gives the loop
    // its volume signal.
    val edges = sym.count()
    // Volume-adaptive loop parallelism (set for the loop, restored after):
    // partitions = edges / [[EdgesPerPartition]], clamped to the session's
    // cores — the same scale-adaptive rule as the streaming state sizing.
    val cpus = spark.sparkContext.defaultParallelism
    val loopParts = math.max(1, math.min(
      math.ceil(edges.toDouble / EdgesPerPartition).toInt, cpus))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    try {
      // The loop runs ONLY over pair-involved vertices — isolated docs can
      // never change label and join back as singletons at the end. One Spark
      // job per iteration: the convergence count is the action that
      // materializes the (lazy) checkpoint of the next labelling.
      // Seeded init: label(v) = min(v, neighbors) — the identity init's
      // first propagation round fused into the vertex-set groupBy (same
      // shuffle the distinct would cost), so convergence starts one hop in.
      var labels = sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
        .select(col("src").as("doc_id"), col("cluster_id"))
        .localCheckpoint()
      var iter = 0
      var done = false
      while (!done && iter < maxIter) {
        val nbr = sym
          .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("dst_label")), "dst")
          .groupBy(col("src")).agg(min(col("dst_label")).as("nbr_min"))
        val next = labels.join(nbr, labels("doc_id") === nbr("src"), "left")
          .select(labels("doc_id"),
            least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id"),
            (col("cluster_id") > col("nbr_min")).as("lowered"))
          .localCheckpoint(eager = false)
        // count() (not isEmpty) — it visits every partition, so the lazy
        // checkpoint fully materializes and lineage stays one hop deep.
        done = next.filter(col("lowered")).count() == 0L
        labels = next.drop("lowered")
        iter += 1
      }
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** SimHash hash-family constants. The per-gram hash and the 62 bit
    * functions are EXPLICIT exact-integer formulas (multiplicative family
    * mod 2²⁵, like [[Text.winnowFingerprint]]'s Rabin-Karp) rather than
    * xxhash64, so the DuckDB oracle restates the whole fingerprint — and
    * therefore the whole pair set — verbatim: the correctness check is
    * deterministic, with no banding-recall assumption to go stale.
    * 62 bits (not 64) keeps every `1 << i` within signed-64 range in both
    * engines (DuckDB errors on BIGINT `1 << 63`). At 100 TB you'd widen the
    * family (two 62-bit words) before you'd change its shape.
    */
  private[graft] val SimhashBits = 62
  private[graft] val SimhashMod = 1L << 25
  private val SimhashHalf = 1L << 24
  private[graft] def simhashBitConst(i: Int): Long =
    ((2654435761L * (i + 1)) % SimhashMod) | 1L

  /** Per-doc DISTINCT token-3-gram hash ARRAYS for SimHash: per-token
    * 5-char+length polynomial hash (pad '#' so every position exists),
    * grams combine three token hashes — all mod 2²⁵ so products stay in
    * signed-64 in both engines. Kept as one array row per doc (no
    * explode): the fingerprint consumes the whole set in one compiled
    * pass, so gram INSTANCES never become rows.
    */
  private def simhashGramSets(docs: DataFrame): DataFrame = {
    val tokHash = (c: Column) => {
      val p = concat(c, lit("#####"))
      pmod(ascii(substring(p, 1, 1)) * lit(923521L) +
        ascii(substring(p, 2, 1)) * lit(29791L) +
        ascii(substring(p, 3, 1)) * lit(961L) +
        ascii(substring(p, 4, 1)) * lit(31L) +
        ascii(substring(p, 5, 1)) + length(c), lit(SimhashMod))
    }
    val th = col("th")
    val grams = when(size(th) < 3, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), size(th) - 2),
        i => pmod(element_at(th, i) * 4821 + element_at(th, i + 1) * 129 +
          element_at(th, i + 2), lit(SimhashMod))))
    // buildTracked(): a HARD materialization barrier below any downstream
    // filter. PushDownPredicate substitutes aliases unconditionally, and a
    // predicate pushed into these projections inlines `th` into every
    // element_at of the gram lambda — re-tokenizing the document once per
    // gram ELEMENT ACCESS, O(tokens²) in interpreted string ops (measured:
    // turned the 500k-doc fingerprint map from seconds into 400+ s).
    // The cache also plays the old exploded-gram cache's role with 1 row
    // per doc instead of 1 per gram instance. Build-scratch scoped: the
    // gram sets only feed the fingerprint map inside the durable simhash
    // build (direct tool/spec callers fall back to the suite registry).
    buildTracked(graft.Tables.spread(docs)
      .select(col("doc_id"), transform(toks(col("text")), tokHash).as("th"))
      .select(col("doc_id"), array_distinct(grams).as("gs")))
  }

  /** 62-bit SimHash per doc (Charikar, "Similarity estimation techniques
    * from rounding algorithms", STOC 2002): bit i of gram g is the top bit
    * of (g·C_i mod 2²⁵), fingerprint bit i set iff ones_i > n/2 (⟺ the ±1
    * vote sum is positive) — computed per doc in ONE compiled pass over
    * its gram set ([[graft.functions.SimhashFingerprint]]): the
    * fingerprint stage is a narrow map with no exchange (the former
    * explode + 63-buffer hash aggregation shuffled every gram instance;
    * at 500k docs that was 26M rows through a 63-column aggregate).
    * Docs with no grams (< 3 tokens) are excluded, matching the oracle's
    * gram-join semantics.
    */
  private[operators] def simhashFingerprints(docs: DataFrame): DataFrame =
    simhashGramSets(docs)
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), org.apache.spark.sql.GraftSql.column(
        graft.functions.SimhashFingerprint(
          org.apache.spark.sql.GraftSql.expression(col("gs")),
          SimhashBits, SimhashMod)).as("simhash"))

  /** Hamming ceiling of the DURABLE simhash pair frame: collision pairs
    * above it are random 16-bit-chunk coincidences, not near-dups — at the
    * 5M-doc corpus the uncapped frame materialized 1.49B rows / 9.3 GB
    * (hamming up to 45) of which only the ≤-cap sliver ever answers a
    * query (`maxHamming` defaults to 3; the pigeonhole guarantee itself
    * only covers ≤ 3 with 4 chunks). Queries above the cap fall back to
    * the direct pipeline — recall there is best-effort CHUNK-COLLISION
    * recall, same as any k > 3 query: with 4 chunks only hamming ≤ 3
    * pigeonhole-guarantees an equal chunk, so pairs differing in all four
    * chunks are missed at any k > 3 (durable or direct alike; see the
    * recall note on [[simhash]]).
    */
  private[graft] val SimhashDurableMaxHamming = 8

  /** SimHash near-dup pairs with Hamming distance ≤ k. Pigeonhole banding:
    * 4 chunks of ~16 bits — Hamming ≤ 3 ⇒ at least one chunk identical, so
    * a chunk-equality bucket join finds all pairs without the quadratic
    * cross-join. Scale: same linear-candidates posture as LSH; correctness
    * is exact (the oracle recomputes identical fingerprints, see
    * [[simhashBitConst]]). The ≤-[[SimhashDurableMaxHamming]] collision
    * pair frame (with each pair's Hamming distance) is DURABLE derived
    * state like the verified Jaccard pairs — a later session filters the
    * materialized frame instead of re-fingerprinting the corpus.
    */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    if (maxHamming <= SimhashDurableMaxHamming)
      durablePairs(spark, dir,
        s"simhash-b$SimhashBits-c4-h$SimhashDurableMaxHamming")(
        simhashPairsPlan(spark, dir)
          .filter(col("hamming") <= SimhashDurableMaxHamming))
        .filter(col("hamming") <= maxHamming)
    else simhashPairsPlan(spark, dir).filter(col("hamming") <= maxHamming)

  /** The uncached fingerprint → chunk-bucket pipeline behind [[simhash]] —
    * exposed (like [[lshVerifiedPlan]]) so the plan audit pins the
    * chunk-join shape even when production answers from the durable frame.
    */
  private[graft] def simhashPairsPlan(spark: SparkSession, dir: String): DataFrame = {
    // buildTracked(): materialization barrier — the fingerprint map feeds
    // the 4-chunk explode AND both sides of the bucket self-join; without
    // the barrier CollapseProject inlines the whole tokenize→gram→
    // fingerprint chain into the Generate and the join inputs, re-running
    // it per emitted chunk row per side. (The former aggregate formulation
    // was an implicit barrier; the narrow-map fingerprint needs an
    // explicit one — same lesson as Text.contamination's barrier.)
    // Registered as build scratch: it only serves this pipeline, and the
    // pipeline runs inside the durable-frame build.
    val fps = buildTracked(simhashFingerprints(documents(spark, dir)))
    val chunks = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ck"))): _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.chunk"), col("e.ck"))
    // A pair colliding on SEVERAL chunks must still emit exactly once —
    // but never through a pair-grain distinct(): at 5M docs the candidate
    // set is ~1.5B rows and the distinct's exchange dominated the build
    // (519 s measured). Instead each pair is owned by its FIRST matching
    // chunk (lowest zero 16-bit field of the XOR), a per-row filter the
    // candidates stream through without ever shuffling pair rows.
    val z = col("x.simhash").bitwiseXOR(col("y.simhash"))
    val firstMatchingChunk =
      when(z.bitwiseAND(lit(0xFFFFL)) === 0, lit(0))
        .when(shiftrightunsigned(z, 16).bitwiseAND(lit(0xFFFFL)) === 0, lit(1))
        .when(shiftrightunsigned(z, 32).bitwiseAND(lit(0xFFFFL)) === 0, lit(2))
        .otherwise(lit(3))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(col("x.chunk") === firstMatchingChunk)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
  }
}
