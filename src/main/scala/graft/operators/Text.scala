package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis suite over the `documents` corpus — the LLM-pipeline
  * operators (token counting, quality scoring, language ID, fingerprinting)
  * a training-data pipeline runs before dedup/filtering.
  *
  * Everything is a per-row Column expression → narrow map, no shuffle,
  * whole-stage codegen. At 100 TB these run at parquet-scan speed; the only
  * knob is `spark.sql.files.maxPartitionBytes` for task sizing.
  *
  * All regex/tokenization is kept to constructs with identical semantics in
  * DuckDB (the oracle): `\s+` splits, ASCII character classes, md5 hex.
  */
object Text {
  import graft.Tables._

  /** Whitespace tokens of the lower-cased, trimmed text. */
  private[graft] def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** English-ish stopword set shared with the quality score and langid —
    * built from the single definition site in [[graft.functions.TextGates]]
    * so the Column formulation and the kernel can never drift.
    */
  private val StopEn: Seq[String] = graft.functions.TextGates.StopEn.toIndexedSeq
  private val StopDe: Seq[String] = graft.functions.TextGates.StopDe.toIndexedSeq
  private val StopEs: Seq[String] = graft.functions.TextGates.StopEs.toIndexedSeq
  private val StopFr: Seq[String] = graft.functions.TextGates.StopFr.toIndexedSeq
  private val StopZh: Seq[String] = graft.functions.TextGates.StopZh.toIndexedSeq

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (`[a-z0-9]+` runs and single non-space symbols), per doc.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("n_chars_m"))

  /** Composite quality score of `text` — THE score definition, shared by
    * [[quality]] and [[graft.operators.Pipeline.cleanCorpus]]'s single-scan
    * gate projection (so the pipeline never re-states the formula).
    */
  private[graft] def scoreCol(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val uniq = size(array_distinct(t)).cast("double") / nTok
    val stop = countIn(t, StopEn).cast("double") / nTok
    val punct = (length(text) -
      length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
      length(text).cast("double")
    round(lit(0.4) * uniq + lit(0.4) * (lit(1.0) - stop) +
      lit(0.2) * (lit(1.0) - punct), 4)
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, token
    * uniqueness, and a composite score — the standard pre-training filters.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val uniq = size(array_distinct(t)).cast("double") / nTok
    val stop = countIn(t, StopEn).cast("double") / nTok
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("double") /
      length(col("text")).cast("double")
    documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        size(t).cast("long").as("n_tokens"),
        round(uniq, 4).as("uniq_ratio"),
        round(stop, 4).as("stop_ratio"),
        round(punct, 4).as("punct_ratio"),
        scoreCol(col("text")).as("score"))
  }

  /** Language guess of `text` — THE langid definition (stopword-profile
    * argmax, deterministic tie-break en > de > es > fr > zh, 'und' when all
    * profiles are zero), shared by [[langid]] and
    * [[graft.operators.Pipeline.cleanCorpus]]'s single-scan gate projection.
    */
  private[graft] def guessCol(text: Column): Column = {
    val t = toks(text)
    val sEn = countIn(t, StopEn)
    val sDe = countIn(t, StopDe)
    val sEs = countIn(t, StopEs)
    val sFr = countIn(t, StopFr)
    val sZh = countIn(t, StopZh)
    val mx = greatest(sEn, sDe, sEs, sFr, sZh)
    when(mx === 0, lit("und"))
      .when(sEn === mx, lit("en"))
      .when(sDe === mx, lit("de"))
      .when(sEs === mx, lit("es"))
      .when(sFr === mx, lit("fr"))
      .otherwise(lit("zh"))
  }

  /** The (doc_id, lang_guess, score, n_tokens) gate frame for
    * [[Pipeline.cleanCorpus]]: one [[graft.functions.TextGates]] kernel
    * pass per doc, cached — the cache is both the warm-reuse surface and
    * a materialization barrier against predicate pushdown re-running the
    * kernel per gate predicate.
    */
  private[graft] def gateFrame(spark: SparkSession, dir: String): DataFrame =
    tracked(documents(spark, dir)
      .select(col("doc_id"), org.apache.spark.sql.GraftSql.column(
        graft.functions.TextGates(
          org.apache.spark.sql.GraftSql.expression(col("text")))).as("g"))
      .select(col("doc_id"), col("g.guess").as("lang_guess"),
        col("g.score").as("score"), col("g.n_tokens").as("n_tokens")))

  /** Language ID: stopword-profile scoring per candidate language, argmax
    * with a deterministic tie-break (en > de > es > fr > zh), 'und' when all
    * profiles score zero. Compared against the labeled `lang` column.
    */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    val guess = guessCol(col("text"))
    documents(spark, dir)
      .select(
        col("doc_id"), col("lang").as("label_lang"), guess.as("guess"),
        (guess === col("lang")).as("is_match"),
        countIn(toks(col("text")), StopEn).cast("long").as("s_en"))
  }

  /** Normalized-content fingerprint: md5 over lower-cased, whitespace-
    * collapsed, trimmed text. The dedup key for [[Dedup.exact]].
    */
  private[operators] def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        md5(normText(col("text")).cast("binary")).as("fp"),
        length(normText(col("text"))).cast("long").as("n_norm_chars"))

  /** Frames cached by this suite (winnow fingerprint sets) — see
    * [[graft.CacheRegistry]] for the sharing/release contract
    * (graft.Bench calls [[clearCaches]]).
    */
  private val caches = new graft.CacheRegistry
  private def tracked(df: DataFrame): DataFrame = caches.tracked(df)
  /** Build-scratch registration — see [[Dedup]]'s buildTracked: inside a
    * [[graft.DerivedState]] build the frame is released when the build's
    * write commits; outside one it lands in this suite's registry.
    */
  private def buildTracked(df: DataFrame): DataFrame =
    graft.DerivedState.buildTracked(caches)(df)

  /** Unpersist every frame this suite has cached. */
  def clearCaches(): Unit = caches.clear()

  /** Rolling-hash (Rabin-Karp) char-k-gram fingerprints with WINNOWING
    * (Schleimer et al., "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD 2003): polynomial hash h(i) = Σ c_{i+j}·B^(k-1-j)
    * mod M over each k-char window, then keep the minimum hash of every
    * w-hash window — the selected minima are position-robust fingerprints
    * (any shared substring of length ≥ k+w-1 guarantees a shared
    * fingerprint), the standard contamination/overlap probe where
    * [[fingerprint]]'s whole-doc md5 only catches exact matches.
    *
    * All arithmetic is exact 64-bit integer math (fold-with-mod ≡
    * polynomial-mod by congruence; products bounded ≪ 2^63), so the DuckDB
    * oracle restates it verbatim. The fingerprint set is computed by the
    * native [[graft.functions.WinnowFingerprints]] expression — one compiled
    * O(1)/char pass per doc inside a narrow projection; no explode, no
    * shuffle at any scale. The checksum is an order-independent
    * fingerprint-set digest.
    */
  def winnowFingerprint(spark: SparkSession, dir: String, k: Int = 5,
      w: Int = 4): DataFrame =
    winnowFps(documents(spark, dir), k, w)
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fps"),
        expr("aggregate(fps, CAST(0 AS BIGINT), (a, x) -> a + x)").as("fp_checksum"))

  /** The (doc_id, n_grams, selected fingerprint set) frame — split out so
    * the spec can assert the winnowing guarantee on constructed docs.
    * n_grams = max(0, chars-k+1) restates the oracle's generate_series
    * length; docs shorter than k+w-1 fingerprint to the empty set (the
    * expression guards that internally — no bogus descending `sequence`).
    */
  private[graft] def winnowFps(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.GraftSql
    docs.select(col("doc_id"),
      greatest(length(col("text")) - lit(k - 1), lit(0)).cast("long").as("n_grams"),
      GraftSql.column(graft.functions.WinnowFingerprints(
        GraftSql.expression(col("text")), k, w)).as("fps"))
  }

  /** Cross-document contamination pairs — the train/test decontamination
    * primitive: two documents sharing ≥ minShared winnowed fingerprints.
    * By the winnowing guarantee any shared substring of length ≥ k+w−1
    * yields a shared fingerprint, so contamination cannot hide from the
    * fingerprint equi-join; overlap = shared / min(n_fps) scores it.
    *
    * Defaults differ from [[winnowFingerprint]]'s (k=5, w=4) on purpose:
    * contamination needs SPECIFIC fingerprints. Measured on the sf0.1
    * corpus: 5-char grams collapse to ~1,083 distinct fingerprint values
    * across 5,000 docs (short docs + shared vocabulary + winnowing's
    * low-hash bias) — zero discriminating power; k=12/w=8 (19-char shared
    * substrings guaranteed caught) yields ~37k distinct values with
    * median df in single digits.
    *
    * The document-frequency cap is LOAD-BEARING at scale: corpus-common
    * substrings (boilerplate sentences) put the same fingerprint in many
    * docs — without the cap those buckets alone make the join quadratic
    * (measured: 253M candidate pairs at sf0.1 uncapped vs 0.8M capped).
    * Dropping fingerprints with df > maxDf is the standard MOSS-style
    * boilerplate guard; overlap denominators count POST-filter
    * fingerprints so exact copies still score 1.0.
    *
    * Scale: one shuffle on the fingerprint (df filter and pair join
    * co-partitioned), partial-agg everywhere; per-bucket pairs bounded by
    * maxDf².
    */
  def contamination(spark: SparkSession, dir: String, k: Int = 12, w: Int = 8,
      minShared: Int = 3, maxDf: Int = 20): DataFrame =
    // The aggregated fingerprint-sharing pair frame (pre-minShared, with
    // both denominators) is DURABLE derived state — same lifecycle as the
    // dedup pair frames: a later session (or a different minShared
    // threshold) filters the materialized frame instead of
    // re-fingerprinting and re-joining the corpus.
    tracked(graft.DerivedState.materialized(spark, dir, s"contam-k$k-w$w-df$maxDf")(
      contaminationPairsPlan(spark, dir, k, w, maxDf)))
      .filter(col("shared_fps") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("shared_fps"),
        round(col("shared_fps").cast("double") /
          least(col("fps_a"), col("fps_b")).cast("double"), 4).as("overlap"))

  /** The uncached winnow → df-cap → pair-join pipeline behind
    * [[contamination]] — exposed so the plan audit pins the shape even
    * when production answers from the durable frame.
    */
  private[graft] def contaminationPairsPlan(spark: SparkSession, dir: String,
      k: Int, w: Int, maxDf: Int): DataFrame = {
    // The wf cache is a MATERIALIZATION BARRIER, not just reuse: the
    // downstream explode makes InferFiltersFromGenerate add a
    // `size(fps) > 0` predicate, and pushdown substitutes the alias and
    // sinks `size(winnowfingerprints(text)) > 0` beneath the exchange into
    // the scan filter — the expression then evaluates 2-3× per doc per
    // branch (observed in the physical plan). Caching the one-row-per-doc
    // fingerprint frame pins exactly ONE evaluation; inferred filters land
    // on the cached `fps` attribute instead. Build-scratch scoped: both
    // frames only feed this pipeline, which normally runs inside the
    // durable-frame build and is released when its write commits.
    val wf = buildTracked(winnowFps(graft.Tables.spread(documents(spark, dir)), k, w))
    val f = wf.select(col("doc_id"), explode(col("fps")).as("fp"))
    // fps are per-doc distinct, so count(*) per fp IS document frequency.
    val rare = f.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fp"))
    // The POST-filter per-doc fingerprint count (the overlap denominator)
    // rides along as a window count, so the pair join needs no separate
    // denominator aggregation + re-joins — min() recovers it per side (it
    // is constant within a doc). One cached frame serves both self-join
    // sides; per-doc fps are bounded (~chars/w), so the doc_id window
    // partition cannot skew.
    val kept = buildTracked(f.join(rare, "fp").withColumn("n_fps",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")))))
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"),
        min(col("a.n_fps")).as("fps_a"), min(col("b.n_fps")).as("fps_b"))
  }

  /** Corpus vocabulary stats: top-N word 3-grams by total frequency (NOT
    * per-doc distinct — frequency counts every occurrence). The standard
    * contamination / boilerplate probe a training-data pipeline runs over
    * the corpus.
    *
    * TWO-PHASE: natural-text gram cardinality is near-distinct, so map-side
    * partials barely compress and the single-phase formulation shuffled
    * every gram OCCURRENCE as a ~30-byte string key (~400M string rows at
    * 5M docs — the 32.3 s suite leader). Phase 1 counts on the gram's
    * xxhash64 code, emitted directly by the native
    * [[graft.functions.WordGramHashes]] walk (one compiled pass per doc,
    * no gram string ever built): the big exchange carries 8-byte longs
    * (the same key-shrinking trick the dedup suite rides end to end), and
    * the repeated-bucket count frame is DURABLE derived state — a later
    * session answers from the materialized frame instead of re-counting
    * the corpus. Phase 2 recovers the winning gram STRINGS
    * collision-proof: the top-(N+slack) hash buckets' minimum count is a
    * frequency floor; the (topN+slack+ties)-sized winner-hash set is
    * collected driver-side and fused into a second
    * [[graft.functions.WordGramHits]] walk that only materializes grams
    * whose hash is a winner, then recounts them EXACTLY by string, so a
    * 64-bit collision can inflate a bucket but never a reported
    * frequency. The slack guards the floor itself: excluding a true top-N
    * gram would need ≥ slack+1 independent collision-inflated buckets
    * above it (expected colliding pairs at 4e8 grams ≈ 0.004 corpus-wide
    * — the slack buys ~(10⁻¹¹)^slack). The top-N itself is
    * TakeOrderedAndProject (per-partition partial top-k), never a global
    * sort; deterministic tie-break on the gram.
    */
  def ngramFreq(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val n = 3
    // Both corpus passes run the native gram walk ([[graft.functions
    // .WordGramUtil]]): the former tokenize→transform(sequence)→concat_ws
    // chain was interpreted per gram POSITION and tokenized the corpus
    // twice — the 5M-doc suite ceiling (13.7 s warm / 47.3 s cold).
    def textCol = GraftSql.expression(col("text"))
    def docs = graft.Tables.spread(documents(spark, dir))
    def exactSinglePhase = docs
      .select(explode(GraftSql.column(
        graft.functions.WordGrams(textCol, n))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("gram").asc)
      .limit(topN)
    // Phase 1: occurrence counts on the 8-byte gram hash — no gram string
    // ever materializes; the exchange carries longs. The freq-1 buckets
    // are DROPPED before materialization: near-distinct cardinality means
    // the overwhelming bulk of buckets count one occurrence and can never
    // beat a repeated gram; keeping only repeated buckets cuts the frame
    // ~10×. The frame is DURABLE derived state (tag = gram width only —
    // the counts don't depend on topN; floor/winner logic stays a cheap
    // filter over it), so a fresh session skips the corpus-scale count
    // entirely; the in-session tracked() serves the floor probe and the
    // winner collect as two actions over one read.
    val slack = 8
    val hcHeavy = tracked(graft.DerivedState.materialized(spark, dir, s"ngramhash-n$n")(
      docs.select(explode(GraftSql.column(
          graft.functions.WordGramHashes(textCol, n))).as("gh"))
        .groupBy(col("gh")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 2)))
    // The floor is the (topN+slack)-th repeated-bucket count — driver-side
    // top-k collect, index-metadata-sized like every probe/centroid
    // collect in this engine.
    val floorRows = hcHeavy.orderBy(col("freq").desc, col("gh").asc)
      .limit(topN + slack).select(col("freq")).collect()
    if (floorRows.length < topN + slack) {
      // Flat or tiny corpus: fewer than topN+slack repeated buckets means
      // freq-1 grams may reach the top-N, so the freq>=2 prefilter is not
      // a safe winner gate — fall back to the exact single-phase count
      // (such a corpus is small or degenerate-flat; the string exchange
      // is cheap there).
      return exactSinglePhase
    }
    val floor = floorRows.map(_.getLong(0)).min
    // Winners = EVERY bucket at/above the floor (buckets TIED at the floor
    // must all survive — the final tie-break is `gram asc`, and a
    // floor-tied gram cut by hash order could be the lexicographic
    // winner). Bucket counts only ever overcount a gram (collisions
    // merge), so the winner set is a superset of the true top-N whenever
    // fewer than slack+1 collision-inflated buckets sit above a true
    // winner. The set is (topN+slack+ties)-sized → collected driver-side
    // and fused into the phase-2 gram walk as a sorted binary-search
    // array, so only winner occurrences EXIST as strings — everything
    // else dies as a register-resident hash inside the kernel. The cap
    // guards the one degenerate shape (millions of buckets tied exactly
    // at the floor): past it, fall back to the exact single-phase count
    // rather than ship a multi-MB literal.
    val winnerCap = 1 << 20
    val winnerRows = hcHeavy.filter(col("freq") >= floor).select(col("gh"))
      .limit(winnerCap + 1).collect()
    if (winnerRows.length > winnerCap) return exactSinglePhase
    val winners = winnerRows.map(_.getLong(0)).toSeq
    // Phase 2: exact string recount of just the winner grams — a 64-bit
    // collision admits a stray gram into the recount but can never
    // inflate a reported frequency (counts are by string).
    docs
      .select(explode(GraftSql.column(
        graft.functions.WordGramHits(textCol, n, winners))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("gram").asc)
      .limit(topN)
  }

  /** Corpus-relative lexical rarity — the unigram-LM quality proxy
    * (CCNet-style pipelines score documents under a language model and
    * drop the tails; with no float log-probs available to restate exactly
    * across engines, the rarity statistic keeps the whole computation in
    * EXACT integer math): rarity(tok) = N DIV count(tok) over the corpus
    * unigram counts (≈ 1/p(tok), the unnormalized inverse frequency), per
    * doc the sum and mean over its token positions. High mean = rare
    * vocabulary (jargon/noise tail), low mean = common-token text — the
    * same ranking a unigram log-prob filter produces, with a
    * deterministic, SQL-restatable definition (one double division at the
    * very end, order-independent).
    *
    * Scale: the corpus is collapsed to DISTINCT (doc, tok) grain FIRST —
    * a narrow per-row map over the sorted token array (the run-length
    * trick [[repetition]] uses: run starts mark distinct tokens, start
    * deltas are their in-doc counts) — so every shuffle after the
    * tokenizer carries one row per distinct (doc, tok), not one per token
    * POSITION (~5-10× fewer rows on natural text; 2× even on the
    * synthetic high-entropy bench corpus). The first formulation shuffled
    * the exploded position frame twice on the raw token — a maximally
    * Zipf-skewed key ("the", "a") and the slowest text query at the
    * 500k-doc corpus (5.5 s). At the collapsed grain the vocab join is
    * AQE-broadcastable (see [[rarityScore]]) and the doc-grain re-agg's
    * partials collapse to one row per doc before the exchange. Unigram
    * counts and the 1-row corpus total are map-side-partial aggs of the
    * same per-doc count rows. Results are identical to the position-grain
    * formulation (Σ_positions N DIV cnt = Σ_tok c·(N DIV cnt)); the
    * oracle SQL is unchanged.
    */

  /** The distinct-(doc, tok, in-doc count) frame [[rarityScore]] runs on —
    * split out for stage-level probing/spec assertions.
    */
  private[graft] def testDocTok(spark: SparkSession, dir: String): DataFrame =
    rarityDocTok(spark, dir)

  private def rarityDocTok(spark: SparkSession, dir: String): DataFrame = {
    // Distinct tokens + in-doc counts from ONE compiled walk per doc
    // ([[graft.functions.TokenRuns]]) — the former formulation staged the
    // same collapse through three interpreted HOF lambdas (array_sort →
    // run-starts filter → transform(sequence)), the residual cold-path
    // leader at 5M docs. The cache is the materialization barrier (the
    // runs array is computed exactly once per doc; explode + aggregations
    // land on the CACHED column) and is CORPUS-SIZED — registered via
    // buildTracked so that when this runs inside the DerivedState
    // 'rarity-vocab' build it is released the moment the vocab write
    // commits (the fused route never reads it again); outside a build
    // (join-route fallback, testDocTok probes) it lands in this suite's
    // registry as before.
    val perDoc = graft.DerivedState.buildTracked(caches)(
      graft.Tables.spread(documents(spark, dir))
      .select(col("doc_id"), org.apache.spark.sql.GraftSql.column(
        graft.functions.TokenRuns(
          org.apache.spark.sql.GraftSql.expression(col("text")))).as("runs")))
    perDoc
      .select(col("doc_id"), explode(col("runs")).as("r"))
      .select(col("doc_id"), col("r.tok").as("tok"), col("r.c").as("c"))
  }

  /** Fused-route vocab ceiling: a Heaps'-law unigram vocab stays in the
    * 10⁵-10⁷ range even for very large corpora, so the common case rides
    * the kernel; a corpus whose realized vocab overflows the cap (noise/
    * typo-heavy web text at extreme scale) falls back to the join route,
    * which shuffles only distinct-(doc, tok) rows.
    */
  private[graft] val RarityVocabCap = 1 << 20

  def rarityScore(spark: SparkSession, dir: String): DataFrame =
    rarityScoreCapped(spark, dir, RarityVocabCap)

  /** The unigram vocab is DURABLE derived state (tag = tokenizer only —
    * the counts depend on nothing else): a fresh session reads the
    * materialized (tok, cnt) frame instead of re-aggregating the corpus.
    * When the realized vocab fits [[RarityVocabCap]] (the common case —
    * measured 92k tokens at the 5M-doc corpus), the scorer is ONE narrow
    * corpus scan: the vocab's N DIV cnt table is collected driver-side
    * and fused into a [[graft.functions.RarityStats]] walk — no
    * distinct-(doc, tok) explode, no join, no corpus-sized executor cache
    * at query time (the former join route cached 136M (doc, tok) rows at
    * 5M docs — GBs of executor memory that grow linearly with the
    * corpus). Past the cap, the join route: distinct-grain explode, the
    * vocab joined back (AQE broadcasts it under the threshold; above it
    * the hottest token carries at most one row per doc and AQE
    * skew-split bounds the task), one doc-grain re-agg.
    */
  private[graft] def rarityScoreCapped(spark: SparkSession, dir: String,
      vocabCap: Int): DataFrame = {
    val freq = tracked(graft.DerivedState.materialized(spark, dir, "rarity-vocab")(
      rarityDocTok(spark, dir).groupBy(col("tok")).agg(sum(col("c")).as("cnt"))))
    val vocabRows = freq.limit(vocabCap + 1).collect()
    if (vocabRows.length <= vocabCap) {
      // N = Σ cnt over the COMPLETE vocab (the limit returned everything).
      val n = vocabRows.iterator.map(_.getLong(1)).sum
      // Pre-divide per entry: rarity(tok) = N DIV cnt, exact long math.
      val vocab = new graft.functions.VocabTable(
        vocabRows.map(_.getString(0)),
        vocabRows.map(r => n / r.getLong(1)))
      graft.Tables.spread(documents(spark, dir))
        .select(col("doc_id"), org.apache.spark.sql.GraftSql.column(
          graft.functions.RarityStats(
            org.apache.spark.sql.GraftSql.expression(col("text")),
            vocab)).as("rs"))
        .select(col("doc_id"), col("rs.n_toks").as("n_toks"),
          col("rs.rarity_sum").as("rarity_sum"))
        .select(col("doc_id"), col("n_toks"), col("rarity_sum"),
          round(col("rarity_sum").cast("double") / col("n_toks").cast("double"), 4)
            .as("mean_rarity"))
    } else {
      val docTok = rarityDocTok(spark, dir)
      val total = freq.agg(sum(col("cnt")).as("n"))
      docTok.join(freq, "tok")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_toks"),
          sum(col("c") * expr("n DIV cnt")).as("rarity_sum"))
        .select(col("doc_id"), col("n_toks"), col("rarity_sum"),
          round(col("rarity_sum").cast("double") / col("n_toks").cast("double"), 4)
            .as("mean_rarity"))
    }
  }

  /** Per-doc repetition filters (Gopher-style; Rae et al. 2021 §A1.1):
    * fraction of token positions held by the most frequent token
    * (`top_word_frac`), fraction of 2-gram positions held by the most
    * frequent 2-gram (`top2_frac`), and the duplicate-3-gram fraction
    * (`dup3_frac` = 1 − distinct/total 3-gram positions) — the standard
    * "degenerate repetition" pre-training filters that [[quality]]'s
    * uniq/stop/punct ratios don't cover.
    *
    * All three statistics are run-length facts about the SORTED per-doc
    * gram arrays (most-frequent count = longest equal-run, distinct count
    * = number of run starts), so the whole operator is a narrow per-row
    * map: sort the token/2-gram/3-gram arrays (n log n in the bounded
    * per-doc token count) and fold runs — NO explode, NO shuffle, no
    * cross-doc state at any corpus size. The first formulation (explode →
    * doc-grain groupBy chain) measured 7.7 s at the 10x corpus vs well
    * under 1 s for this map: it shuffled ~6M (doc, kind, gram) rows to
    * compute what each row already knew. Docs with fewer than 2 (resp. 3)
    * tokens have no 2-gram (3-gram) positions; their fractions are 0.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = col("tk")
    def gramsOf(nn: Int): Column =
      when(size(t) < nn, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - (nn - 1)),
          i => concat_ws(" ", (0 until nn).map(j => element_at(t, i + j)): _*)))
    // Longest equal-run in a sorted array: fold (prev, run, best).
    def maxRun(sorted: Column): Column =
      aggregate(sorted,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    // Distinct values in a sorted array = number of run starts.
    def nDistinct(sorted: Column): Column =
      size(filter(sequence(lit(1), size(sorted)), i =>
        (i === 1) || element_at(sorted, i) =!= element_at(sorted, i - 1))).cast("long")
    val n = size(t).cast("double")
    graft.Tables.spread(documents(spark, dir))
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        array_sort(col("tk")).as("s1"),
        array_sort(gramsOf(2)).as("s2"),
        array_sort(gramsOf(3)).as("s3"))
      .select(col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        round(maxRun(col("s1")).cast("double") / n, 4).as("top_word_frac"),
        round(when(size(t) < 2, lit(0.0))
          .otherwise(maxRun(col("s2")).cast("double") / (n - 1.0)), 4).as("top2_frac"),
        round(when(size(t) < 3, lit(0.0))
          .otherwise((n - 2.0 - nDistinct(col("s3")).cast("double")) / (n - 2.0)), 4)
          .as("dup3_frac"))
  }
}
