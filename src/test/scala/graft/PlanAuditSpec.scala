package graft

import graft.cdc.Cdc
import graft.operators.{Relational, Similarity}

/** Plan-shape audit: the properties that decide cost at 100 TB — pushdown,
  * broadcast choice, shuffle counts, native expressions — asserted on the
  * physical plans, not just observed once in a REPL.
  */
class PlanAuditSpec extends SparkSpec {

  private def exchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan).length

  test("vector scoring runs on the native FloatDotProduct expression") {
    val plan = planOf(Similarity.knnBruteforce(spark, sfDir)).toLowerCase
    assert(plan.contains("floatdotproduct"), "hot path must use the codegen'd dot")
  }

  test("vec_filtered_knn pushes the scalar filter to the parquet scan") {
    val plan = planOf(Similarity.filteredKnn(spark, sfDir))
    assert(plan.contains("PushedFilters") && plan.contains("In(label"),
      "the Milvus-style scalar predicate must prune at the scan, before scoring")
  }

  test("knn scoring joins broadcast the query side") {
    val plan = planOf(Similarity.knnJoin(spark, sfDir))
    assert(plan.contains("Broadcast"), "query set must be broadcast, never shuffled")
  }

  test("cdc_state_snapshot: one shuffle, map-side partial aggregation") {
    val plan = planOf(Cdc.stateSnapshot(spark, sfDir))
    assert(exchanges(plan) == 1, s"PK fold must shuffle exactly once:\n$plan")
    assert(plan.contains("partial_"), "fold must partial-aggregate map-side")
  }

  test("cdc_latest_upsert: max_by agg, not a window sort over the stream") {
    val plan = planOf(Cdc.latestUpsert(spark, sfDir))
    assert(!plan.contains("Window"), "argmax must not window-sort the stream")
    assert(exchanges(plan) == 1)
    assert(plan.contains("partial_max_by") || plan.contains("partial_"))
  }

  test("cdc channel aggregates: single shuffle to 4-row results") {
    Seq(Cdc.msgCount(spark, sfDir), Cdc.tailLag(spark, sfDir),
      Cdc.replayDedup(spark, sfDir)).foreach { df =>
      assert(exchanges(planOf(df)) <= 2, "channel agg must stay one shuffle (+distinct)")
    }
  }

  test("q5_star_join: every dimension side is broadcast") {
    val plan = planOf(Relational.q5StarJoin(spark, sfDir))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj")
    assert(!plan.contains("SortMergeJoin"), "no dim join may shuffle the fact table")
  }

  test("q1_agg reads only the aggregated columns") {
    val plan = planOf(Relational.q1Agg(spark, sfDir))
    assert(plan.contains("PushedFilters"))
    assert(!plan.contains("l_comment") && !plan.contains("l_orderkey"),
      "scan must prune to the referenced columns")
  }

  test("q_sessionize: one user_id shuffle serves windows and both aggregations") {
    val plan = planOf(graft.operators.Relational.qSessionize(spark, sfDir))
    assert(exchanges(plan) <= 2,
      s"user_id partitioning must be reused across window + aggs:\n$plan")
  }

  test("q_point_get pushes the id set to the scan") {
    val plan = planOf(Similarity.pointGet(spark, sfDir))
    assert(plan.contains("PushedFilters") && plan.contains("In(vec_id"),
      s"point lookup must prune at the scan:\n$plan")
    assert(!plan.contains("Exchange"))
  }

  test("vec_ivf_search: build + probe + search is shuffle-free (narrow map + partial top-k)") {
    val plan = planOf(Similarity.ivfSearch(spark, sfDir))
    assert(exchanges(plan) == 0,
      s"IVF assignment must be a literal-centroid narrow map, not a join/window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("vec_ivf_join: probe table broadcast; corpus never cartesian'd or re-scanned per query") {
    val plan = planOf(Similarity.ivfJoin(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "the (q_id, cluster, qe, qn) probe table must broadcast-join the assigned corpus")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "no unkeyed join may touch the corpus")
    // The per-query ranking may shuffle candidates on q_id; the corpus-side
    // assignment itself must stay a narrow map (single scan of embeddings).
    assert("FileScan parquet".r.findAllIn(plan).length <= 1,
      s"corpus must be scanned once:\n${plan.take(1500)}")
  }

  test("dedup_ngram_jaccard at the knee: prefix-filtered candidates, not the naive join") {
    // Default-τ call: since round 11 the operator DEFAULT is the knee
    // (τ=0.5, prefix-filtered) — the sub-knee near-quadratic listing is
    // an explicit opt-in. This pin fails if the default regresses.
    // Audit the pipeline BEHIND the materialized pair frame (the
    // production query legitimately answers from the parquet-backed
    // frame — pinned below), same convention as the clusters-edge pin.
    val plan = planOf(graft.operators.Dedup.prefixPairJaccardPlan(spark, sfDir))
    // The candidate join's inputs are prefix SLICES of the per-doc
    // rarest-first gram arrays (round 11: the rank windows became one
    // agg + slice — suffix grams never materialize), and the integer-math
    // prefix bound must appear in the slice length.
    assert(plan.contains("slice") && plan.contains("posexplode"),
      s"prefix-slice generation missing from the plan:\n${plan.take(1500)}")
    assert(!plan.contains("row_number") && !plan.contains("Window"),
      "the prefix path must not pay rank windows over the gram frame")
    assert("(?is)999999.*div 1000000".r.findFirstIn(plan).isDefined,
      s"integer-math prefix bound missing from the plan:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // Production must answer from the materialized pair frame, not
    // re-mine. The read-side assertion alone is vacuous (a regressed plan
    // that re-mines still scans the corpus parquet), so ALSO assert the
    // prod plan carries none of the mining operators: no gram hashing, no
    // prefix-slice explode, no set aggregation.
    val prod = planOf(graft.operators.Dedup.ngramJaccard(spark, sfDir))
    assert(prod.contains("InMemoryTableScan") || prod.contains("FileScan parquet"),
      s"default-τ ngram must read the materialized pair frame:\n${prod.take(1500)}")
    assert(!prod.contains("xxhash64") && !prod.contains("posexplode") &&
      !prod.contains("collect_list"),
      s"default-τ ngram must not re-mine candidates:\n${prod.take(2000)}")
  }

  test("dedup_ngram_jaccard sub-knee: lean naive join — no rank windows, no df payload") {
    // Below the prune-effective knee the prefix machinery costs more than
    // it saves (10x corpus: 294.7 s + session OOM vs in-suite for the lean
    // join) — the opt-in sub-knee plan must be the slim (doc_id, gh)
    // self-join: no window over the gram frame, no doc-frequency join
    // feeding ranks. (Sub-knee τ is an explicit opt-in since round 11;
    // the operator DEFAULT is the knee, pinned by the previous test.)
    val plan = planOf(graft.operators.Dedup.ngramJaccard(spark, sfDir, tau = graft.operators.Dedup.MinTau))
    assert(!plan.contains("row_number"),
      s"sub-knee tau must not pay the prefix-rank windows:\n${plan.take(1500)}")
    assert(!plan.contains("Window"),
      "sub-knee pair stats must aggregate without any window operator")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("cdc_apply_changes: merge join reuses the folds' PK partitioning") {
    val plan = planOf(Cdc.applyChanges(spark, sfDir))
    assert(exchanges(plan) <= 3,
      s"snapshot+delta folds shuffle once each; the merge must not re-shuffle:\n$plan")
    assert(plan.contains("partial_"), "folds must partial-aggregate map-side")
  }

  test("vector stats aggregate in one shuffle with map-side partials") {
    Seq(Similarity.labelCentroids(spark, sfDir), Similarity.dimStats(spark, sfDir))
      .foreach { df =>
        val plan = planOf(df)
        assert(exchanges(plan) == 1, s"grouped stats must shuffle exactly once:\n$plan")
        assert(plan.contains("partial_"))
      }
  }

  test("text_ngram_freq top-N uses partial per-partition top-k, not a global sort") {
    val plan = planOf(graft.operators.Text.ngramFreq(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must be TakeOrderedAndProject:\n$plan")
    // Two-phase shape: the production (phase-2) plan must be ONE corpus
    // scan through the native winner-fused gram walk — only winner grams
    // exist as strings, the lone exchange carries the (tiny) winner-grain
    // partial counts — with no trace of the interpreted
    // tokenize→transform→concat_ws chain and no join at all.
    val lower = plan.toLowerCase
    assert(lower.contains("wordgramhits"),
      s"phase-2 must recount through the native winner-fused gram walk:\n${plan.take(1500)}")
    // Count HASH exchanges only: spread()'s RoundRobin repartition fires
    // on the tiny single-split spec corpus (a no-op at real sizes).
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"phase-2 must shuffle exactly once (winner-grain partial counts):\n${plan.take(1500)}")
    assert(!lower.contains("concat_ws"),
      s"no interpreted gram-assembly chain may survive in the plan:\n${plan.take(1500)}")
  }

  test("q_hll_merge builds sketches with partial (map-side) aggregation") {
    val plan = planOf(graft.operators.Sketch.hllMerge(spark, sfDir))
    assert(plan.contains("partial_hll_sketch_agg"),
      s"leaf sketches must be computed map-side before the merge:\n$plan")
  }

  test("vec_pairwise_dups: block-grid equi-join, no cartesian / nested loop / broadcast corpus") {
    val plan = planOf(Similarity.pairwiseDups(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs must run as a shuffled block-grid join, never a cartesian:\n$plan")
    assert(plan.contains("Join"), "the grid must still be a join")
  }

  test("dedup_clusters edges come from the minhash-LSH candidate path, not the gram self-join") {
    // Audit the pipeline BEHIND the tracked cache — the production edge
    // frame legitimately answers from the cached verified pairs, so the
    // banding shape is pinned on the uncached builder it materializes.
    val plan = planOf(graft.operators.Dedup.lshVerifiedPlan(spark, sfDir))
    // The LSH path is recognizable by the minhash signature aggregation
    // (partial min over seeded xxhash64) feeding the band join; the
    // quadratic gram self-join has no min aggregation anywhere.
    assert(plan.contains("partial_min") || plan.contains("min(xxhash64"),
      s"cluster edges must flow through minhash signatures + banding:\n$plan")
    // And the production τ=0.5 edge path must actually probe that cache.
    try {
      graft.operators.Dedup.minhashLsh(spark, sfDir).count()
      val warm = planOf(graft.operators.Dedup.clusterEdges(spark, sfDir, 0.5))
      assert(warm.contains("InMemoryTableScan"),
        s"cluster edges must reuse the cached verified pairs:\n${warm.take(2000)}")
    } finally graft.operators.Dedup.clearCaches()
  }

  test("cdc_position_log: saved positions join back broadcast; the stream is never shuffled for the replay count") {
    val plan = planOf(Cdc.positionLog(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"the tiny position frame must broadcast against the stream scan:\n$plan")
  }

  test("new control-plane folds partial-aggregate map-side") {
    Seq(Cdc.ddlApply(spark, sfDir), Cdc.taskState(spark, sfDir),
      Cdc.collectionWatermark(spark, sfDir), Cdc.opMessages(spark, sfDir))
      .foreach { df =>
        val plan = planOf(df)
        assert(plan.contains("partial_"),
          s"control-plane folds must combine map-side:\n$plan")
      }
  }

  test("cdc_task_metrics: counter fold partials map-side; state gauge joins broadcast") {
    val plan = planOf(Cdc.taskMetrics(spark, sfDir))
    assert(plan.contains("partial_"), "counters must combine map-side")
    assert(plan.contains("BroadcastHashJoin"),
      s"the task-count-sized state table must broadcast against the counters:\n$plan")
  }

  test("cdc_rbac_state: single pass over the stream — one scan, one aggregation shuffle") {
    val plan = planOf(Cdc.rbacState(spark, sfDir))
    // One events scan (the per-kind entity expansion is a map-side
    // explode, NOT five re-scans) and map-side partials on the fold.
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"the entity expansion must not rescan the stream per kind:\n$plan")
    assert(plan.contains("partial_"), "the grant-set fold must combine map-side")
    assert(plan.contains("Generate"), "entity contributions expand via explode")
  }

  test("cdc_name_mapping: rule tables broadcast; no stream-sized shuffle beyond the watermark fold") {
    val plan = planOf(Cdc.nameMapping(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"both rule joins must broadcast (rules are task metadata):\n$plan")
  }

  test("cdc_position_codec: pure projection over the save fold — no extra exchanges") {
    val codec = planOf(Cdc.positionCodec(spark, sfDir))
    val log = planOf(Cdc.positionLog(spark, sfDir))
    assert(exchanges(codec) <= exchanges(log),
      s"the codec must add zero shuffles over positionLog:\n$codec")
  }

  test("text_contamination: native winnow expression, cached kept frame, no cartesian") {
    try {
      // Audit the pipeline BEHIND the durable frame (production answers
      // from the materialized pair parquet — pinned below), same
      // convention as the dedup pair-path pins.
      val plan = planOf(graft.operators.Text.contaminationPairsPlan(spark, sfDir, 12, 8, 20))
      assert(plan.toLowerCase.contains("winnowfingerprints"),
        "the fingerprint stage must run the codegen'd rolling-hash expression")
      assert(!plan.contains("aggregate(sequence") && !plan.contains("slice("),
        "the interpreted per-position HOF formulation must never return (the r5 bench killer)")
      assert(plan.contains("InMemoryTableScan"),
        s"the self-join must read the cached kept frame, not recompute fingerprints:\n${plan.take(2000)}")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        "pair generation must stay an fp equi-join")
      // Production must answer from the materialized pair frame: no
      // fingerprinting, no pair join — a filter over a scan.
      val prod = planOf(graft.operators.Text.contamination(spark, sfDir))
      assert(!prod.toLowerCase.contains("winnowfingerprints") && !prod.contains("Window"),
        s"contamination must read the durable pair frame, not re-mine:\n${prod.take(2000)}")
    } finally graft.operators.Text.clearCaches() // a failed assert must not leak caches
  }

  test("spread(): estimate-gated — adds NO exchange once the scan is already well-split") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // Tiny corpus, default split size: the scan is one split, so spread
      // MUST repartition (the round-5 one-core O(n²) stage guard)...
      val small = planOf(Tables.spread(docs))
      assert(small.contains("Exchange") || small.contains("roundrobin"),
        s"an under-split scan must be spread to default parallelism:\n${small.take(1200)}")
      // ...but when the estimate says the scan already yields >= par
      // splits (every real-data caller — forced here by shrinking the
      // split size under the tiny file), spread must be the IDENTITY:
      // its scaladoc claims it never adds a shuffle at scale, and the
      // docs1000x narrow-map queries are scan-bound on exactly that
      // promise.
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val big = planOf(Tables.spread(docs))
      assert(!big.contains("Exchange"),
        s"spread() must be a no-op on a well-split scan, yet added an exchange:\n${big.take(1200)}")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("pipeline_clean_corpus: both gates in ONE corpus scan, predicates below the canonical join") {
    try {
      val plan = planOf(graft.operators.Pipeline.cleanCorpus(spark, sfDir))
      // One TEXT-reading corpus scan total: quality score AND language
      // guess evaluate in the same projection (the pre-round-13
      // three-frame shape paid a scan + tokenization pass PER gate plus
      // an extra doc_id shuffle join — at 100 TB a whole second pass over
      // the lake). clusters() contributes a doc_id-only column-pruned
      // scan for the canonical universe — cheap, and pinned so: no OTHER
      // scan may read the text column.
      val textScans = plan.linesIterator.count(l =>
        l.contains("documents.parquet") && l.contains("text:string"))
      assert(textScans == 1,
        s"gates must share one text-reading corpus scan, found $textScans:\n${plan.take(2000)}")
      // The gate predicates must run below the join with the canonical
      // set (filter-then-join), and the join must stay an equi-join.
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
      // Same pin against the larger local corpora when present (gitignored
      // dev artifacts): AQE decisions change with stats, and the one-scan
      // property must survive them. Plan-only, with the canonical set
      // stubbed (a doc_id-pruned scan, the real set's shape) — the real
      // clusters frame would execute a multi-minute label build at 10x
      // just to look at a plan.
      Seq("/root/repo/testdata-sf1", "/root/repo/testdata-docs100x")
        .filter(d => new java.io.File(s"$d/documents.parquet").exists())
        .foreach { d =>
          import org.apache.spark.sql.functions.col
          val canon = graft.Tables.documents(spark, d)
            .filter(col("doc_id") % 2 === 0).select(col("doc_id"))
          val p = planOf(graft.operators.Pipeline.cleanCorpusWithCanon(spark, d, canon))
          val scans = p.linesIterator.count(l =>
            l.contains("documents.parquet") && l.contains("text:string"))
          assert(scans == 1,
            s"$d: gates must share one text scan, found $scans:\n${p.take(2000)}")
        }
    } finally {
      graft.operators.Dedup.clearCaches()
      graft.operators.Text.clearCaches()
    }
  }

  test("cdc_channel_mapping: pure metadata — the event stream shuffles once for the distinct, never for the grid") {
    val plan = planOf(Cdc.channelMapping(spark, sfDir))
    assert(plan.contains("partial_"), "channel distinct must combine map-side")
    assert(plan.contains("Broadcast"),
      "the channel-count frame and grid must broadcast, never shuffle the stream")
    // The distinct subtree plans twice (count + join branches), each with
    // its shuffle, plus the 1-row global count — but the scenario grid
    // itself must never add a hash shuffle.
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashShuffles <= 2,
      s"only the channel distinct may hash-shuffle:\n${plan.take(1500)}")
  }

  test("cdc_seek_asof: backward as-of decomposes over (channel, bucket)") {
    val plan = planOf(Cdc.seekAsof(spark, sfDir))
    // The row-level window must be keyed by (channel, bucket) — a bare
    // channel partition would cap as-of parallelism at NumChannels forever.
    // (`, ts#` right after the bucket key distinguishes the per-row window
    // from the cross-bucket grid window, whose FIRST order key is bucket.)
    assert("windowspecdefinition\\(channel#\\d+L?, bucket#\\d+L?, ts#".r
      .findFirstIn(plan).isDefined,
      s"running struct-max must partition by (channel, bucket):\n${plan.take(2000)}")
    assert("windowspecdefinition\\(channel#\\d+L?, ts#".r.findFirstIn(plan).isEmpty,
      "no per-row window may partition by bare channel")
    assert(!plan.contains("CartesianProduct"),
      "probe grid must broadcast the channel frame, never cartesian the stream")
  }

  test("cdc_msgpack_batch: prefix sums decompose over (channel, bucket), partials map-side") {
    val plan = planOf(Cdc.msgpackBatch(spark, sfDir))
    assert(plan.contains("partial_"), "bucket stats must partial-aggregate map-side")
    // The row-level window must be keyed by (channel, bucket) — a bare
    // channel partition would cap parallelism at NumChannels forever.
    assert("windowspecdefinition\\(channel#\\d+L?, bucket#\\d+".r.findFirstIn(plan).isDefined,
      s"row-level prefixes must partition by (channel, bucket):\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("registerAll exposes every table + the vector functions to spark.sql") {
    graft.Tables.registerAll(spark, sfDir)
    val r = spark.sql(
      """SELECT count(*) AS n FROM events e
        |JOIN embeddings v ON e.user_id = v.vec_id
        |WHERE vec_l2norm(v.embedding) > 0""".stripMargin).collect().head
    assert(r.getAs[Long]("n") > 0)
    val top = spark.sql(
      """SELECT v.vec_id FROM embeddings v, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
        |WHERE v.vec_id <> 0
        |ORDER BY vec_cosine(v.embedding, q.qe) DESC, v.vec_id ASC LIMIT 5""".stripMargin)
      .collect().map(_.getLong(0))
    assert(top.length == 5)
  }

  test("hot-PK change stream: CDC folds absorb zipf skew map-side (state/diff/apply)") {
    // A real change stream has hot PKs; the uniform synthetic corpus never
    // exercises them. Same remap as scripts/make_sf1.py `skew` mode: 20%
    // of ALL events collapse onto one hot PK per channel (deterministic by
    // event_id, channel-preserving). The scale claim under audit: every
    // CDC fold partial-aggregates map-side, so a hot PK's rows combine to
    // one buffer per map task BEFORE the shuffle — the reduce side sees
    // #tasks rows, not the key's row count — and the diff/apply joins run
    // on FOLDED frames (<= 1 row per key per side), so PK skew can never
    // reach a join input. Correctness asserted against independently
    // computed hot-key truth.
    import org.apache.spark.sql.functions._
    // Tables.events normalizes either shipped ts encoding (nanos-long or
    // TIMESTAMP_MICROS) to a TimestampType column, so the rewritten temp
    // corpus is always micros and the truth math below is encoding-free.
    val raw = graft.Tables.events(spark, sfDir)
    val uHot = 1500L // >= max(user_id)+1 rounded to 12 at every SF here
    val skewed = raw.withColumn("user_id",
      when(pmod(col("event_id") * lit(2654435761L), lit(100)) < 20,
        lit(uHot) + pmod(col("user_id"), lit(4))).otherwise(col("user_id")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-skew-").toFile
    try {
      skewed.write.parquet(s"${tmp.getPath}/events.parquet")
      val dir = tmp.getPath
      val hotTruth = skewed.filter(col("user_id") >= uHot)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          max(when(col("event_type") =!= "error", unix_micros(col("ts")))).as("u"),
          max(when(col("event_type") === "error", unix_micros(col("ts")))).as("d"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1),
            if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
            if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))
        .toMap
      assert(hotTruth.nonEmpty && hotTruth.values.map(_._1).sum >=
        raw.count() / 10, "the remap must actually concentrate ~20% of events")
      // state fold: each alive hot PK folds to ONE row carrying its full
      // event count; the plan partial-aggregates map-side.
      val snap = Cdc.stateSnapshot(spark, dir)
      assert(planOf(snap).contains("partial_"),
        "PK fold must map-side combine — that is what absorbs hot keys")
      val hotRows = snap.filter(col("user_id") >= uHot).collect()
      hotRows.foreach { r =>
        val (n, u, d) = hotTruth(r.getAs[Long]("user_id"))
        assert(r.getAs[Long]("upserts") + r.getAs[Long]("deletes") == n)
        assert(u >= d, "returned hot PKs must be alive")
      }
      assert(hotRows.length == hotTruth.count { case (_, (_, u, d)) => u >= d })
      // diff + apply: joins run on folded (per-key) frames — hot PKs meet
      // the join as single rows; results stay exact.
      val diff = Cdc.replicaDiff(spark, dir)
      assert(planOf(diff).contains("partial_"))
      assert(diff.groupBy(col("user_id")).count().filter(col("count") > 1).isEmpty,
        "diff emits at most one row per PK, hot or not")
      val applied = Cdc.applyChanges(spark, dir).filter(col("user_id") >= uHot).collect()
      applied.foreach { r =>
        val (n, _, _) = hotTruth(r.getAs[Long]("user_id"))
        assert(r.getAs[Long]("upserts") + r.getAs[Long]("deletes") == n,
          "snapshot+delta merge must recover the hot PK's full fold")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(tmp)
    }
  }

  test("skewed PK fold + join survive with AQE skew handling enabled") {
    // A hot key 1000x the median is the shape that OOMs a fixed-partition
    // shuffle at 100 TB. With AQE (+skew-join, +coalescing) the fold and
    // the subsequent join must complete AND stay correct: AQE may split
    // the hot partition, it must not split the hot KEY's aggregation.
    import org.apache.spark.sql.functions._
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.get(k))
    prev.foreach { case (k, _) => spark.conf.set(k, "true") }
    try {
      // 200k rows: key 0 holds 190k of them, keys 1..10000 get one each.
      val skewed = spark.range(0, 200000).select(
        when(col("id") < 190000, 0L).otherwise(col("id") % 10000 + 1).as("pk"),
        col("id").as("ts"))
      val fold = skewed.groupBy(col("pk"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("head"))
      val dims = spark.range(0, 10001).select(col("id").as("pk"),
        concat(lit("u"), col("id").cast("string")).as("name"))
      val joined = fold.join(dims, "pk")
      val hot = joined.filter(col("pk") === 0).collect()
      assert(hot.length == 1 && hot.head.getAs[Long]("n") == 190000L,
        "the hot key must aggregate to ONE row with the full count")
      assert(joined.count() == fold.count(), "no dim row may be lost or duplicated")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("SQL surface: vec_dot/vec_l2norm/vec_cosine resolve and agree with the Scala API") {
    GraftFunctions.register(spark)
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_audit")
    val r = spark.sql(
      """SELECT round(vec_cosine(a.embedding, b.embedding), 4) AS c,
        |       round(vec_dot(a.embedding, b.embedding)
        |             / (vec_l2norm(a.embedding) * vec_l2norm(b.embedding)), 4) AS c2
        |FROM emb_audit a JOIN emb_audit b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == r.getDouble(1))
  }
}
