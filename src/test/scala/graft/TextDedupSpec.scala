package graft

import graft.operators.{Dedup, Text}

class TextDedupSpec extends SparkSpec {

  test("TextGates kernel matches the Column gate formulation row for row") {
    import org.apache.spark.sql.functions._
    try {
      // Corpus rows — the kernel must replay toks/scoreCol/guessCol
      // EXACTLY (same lower/trim/split chain, same double association,
      // same round, same tie-breaks).
      val cols = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          Text.guessCol(col("text")).as("lang_guess"),
          Text.scoreCol(col("text")).as("score"),
          size(Text.toks(col("text"))).cast("long").as("n_tokens"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3))).toMap
      val kern = Text.gateFrame(spark, sfDir)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3))).toMap
      assert(kern.keySet == cols.keySet)
      kern.foreach { case (id, got) =>
        assert(got == cols(id), s"doc $id: kernel $got vs column ${cols(id)}")
      }
      // Adversarial edge rows exercise tokenizer boundaries the corpus may
      // not: empty text, whitespace-only, punctuation-only, leading/
      // trailing/multiple whitespace, mixed-language stopwords, ties.
      import spark.implicits._
      // (Zero-length text is excluded: the Column chain's ANSI division
      // by length(text)=0 THROWS there, so no comparable baseline exists;
      // the kernel itself is total and yields NaN.)
      val edge = Seq(" ", "\t\n", "...", "the the the", " der die und ",
        "le la et de", "de de", "a.b,c;d:e!f?g", "x", "the und el le de wo",
        "The A And OF is", "  spaced   out  tokens  ").zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val ec = edge.select(col("doc_id"),
          Text.guessCol(col("text")).as("g"), Text.scoreCol(col("text")).as("s"),
          size(Text.toks(col("text"))).cast("long").as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
      val ek = edge.select(col("doc_id"), org.apache.spark.sql.GraftSql.column(
          graft.functions.TextGates(
            org.apache.spark.sql.GraftSql.expression(col("text")))).as("g"))
        .select(col("doc_id"), col("g.guess"), col("g.score"), col("g.n_tokens"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
      assert(ek == ec, s"edge rows diverge:\nkernel ${ek.toSeq.sortBy(_._1)}\ncolumn ${ec.toSeq.sortBy(_._1)}")
    } finally Text.clearCaches()
  }

  test("word-gram kernel ≡ the Column gram chain: hashes, strings, winner hits") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftSql
    try {
      // The declarative chain the native walk replaced — the parity
      // baseline it must replay byte-for-byte: same lower/trim/split
      // tokenizer, grams joined by ' ', xxhash64 on the gram string.
      val t = col("tk")
      val gramChain = when(size(t) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
      import spark.implicits._
      val edge = Seq("", " ", "\t\n", "a b", "a b c", "a a a a a",
        "  spaced   out  tokens here  ", "héllo wörld ünïcode grüße über",
        "The Quick BROWN fox; the quick brown fox.", "one",
        "汉字 分词 测试 汉字 分词").zipWithIndex.map { case (s, i) => (i + 100000L, s) }
        .toDF("doc_id", "text")
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).union(edge)
        .select(col("doc_id"), col("text"), Text.toks(col("text")).as("tk"))
        .select(col("doc_id"), col("text"), gramChain.as("grams"))
      val base = docs.select(col("doc_id"), col("grams"),
          transform(col("grams"), g => xxhash64(g)).as("hashes"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[Long](2))).toMap
      // Winner set for the hits kernel: every hash seen in an even-id doc
      // (arbitrary but corpus-derived, so real hits and misses both occur).
      val winners = base.collect { case (id, (_, hs)) if id % 2 == 0 => hs }
        .flatten.toSeq.distinct
      val kern = docs
        .select(col("doc_id"),
          GraftSql.column(graft.functions.WordGramHashes(
            GraftSql.expression(col("text")), 3)).as("kh"),
          GraftSql.column(graft.functions.WordGrams(
            GraftSql.expression(col("text")), 3)).as("kg"),
          GraftSql.column(graft.functions.WordGramHits(
            GraftSql.expression(col("text")), 3, winners)).as("hits"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[String](2), r.getSeq[String](3)))
      assert(kern.map(_._1).toSet == base.keySet)
      val winnerSet = winners.toSet
      kern.foreach { case (id, (kh, kg, hits)) =>
        val (grams, hashes) = base(id)
        assert(kg == grams, s"doc $id gram strings diverge: $kg vs $grams")
        assert(kh == hashes, s"doc $id gram hashes diverge")
        val expectHits = grams.zip(hashes).collect { case (g, h) if winnerSet(h) => g }
        assert(hits == expectHits, s"doc $id winner hits diverge: $hits vs $expectHits")
      }
      // TokenRuns: the (tok, c) MULTISET must equal the tokenizer's counts
      // (emission order is unspecified — the frame only feeds aggregations).
      val runBase = docs.select(col("doc_id"), Text.toks(col("text")).as("tk")).collect()
        .map(r => r.getLong(0) ->
          r.getSeq[String](1).groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
      docs.select(col("doc_id"), GraftSql.column(graft.functions.TokenRuns(
          GraftSql.expression(col("text")))).as("runs"))
        .select(col("doc_id"), col("runs"))
        .collect().foreach { r =>
          val got = r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => x.getString(0) -> x.getLong(1)).toMap
          assert(got == runBase(r.getLong(0)),
            s"doc ${r.getLong(0)} token runs diverge")
        }
    } finally Text.clearCaches()
  }

  test("text_ngram_freq equals the exact single-phase count on both routes") {
    import org.apache.spark.sql.functions._
    try {
      // Exact replay through the (parity-pinned) native gram walk.
      val exact = graft.Tables.documents(spark, sfDir)
        .select(explode(org.apache.spark.sql.GraftSql.column(
          graft.functions.WordGrams(
            org.apache.spark.sql.GraftSql.expression(col("text")), 3))).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("gram").asc)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // Default topN (may take either route depending on corpus density)
      // and topN=1 (the two-phase floor needs only 9 repeated buckets —
      // the likely two-phase route on the tiny spec corpus): both must
      // equal the exact count's prefix.
      assert(rows(Text.ngramFreq(spark, sfDir)) == rows(exact.limit(20)))
      assert(rows(Text.ngramFreq(spark, sfDir, topN = 1)) == rows(exact.limit(1)))
    } finally Text.clearCaches()
  }

  test("winnowing guarantee: a shared substring of length >= k+w-1 shares a fingerprint") {
    import spark.implicits._
    // Two docs sharing a 60-char middle chunk inside unrelated prefixes/
    // suffixes: winnowing (Schleimer 2003, thm 1) guarantees at least one
    // selected min-hash falls entirely inside any shared run of length
    // k+w-1 = 8, so the fingerprint sets must intersect. A third unrelated
    // doc should (with ~certainty on 25-bit hashes) share nothing.
    val shared = "the quick brown fox jumps over the lazy dog again and again."
    val docs = Seq(
      (1L, s"AAAA unrelated prefix one $shared tail alpha"),
      (2L, s"ZZZZ other beginning text $shared different ending"),
      (3L, "completely disjoint content with no overlap whatsoever here 12345"))
      .toDF("doc_id", "text")
    val fps = Text.winnowFps(docs, k = 5, w = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared chunk must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs should share no fingerprints")
    // Position robustness: the md5 whole-doc fingerprint sees docs 1 and 2
    // as unrelated; winnowing is exactly the probe that still links them.
  }

  test("winnowing short-input edge: docs shorter than k (or k+w-1) yield empty sets, not a crash") {
    import spark.implicits._
    // A doc shorter than k has no grams; one shorter than k+w-1 has grams
    // but no winnow window. Both must fingerprint to the empty set — the
    // oracle's generate_series(1, 0) = [] semantics.
    val docs = Seq((1L, "abc"), (2L, "abcdef"), (3L, "abcdefgh"))
      .toDF("doc_id", "text")
    val out = Text.winnowFps(docs, k = 5, w = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).size)).toMap
    assert(out(1L) === ((0L, 0)), "shorter than k: no grams, no fps")
    assert(out(2L) === ((2L, 0)), "k <= len < k+w-1: grams but no winnow window")
    assert(out(3L) === ((4L, 1)), "len = k+w-1: exactly one window, one fp")
  }

  test("native winnow expression ≡ the declarative HOF fold (incl. non-ASCII, repeats, boundaries)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // The compiled rolling-hash + deque kernel must produce exactly the
    // fingerprint SET of the interpreted formulation it replaced (which is
    // what the DuckDB oracle restates): same polynomial, same mod-2^25
    // residues, same window minima. Domains chosen to stress the rolling
    // subtraction (repeats, monotone runs), the deque (ties, alternating
    // minima), code-point iteration (multibyte UTF-8), and length edges.
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaa"),
      (2L, "abcdefghijklmnopqrstuvwxyz"),
      (3L, "zyxwvutsrqponmlkjihgfedcba"),
      (4L, "ababababababababab"),
      (5L, "the quick brown fox jumps over the lazy dog"),
      (6L, "héllo wörld — données réelles über alles, 你好世界"),
      (11L, "music 𝄞 clef and emoji 🎻🎻🎻 beyond the BMP — 𝄞𝄞 surrogate pairs"),
      (7L, "x" * 4 + "Y" + "x" * 4),
      (8L, "0123456789" * 5),
      (9L, "short"),
      (10L, "exactly8")).toDF("doc_id", "text")
    for ((k, w) <- Seq((5, 4), (12, 8), (2, 2))) {
      val hof = docs.select(col("doc_id"), expr(
        s"""CASE WHEN length(text) < $k THEN CAST(array() AS ARRAY<BIGINT>)
           |ELSE transform(sequence(1, length(text) - ${k - 1}),
           |  i -> aggregate(sequence(0, ${k - 1}), CAST(0 AS BIGINT),
           |         (acc, j) -> (acc * 31 + ascii(substr(text, i + j, 1))) % ${1L << 25}))
           |END""".stripMargin).as("gh"))
        .select(col("doc_id"), expr(
          s"""CASE WHEN size(gh) < $w THEN CAST(array() AS ARRAY<BIGINT>)
             |ELSE array_distinct(transform(sequence(1, size(gh) - ${w - 1}),
             |  i -> array_min(slice(gh, i, $w))))
             |END""".stripMargin).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val native = Text.winnowFps(docs, k, w).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
      hof.keys.foreach { id =>
        assert(native(id) == hof(id), s"doc $id diverges at k=$k w=$w")
      }
    }
  }

  test("text_token_count: ws_tokens <= re_tokens, all docs covered") {
    val rows = Text.tokenCount(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ws_tokens") > 0)
      assert(r.getAs[Long]("ws_tokens") <= r.getAs[Long]("re_tokens"))
    }
  }

  test("text_quality: ratios in [0,1], score in (0,1]") {
    Text.quality(spark, sfDir).collect().foreach { r =>
      Seq("uniq_ratio", "stop_ratio", "punct_ratio").foreach { c =>
        val v = r.getAs[Double](c); assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
      val s = r.getAs[Double]("score"); assert(s > 0.0 && s <= 1.0)
    }
  }

  test("text_langid: guess is a known code; scores deterministic") {
    val rows = Text.langid(spark, sfDir).collect()
    val langs = Set("en", "de", "es", "fr", "zh", "und")
    rows.foreach(r => assert(langs.contains(r.getAs[String]("guess"))))
  }

  test("text_fingerprint is deterministic and 32-hex") {
    val rows = Text.fingerprint(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[String]("fp").matches("[0-9a-f]{32}")))
  }

  test("text ops are narrow maps — no shuffle (Exchange) in the plan") {
    Seq(Text.tokenCount(spark, sfDir), Text.quality(spark, sfDir),
      Text.langid(spark, sfDir), Text.fingerprint(spark, sfDir)).foreach { df =>
      assert(!planOf(df).contains("Exchange"), "per-row text op must not shuffle")
    }
    // repetition spread()s tiny scans for parallelism (round-robin, a
    // no-op at real sizes) but must never shuffle BY KEY — the run-length
    // formulation has no per-key state.
    assert(!planOf(Text.repetition(spark, sfDir)).contains("hashpartitioning"),
      "repetition must stay a per-row map, no keyed shuffle")
  }

  test("dedup_exact: groups partition the corpus") {
    val docs = graft.Tables.documents(spark, sfDir).count()
    val groups = Dedup.exact(spark, sfDir).collect()
    assert(groups.map(_.getAs[Long]("dup_count")).sum == docs)
  }

  test("ppjoin prefix filter: exact pair set equals the naive gram self-join, and prunes") {
    import org.apache.spark.sql.functions._
    // Ground truth recomputed here as the naive full self-join (the shape
    // the DuckDB oracle uses), independently of the operator under test.
    val g = Dedup.testShingles(graft.Tables.documents(spark, sfDir))
    val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val naive = g.as("a").join(g.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("s"))
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("s").cast("double") /
          (col("ca.n") + col("cb.n") - col("s")).cast("double"), 4).as("jaccard"))
    def pairs(df: org.apache.spark.sql.DataFrame, tau: Double) =
      df.filter(col("jaccard") >= tau).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(0.1, 0.3, 0.5).foreach { tau =>
      val exact = pairs(naive, tau)
      val pp = Dedup.ngramJaccard(spark, sfDir, tau)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tau > 0.1 || exact.nonEmpty, "corpus must have tau=0.1 pairs to bite")
      assert((exact -- pp).isEmpty, s"tau=$tau prefix filter MISSED: ${exact -- pp}")
      assert((pp -- exact).isEmpty, s"tau=$tau EXTRA pairs: ${pp -- exact}")
    }
    // The candidate cut — the reason the prefix join exists at the knee:
    // candidates must be a strict subset of the gram-sharing pairs. (Sub-
    // knee taus deliberately route to the lean naive join instead — the
    // prefix bound prunes too little there to pay for its windows.)
    val allSharing = naive.count()
    val cand = Dedup.prefixCandidates(g, Dedup.PrefixKnee).count()
    assert(cand < allSharing,
      s"prefix filter must prune candidates: cand=$cand sharing=$allSharing")
  }

  test("banded candidates: oversized buckets route through the chunk grid with identical pairs") {
    // A degenerate dup group (identical gram sets) collides in EVERY band;
    // with the cap lowered the chunk grid must emit exactly the same
    // C(n,2) pair set the in-row expansion produces, with per-row
    // expansion bounded by chunk² instead of group².
    import spark.implicits._
    val g = (0L until 20L).flatMap(d => (1L to 5L).map(h => (d, h)))
      .toDF("doc_id", "gh")
    val expected = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L
    } yield (a, b)).toSet
    def run(): Set[(Long, Long)] = Dedup.testBandedCandidates(g).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val oneChunk = run() // default chunk: whole group is one diagonal cell
    val chunk0 = Dedup.LshBucketChunk
    try {
      Dedup.LshBucketChunk = 4 // 20 docs -> 5 chunks -> 15 grid cells
      val gridded = run()
      assert(gridded == expected, s"chunk grid lost/invented pairs: ${gridded.size}")
      assert(oneChunk == expected, s"one-chunk path lost/invented pairs: ${oneChunk.size}")
    } finally {
      Dedup.LshBucketChunk = chunk0
    }
  }

  test("derived state rebuilds when the corpus is regenerated in place") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("derived-stale-").toFile
    val corpus = Files.createTempDirectory("corpus-stale-").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    def writeCorpus(n: Long): Unit =
      spark.range(n).selectExpr("id as doc_id", "'x y z' as text")
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(corpus, "documents.parquet").getPath)
    def frame() = graft.DerivedState.materialized(spark, corpus.getPath, "stale-spec")(
      spark.read.parquet(new java.io.File(corpus, "documents.parquet").getPath))
    try {
      graft.DerivedState.rootOverride = Some(root.getPath)
      graft.DerivedState.reset()
      writeCorpus(10)
      assert(frame().count() === 10L)
      // Regenerate the corpus IN PLACE (same path, new contents). A fresh
      // session against the same durable root must REBUILD — the staleness
      // fingerprint in the key stops the 10-row frame from being served.
      Thread.sleep(10) // ensure an mtime tick even on coarse filesystems
      val before = root.listFiles().map(_.getName).toSet
      assert(before.exists(_.endsWith("#stale-spec")), "first frame dir missing")
      // A decoy that only LOOKS like a stale sibling (different tag) and
      // one under a different tag entirely — neither may be GC'd.
      val decoy = new java.io.File(root,
        before.find(_.endsWith("#stale-spec")).get + "-other")
      decoy.mkdirs()
      writeCorpus(7)
      graft.DerivedState.reset()
      assert(frame().count() === 7L,
        "stale derived frame served after in-place corpus regeneration")
      // The rebuild must GC the old-fingerprint sibling (one dead dir per
      // in-place regeneration otherwise accumulates in the durable root
      // forever) while leaving non-matching dirs alone.
      val after = root.listFiles().map(_.getName).toSet
      assert(after.count(_.endsWith("#stale-spec")) === 1,
        s"stale-fingerprint sibling not GC'd: $after")
      assert(!after.exists(before.filter(_.endsWith("#stale-spec")).contains),
        s"old-fingerprint dir survived the rebuild: $after")
      assert(after.contains(decoy.getName), "GC deleted a non-matching dir")
    } finally {
      graft.DerivedState.rootOverride = None
      graft.DerivedState.reset()
      rm(root); rm(corpus)
    }
  }

  test("dedup pair cache: a durable SPARK_GRAFT_DEDUP_DIR is reused by a later session, not rebuilt") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("dedup-reuse-").toFile
    try {
      Dedup.dedupDirOverride = Some(root.getPath)
      Dedup.resetDedupMemo()
      Dedup.clearCaches()
      graft.operators.Text.clearCaches()
      val p1 = Dedup.minhashLsh(spark, sfDir, tau = 0.5).count()
      val x1 = Dedup.ngramJaccard(spark, sfDir).count() // prefix frame
      val s1 = Dedup.simhash(spark, sfDir).count()
      val c1 = Dedup.clusters(spark, sfDir).count()
      val t1 = graft.operators.Text.contamination(spark, sfDir).count()
      def subDir(marker: String) = root.listFiles().find(_.getName.contains(marker))
        .getOrElse(fail(s"durable $marker subdir missing"))
      val subs = Seq("#K", "#prefix", "#simhash", "#labels", "#contam").map(subDir)
      subs.foreach(d => assert(new java.io.File(d, "_SUCCESS").isFile,
        s"build must leave a _SUCCESS marker in ${d.getName}"))
      def snap(d: java.io.File) = d.listFiles().map(f => f.getName -> f.lastModified()).toMap
      val stamps = subs.map(snap)
      // Fresh "session": memo + caches cleared, same durable root — reuse.
      Dedup.resetDedupMemo()
      Dedup.clearCaches()
      graft.operators.Text.clearCaches()
      assert(Dedup.minhashLsh(spark, sfDir, tau = 0.5).count() == p1)
      assert(Dedup.ngramJaccard(spark, sfDir).count() == x1)
      assert(Dedup.simhash(spark, sfDir).count() == s1)
      assert(Dedup.clusters(spark, sfDir).count() == c1)
      assert(graft.operators.Text.contamination(spark, sfDir).count() == t1)
      subs.zip(stamps).foreach { case (d, st) =>
        assert(snap(d) == st, s"reused ${d.getName} frame must not be rewritten:\n$st")
      }
    } finally {
      Dedup.dedupDirOverride = None
      Dedup.resetDedupMemo()
      Dedup.clearCaches()
      graft.operators.Text.clearCaches()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root)
    }
  }

  test("minhash-lsh recovers exactly the >=tau exact-Jaccard pairs") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = pairs(Dedup.ngramJaccard(spark, sfDir, tau = 0.5))
    val lsh = pairs(Dedup.minhashLsh(spark, sfDir, tau = 0.5))
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("dedup_clusters: pair endpoints co-cluster, canonical is the min id") {
    val labels = Dedup.clusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // Every doc labeled; labels idempotent (a cluster id labels itself).
    assert(labels.size == graft.Tables.documents(spark, sfDir).count())
    labels.values.foreach(c => assert(labels(c) == c, s"cluster id $c must be canonical"))
    // Every >= tau pair must land in one cluster, with the min endpoint <= both.
    Dedup.ngramJaccard(spark, sfDir, tau = 0.5).collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
      assert(labels(a) <= math.min(a, b))
    }
  }

  test("dedup_clusters routes sub-knee tau to the exact edge path (recall safety)") {
    // Below the R=2 banding knee (tau < 0.5) LSH candidate recall
    // collapses, so clusterEdges must fall back to the exact gram join —
    // every exact tau=0.1 pair still co-clusters.
    val exact = Dedup.ngramJaccard(spark, sfDir, tau = 0.1).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(exact.nonEmpty, "sf0.001 must have tau=0.1 pairs for this test to bite")
    val labels = Dedup.clusters(spark, sfDir, tau = 0.1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    exact.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"low-tau pair ($a,$b) split across clusters")
    }
  }

  test("dedup_clusters degenerates to all-singletons when no pair clears tau") {
    val rows = Dedup.clusters(spark, sfDir, tau = 1.01).collect()
    assert(rows.length == graft.Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_id") == r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("is_canonical"))
    }
  }

  test("q_sessionize: per-user totals partition the stream") {
    val rows = graft.operators.Relational.qSessionize(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("total_events")).sum
    assert(total == graft.Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1L)
      assert(r.getAs[Long]("max_session_events") <= r.getAs[Long]("total_events"))
      assert(r.getAs[Long]("max_session_us") >= 0L)
    }
  }

  test("LSH banding recall is exactly 1 at the tau=0.5 knee (CI gate)") {
    // The graduated dedup_minhash_lsh / dedup_clusters oracles are valid
    // only while banding recall is 1 — pin missed=0 AND extra=0 in CI so a
    // corpus/seed/constant change can never silently invalidate them
    // (tools/CheckLshRecall measures the same thing across all SFs).
    val exact = Dedup.ngramJaccard(spark, sfDir, tau = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sfDir, tau = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "the corpus must contain tau>=0.5 pairs for this gate to bite")
    assert((exact -- lsh).isEmpty, s"banding MISSED pairs: ${exact -- lsh}")
    assert((lsh -- exact).isEmpty, s"verify admitted EXTRA pairs: ${lsh -- exact}")
  }

  test("contamination catches every exact duplicate at overlap 1.0 (sf0.1 dups)") {
    // Exact copies have identical fingerprint sets: the winnowing
    // guarantee means they MUST surface as contamination pairs with
    // shared = n_fps (overlap 1.0) — the decontamination recall floor.
    // Only sf0.1 contains exact-dup groups, so the recall gate runs there.
    import graft.operators.{Dedup, Text}
    val dir = "/root/testdata/sf0.1"
    val groups = Dedup.exact(spark, dir)
      .filter(org.apache.spark.sql.functions.col("dup_count") > 1).collect()
    val cont = Text.contamination(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("overlap")).toMap
    assert(groups.nonEmpty, "sf0.1 must contain exact dups for this gate to bite")
    cont.values.foreach(o => assert(o > 0.0 && o <= 1.0))
    // For each multi-doc fingerprint group, the canonical doc must be
    // contaminated-with at least one other member at overlap 1.0.
    val fullOverlap = cont.filter(_._2 == 1.0).keySet
    groups.foreach { g =>
      val canonical = g.getAs[Long]("canonical_id")
      assert(fullOverlap.exists(p => p._1 == canonical || p._2 == canonical),
        s"exact-dup canonical $canonical missing a full-overlap contamination pair")
    }
  }

  test("simhash pairs are a subset of true near-dups (precision)") {
    val exact = Dedup.ngramJaccard(spark, sfDir, tau = 0.1).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val sh = Dedup.simhash(spark, sfDir).collect()
    assert(sh.nonEmpty)
    sh.foreach { r =>
      val p = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(exact.contains(p), s"simhash false positive $p")
      assert(r.getAs[Long]("hamming") <= 3)
    }
  }

  test("text_repetition matches a direct per-doc recomputation and stays in range") {
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def expect(text: String): (Long, Double, Double, Double) = {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      def grams(n: Int): Seq[String] = t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      def top(gs: Seq[String]): Long = gs.groupBy(identity).values.map(_.size).max.toLong
      val g2 = grams(2); val g3 = grams(3)
      (t.size.toLong,
        r4(top(t).toDouble / t.size),
        if (g2.isEmpty) 0.0 else r4(top(g2).toDouble / g2.size),
        if (g3.isEmpty) 0.0 else r4((g3.size - g3.distinct.size).toDouble / g3.size))
    }
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.Text.repetition(spark, sfDir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val got = (r.getAs[Long]("n_tokens"), r.getAs[Double]("top_word_frac"),
        r.getAs[Double]("top2_frac"), r.getAs[Double]("dup3_frac"))
      assert(got == expect(texts(r.getAs[Long]("doc_id"))),
        s"doc ${r.getAs[Long]("doc_id")}: $got")
      assert(got._2 > 0.0 && got._2 <= 1.0 && got._3 <= 1.0 && got._4 < 1.0)
    }
  }

  test("pipeline_pack_sequences equals a sequential per-shard packing replay") {
    val window = 512
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "source", "size(split(trim(lower(text)), '\\\\s+')) as tc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._1).toSeq.map { case (id, _, tc) =>
        val bin = cum / window; cum += tc; (src, bin, id, tc)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((src, bin), g) =>
      (src, bin) -> ((g.size.toLong, g.map(_._4).sum, g.map(_._3).min, g.map(_._3).max))
    }
    val got = graft.operators.Pipeline.packSequences(spark, sfDir, window).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "packing audit must equal the sequential replay")
    assert(got.size > spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source").distinct().count(),
      "window must be small enough that shards span multiple bins")
  }

  test("pack replay holds across bucket widths and the non-broadcast offset fallback") {
    import graft.operators.Pipeline
    def rows() = Pipeline.packSequences(spark, sfDir, 512).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val base = rows()
    // Tiny bucket width: the spec corpus's doc_ids now span MANY buckets
    // per source, so the bucket-offset arm (boff window + offset join)
    // actually runs — at the default 64k width every spec doc_id falls in
    // bucket 0 and lcum alone carries the answer.
    val prevB = Pipeline.PackBucketWidth
    val prevCap = Pipeline.PackOffsetBroadcastCap
    try {
      Pipeline.PackBucketWidth = 4L
      val multiBucket = Pipeline.packSequences(spark, sfDir, 512)
      val nBkts = multiBucket.sparkSession.read
        .parquet(s"$sfDir/documents.parquet")
        .selectExpr("count(distinct source, doc_id DIV 4)").collect()(0).getLong(0)
      assert(nBkts > spark.read.parquet(s"$sfDir/documents.parquet")
        .select("source").distinct().count(),
        "width=4 must produce multiple buckets per source or the arm is still dead")
      assert(rows() == base, "bucket width must never change results")
      // Cap=0 forces the offset frame past the broadcast cap: the offsets
      // must join by shuffle (no broadcast of offs) with identical rows.
      Pipeline.PackOffsetBroadcastCap = 0L
      val fb = Pipeline.packSequences(spark, sfDir, 512)
      val plan = fb.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-cap offsets must not broadcast:\n${plan.take(1200)}")
      assert(rows() == base, "fallback join must be result-identical")
    } finally {
      Pipeline.PackBucketWidth = prevB
      Pipeline.PackOffsetBroadcastCap = prevCap
      Pipeline.clearCaches()
    }
  }

  test("packSequences construction is lazy under the cap and memoized per corpus") {
    import graft.operators.Pipeline
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        descs.add(js.stageInfos.map(_.name).mkString("|")); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      // Window 257 = a memo key no other spec uses, so this really is
      // first construction. The broadcast-vs-shuffle decision must come
      // from the parquet FOOTER row count (docs ≤ cap ⇒ offsets ≤ cap) —
      // constructing the frame may not run a corpus scan+tokenize job
      // (the r15 eager-count regression: plan-only audits paid a scan).
      val a = Pipeline.packSequences(spark, sfDir, 257)
      Thread.sleep(500) // listener bus is async — give a stray job time to surface
      // Schema inference ("parquet at ...") is a footer read — metadata,
      // allowed. What must NOT appear is an ACTION (the r15 regression ran
      // `count at Pipeline` — a corpus scan+tokenize — at construction).
      val actions = descs.toArray.map(_.toString).filterNot(_.startsWith("parquet at"))
      assert(actions.isEmpty,
        s"plan construction under the cap must run no actions, ran: ${actions.mkString("; ")}")
      // Memoized: the second call returns the SAME frame (one plan, one
      // tracked cache entry per corpus — not one per invocation).
      assert(a eq Pipeline.packSequences(spark, sfDir, 257),
        "repeat invocation must reuse the memoized frame")
      assert(a.collect().nonEmpty)
      assert(jobs.get() > 0, "consuming the frame must of course run jobs")
    } finally {
      spark.sparkContext.removeSparkListener(l)
    }
  }

  test("pipeline_pack_sequences window is shard-partitioned, never a global-order window") {
    val plan = graft.operators.Pipeline.packSequences(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "packing needs the per-shard prefix sum window")
    assert("(?i)windowspecdefinition\\(source".r.findFirstIn(plan.toLowerCase).isDefined ||
      plan.contains("PartitionBy: [source") || "partitionBy.*source".r.findFirstIn(plan).isDefined ||
      plan.contains("Window [sum(tc"),
      s"window must partition by the shard key:\n${plan.take(1200)}")
    assert(!plan.contains("SinglePartition"),
      s"an unpartitioned global-order window serializes the corpus:\n${plan.take(1200)}")
  }

  test("text_rarity_score plan: fused-vocab narrow map, join fallback broadcast") {
    // Production (vocab under the cap): ONE corpus scan through the
    // RarityStats kernel — no explode, no join, no hash exchange at all.
    val prod = Text.rarityScore(spark, sfDir).queryExecution.executedPlan.toString
    assert(prod.toLowerCase.contains("raritystats"),
      s"scorer must run the fused vocab kernel:\n${prod.take(1500)}")
    assert(!prod.contains("Exchange hashpartitioning") && !prod.contains("Generate"),
      s"fused route must be a narrow map — no explode/shuffle:\n${prod.take(1500)}")
    // Fallback (vocab over the cap, forced with cap=0): distinct-grain
    // explode of the cached runs column, vocab joined back as broadcast —
    // never a token-POSITION-grain exchange (the round-11 Zipf-skew plan).
    val join = Text.rarityScoreCapped(spark, sfDir, 0)
      .queryExecution.executedPlan.toString
    assert(join.contains("explode(runs"),
      s"fallback generator must explode the cached runs column:\n${join.take(1500)}")
    assert(!join.contains("explode(split"),
      s"raw token-position explode resurfaced:\n${join.take(1500)}")
    assert(join.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n${join.take(1500)}")
    Text.clearCaches()
  }

  test("text_rarity_score: fused kernel route ≡ the join route row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    try assert(rows(Text.rarityScore(spark, sfDir)) ==
      rows(Text.rarityScoreCapped(spark, sfDir, 0)),
      "the two routes must agree exactly")
    finally Text.clearCaches()
  }

  test("text_rarity_score equals an integer-math replay and ranks rare vocabulary higher") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "split(trim(lower(text)), '\\\\s+') as t").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val freq = texts.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = texts.map(_._2.size.toLong).sum
    val expected = texts.map { case (id, ts) =>
      val rs = ts.map(t => n / freq(t)).sum
      id -> ((ts.size.toLong, rs,
        BigDecimal(rs.toDouble / ts.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Text.rarityScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (nt, rs, mean)) =>
      assert((nt, rs) == (expected(id)._1, expected(id)._2), s"doc $id integer stats diverge")
      assert(math.abs(mean - expected(id)._3) < 1e-9, s"doc $id mean diverges")
    }
  }
}
