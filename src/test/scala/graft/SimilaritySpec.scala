package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  test("vec_knn_bruteforce: k ordered results, scores in [-1,1]") {
    val rows = Similarity.knnBruteforce(spark, sfDir).collect()
    assert(rows.length == 10)
    val cos = rows.map(_.getAs[Double]("cos"))
    assert(cos.sameElements(cos.sortBy(-_)))
    cos.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
  }

  test("vec_knn_bruteforce broadcasts the query and takes top-k without global sort") {
    val plan = planOf(Similarity.knnBruteforce(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("Broadcast"))
  }

  test("vec_knn_join: exactly k neighbors per query, ranked") {
    val rows = Similarity.knnJoin(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8)
    byQ.values.foreach { g =>
      assert(g.length == 3)
      assert(g.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 3L))
      g.foreach(r => assert(r.getAs[Long]("vec_id") >= 8))
    }
  }

  test("vec_range_search returns only scores >= tau") {
    Similarity.rangeSearch(spark, sfDir, tau = 0.2).collect()
      .foreach(r => assert(r.getAs[Double]("cos") >= 0.2))
  }

  test("vec_normalize: dim 64, unit-ish norms, no shuffle") {
    val df = Similarity.normalize(spark, sfDir)
    assert(!planOf(df).contains("Exchange"), "norm audit must be a narrow map")
    df.collect().foreach { r =>
      assert(r.getAs[Long]("dim") == 64)
      assert(r.getAs[Double]("l2_norm") > 0.0)
    }
  }

  test("vec_pairwise_dups: a<b, symmetric-free, thresholded") {
    Similarity.pairwiseDups(spark, sfDir, tau = 0.3).collect().foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cos") >= 0.3)
    }
  }

  test("vec_ivf_search: results scored exactly, recall measured vs brute force") {
    val ivf = Similarity.ivfSearch(spark, sfDir).collect()
    assert(ivf.nonEmpty && ivf.length <= 10)
    // Exactness of the scoring stage: every IVF hit must carry the same
    // rounded cosine the brute-force path computes for that vec_id.
    val bfAll = Similarity.rangeSearch(spark, sfDir, tau = -1.1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    ivf.foreach(r => assert(bfAll(r.getAs[Long]("vec_id")) == r.getAs[Double]("cos")))
    val bfTop = Similarity.knnBruteforce(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = ivf.count(r => bfTop.contains(r.getAs[Long]("vec_id"))).toDouble / bfTop.size
    info(s"ivf recall@10 = $recall (nprobe=4/nlist=16, unclustered data)")
    assert(recall >= 0.3, s"recall $recall below floor")
  }

  test("vec_ivf_join: per-query top-k, exact scores, recall vs knn_join") {
    val ivf = Similarity.ivfJoin(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    // Per-query shape: <= k rows per q_id, ranks 1..k, ids from the corpus.
    ivf.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getAs[Long]("rk")).sorted.sameElements(1L to rows.length))
    }
    ivf.foreach(r => assert(r.getAs[Long]("vec_id") >= 8))
    // Exact scoring: each hit carries the same rounded cosine knn_join
    // (full scoring) computes for that (q_id, vec_id).
    val exact = Similarity.knnJoin(spark, sfDir, k = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos"))
      .toMap
    ivf.foreach { r =>
      assert(exact((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))) ==
        r.getAs[Double]("cos"))
    }
    // Recall vs the exact per-query top-3 across all queries.
    val exactTop = Similarity.knnJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val hits = ivf.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exactTop & hits).size.toDouble / exactTop.size
    info(s"ivf_join recall@3 = $recall (nprobe=4/nlist=16, 8 queries)")
    assert(recall >= 0.3, s"recall $recall below floor")
  }

  test("vec_lsh_search: exact scores, candidates only from probed buckets") {
    val rows = Similarity.lshSearch(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val bfAll = Similarity.rangeSearch(spark, sfDir, tau = -1.1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    rows.foreach(r =>
      assert(bfAll(r.getAs[Long]("vec_id")) == r.getAs[Double]("cos"),
        "LSH hits must carry the exact cosine"))
    val bfTop = Similarity.knnBruteforce(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = rows.count(r => bfTop.contains(r.getAs[Long]("vec_id"))).toDouble / bfTop.size
    info(s"lsh recall@10 = $recall (8-bit buckets, Hamming<=1 probes)")
  }

  test("vec_grouped_knn: one best hit per label, scored exactly") {
    val rows = Similarity.groupedKnn(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val labels = rows.map(_.getAs[Number]("label").longValue)
    assert(labels.distinct.length == labels.length, "each group appears once")
    val bfAll = Similarity.rangeSearch(spark, sfDir, tau = -1.1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    rows.foreach(r =>
      assert(bfAll(r.getAs[Long]("best_vec_id")) == r.getAs[Double]("cos"),
        "group winner must carry the exact brute-force score"))
  }

  test("metric suite: L2, IP, and Hamming tops are well-formed and consistent") {
    val l2 = Similarity.l2Knn(spark, sfDir).collect()
    assert(l2.length == 10)
    val dists = l2.map(_.getAs[Double]("l2_dist"))
    assert(dists.sameElements(dists.sorted), "L2 ascending")
    assert(dists.forall(_ >= 0.0))
    val ip = Similarity.ipKnn(spark, sfDir).collect()
    val ips = ip.map(_.getAs[Double]("ip"))
    assert(ips.sameElements(ips.sorted.reverse), "IP descending")
    val bin = Similarity.binaryKnn(spark, sfDir).collect()
    bin.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 64, s"hamming $h out of range for 64-bit codes")
    }
    // Hamming approximates angle: the binary top-10 should overlap the
    // cosine top-10 far better than chance (10 of ~500).
    val cosTop = Similarity.knnBruteforce(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val overlap = bin.count(r => cosTop.contains(r.getAs[Long]("vec_id")))
    info(s"binary/cosine top-10 overlap = $overlap")
    assert(overlap >= 1)
  }

  test("vec_hybrid_rrf: fusion scores decompose into the two ranks") {
    val rows = Similarity.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (ra, rb) = (r.getAs[Long]("rank_a"), r.getAs[Long]("rank_b"))
      assert(ra >= 1 && rb >= 1)
      val expect = math.rint((1.0 / (60 + ra) + 1.0 / (60 + rb)) * 1e4) / 1e4
      assert(r.getAs[Double]("rrf") == expect)
    }
    // Bounded candidate lists: ranks can never exceed the list size.
    assert(rows.forall(r => r.getAs[Long]("rank_a") <= 100 && r.getAs[Long]("rank_b") <= 100))
  }

  private def seqDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dedup_semantic equals a driver-side SemDeDup replay (assign + within-cluster pairs)") {
    val tau = 0.45
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val nrm = vecs.map { case (id, e) => id -> math.sqrt(seqDot(e, e)) }.toMap
    val cents = vecs.filter(_._1 < 16)
    val assign = vecs.map { case (id, e) =>
      val cid = cents.map { case (c, ce) =>
        (c, seqDot(e, ce) / (nrm(id) * nrm(c)))
      }.sortBy { case (c, cos) => (-cos, c) }.head._1
      id -> cid
    }.toMap
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long, Double)]
    for {
      (ia, ea) <- vecs; (ib, eb) <- vecs
      if ia < ib && assign(ia) == assign(ib)
      cos = r4(seqDot(ea, eb) / (nrm(ia) * nrm(ib))) if cos >= tau
    } {
      val (cl, n, mx) = expected.getOrElse(ib, (assign(ib), 0L, -2.0))
      expected(ib) = (cl, n + 1, math.max(mx, cos))
    }
    val got = Similarity.semanticDedup(spark, sfDir, tau).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Long]("n_earlier"), r.getAs[Double]("max_cos"))))
      .toMap
    assert(got == expected.toMap, "operator must equal the sequential SemDeDup replay")
    assert(got.nonEmpty, "corpus must exercise the duplicate path")
  }

  test("dedup_semantic: size-routed — member-gather kernel for small clusters, grid for big") {
    val plan = planOf(Similarity.semanticDedup(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"within-cluster pairs must never go cartesian:\n$plan")
    // Small clusters (bounded per-key work by the routing threshold):
    // ONE shuffle gathers members per cluster, the m²/2 dots run inside
    // the SemanticPairStats kernel — no pair rows, no embedding copies.
    assert(plan.toLowerCase.contains("semanticpairstats"),
      s"small-cluster route must run the native pair-stats kernel:\n${plan.take(2000)}")
    assert(plan.contains("collect_list"),
      s"small-cluster route must gather members with ONE shuffle:\n${plan.take(2000)}")
    // The kernel must appear in the Generate only — a plain explode lets
    // InferFiltersFromGenerate re-run it per cluster inside an inferred
    // size()>0 filter (the r5 double-eval pitfall).
    val kernelEvals = "(?i)semanticpairstats".r.findAllIn(plan).length
    assert(kernelEvals <= 2, // Generate prints input expr + generator output
      s"kernel must evaluate once per cluster, found $kernelEvals mentions:\n${plan.take(2000)}")
    assert(!plan.contains("size(semanticpairstats"),
      s"no inferred size() filter may re-run the kernel:\n${plan.take(2000)}")
    // Oversized clusters still take the block grid: key (cluster, gi, gj)
    // bounds per-task pair work by sub-block products however hot the
    // cluster (round-10 verdict's skewed-key quadratic).
    assert(plan.contains("gi") && plan.contains("gj"),
      s"big-cluster route must keep the (cluster, gi, gj) grid:\n${plan.take(2000)}")
    // Every branch reads the ONE cached slim index frame, not its own
    // FileScan over the nlist cluster partition dirs.
    assert(plan.contains("InMemoryRelation") || plan.contains("InMemoryTableScan"),
      s"join branches must read the cached slim index frame:\n${plan.take(2000)}")
  }

  test("kernel round4 matches Spark's double round(_, 4) exactly") {
    // The kernel's fast-path rounding must agree with Spark's
    // BigDecimal(HALF_UP) semantics on every double — sweep a dense
    // deterministic grid plus adversarial half-boundary values (where the
    // fast path must defer to the exact path).
    val spark2 = spark
    import spark2.implicits._
    val adversarial = Seq(0.44995, 0.45005, 0.12345, 0.999949999999,
      0.99995, 0.5 + 5e-5, 1.0, 0.0001, 0.00004999999, -0.44995, -0.45005)
    val grid = (0 until 20000).map(i => -1.0 + i * 1.0001e-4) ++
      (0 until 1000).map(i => i * 1e-4 + 5e-5) ++ adversarial
    val sparkRounded = grid.toDF("d")
      .select(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("d"), 4)).as[Double].collect()
    grid.zip(sparkRounded).foreach { case (d, expect) =>
      val got = graft.functions.SemanticPairStats.round4(d)
      assert(got == expect, s"round4($d) = $got, Spark round = $expect")
    }
  }

  test("dedup_semantic routing: grid-forced and hash-routed results are identical") {
    val default = Similarity.SemGridMinCluster
    try {
      val hashRouted = Similarity.semanticDedup(spark, sfDir).collect()
        .map(_.toSeq).toSet
      Similarity.SemGridMinCluster = 0L // every cluster takes the CELL-kernel route
      val gridForced = Similarity.semanticDedup(spark, sfDir).collect()
        .map(_.toSeq).toSet
      assert(hashRouted == gridForced,
        "the two routes must produce the identical duplicate set")
      // (The same equivalence holds on REAL oversized clusters: the blobs
      // corpus — 4 clusters of 38-61k members, above the 20k threshold —
      // measured bit-identical row digests between the cell route and the
      // forced member-gather kernel; tools/ProbeBlobs, round 14.)
      assert(hashRouted.nonEmpty, "corpus must exercise the duplicate path")
    } finally Similarity.SemGridMinCluster = default
  }

  test("dedup_semantic work-based fan-out: per-cluster NB cells equal the hash route") {
    // gridMin = 5 routes every ~31-member spec cluster through the grid
    // with NB = max(4, ceil(csize/5)) = 7 — exercising MULTI-block
    // per-cluster fan-out (csize-driven, not the static nBlocks), the arm
    // the gridmin=0 seam deliberately skips (it falls back to NB = 4 so
    // forced-route tests keep multi-member cells). Results must equal the
    // default hash route exactly: cells partition the pair set whatever
    // the fan-out.
    val default = Similarity.SemGridMinCluster
    try {
      val hashRouted = Similarity.semanticDedup(spark, sfDir).collect()
        .map(_.toSeq).toSet
      Similarity.SemGridMinCluster = 5L
      val fanned = Similarity.semanticDedup(spark, sfDir).collect()
        .map(_.toSeq).toSet
      assert(fanned == hashRouted,
        "work-based fan-out must produce the identical duplicate set")
      assert(hashRouted.nonEmpty, "corpus must exercise the duplicate path")
    } finally Similarity.SemGridMinCluster = default
  }

  test("dedup_semantic routing threshold scales with embedding dimension") {
    import Similarity.semGridMinCluster
    // Calibration point: at the reference dim the base applies unchanged.
    assert(semGridMinCluster(64) === 20000L)
    // Work-based scaling: T(dim) = base·√(64/dim) keeps the largest
    // whole-cluster task at a constant FMA budget across widths.
    assert(semGridMinCluster(256) === 10000L)
    assert(semGridMinCluster(768) === 5773L)
    assert(semGridMinCluster(1536) === 4082L)
    // Monotone in dim, floored, and the force-grid seam survives.
    assert(semGridMinCluster(1 << 20) === 256L)
    val default = Similarity.SemGridMinCluster
    try {
      Similarity.SemGridMinCluster = 0L
      assert(semGridMinCluster(64) === 0L,
        "base=0 must still force every cluster through the cell route")
    } finally Similarity.SemGridMinCluster = default
  }

  test("dedup_semantic grid: per-task pair work is bounded by sub-block products") {
    // Direct bound check: with NB blocks, no single join-key group may
    // hold more than ceil(|c|/NB) rows per side — the quadratic-per-task
    // risk is |group_a| × |group_b|, which the grid caps at (|c|/NB)².
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val nBlocks = 4
    val (idx, _) = Similarity.testIvfIndexed(spark, sfDir, 16)
    val bySide = idx
      .select(col("cluster"), pmod(col("vec_id"), lit(nBlocks)).as("blk"))
      .groupBy(col("cluster"), col("blk")).count().collect()
    val byCluster = bySide.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    bySide.foreach { r =>
      val c = byCluster(r.getLong(0))
      assert(r.getLong(2) <= c / nBlocks + c / 8 + 8,
        s"sub-block ${r.getLong(0)}/${r.getLong(1)} holds ${r.getLong(2)} of $c — id-hash blocking degenerate")
    }
  }

  test("ivf index: a durable SPARK_GRAFT_IVF_DIR is reused by a later session, not rebuilt") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("ivf-reuse-").toFile
    try {
      Similarity.ivfDirOverride = Some(root.getPath)
      Similarity.resetIvfMemo()
      val (idx1, _) = Similarity.testIvfIndexed(spark, sfDir, 16)
      val n1 = idx1.count()
      val sub = root.listFiles().find(_.getName.endsWith("#16"))
        .getOrElse(fail("durable index subdir missing"))
      assert(new java.io.File(sub, "_SUCCESS").isFile, "build must leave a _SUCCESS marker")
      val stamps = sub.listFiles().map(f => f.getName -> f.lastModified()).toMap
      // Fresh "session": memo cleared, same durable root — must reuse.
      Similarity.resetIvfMemo()
      val (idx2, _) = Similarity.testIvfIndexed(spark, sfDir, 16)
      assert(idx2.count() == n1)
      val after = sub.listFiles().map(f => f.getName -> f.lastModified()).toMap
      assert(after == stamps, s"reused index must not be rewritten:\n$stamps\nvs\n$after")
    } finally {
      Similarity.ivfDirOverride = None
      Similarity.resetIvfMemo()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root)
    }
  }

  test("vec_kmeans_refine: every cluster present, counts partition the corpus, shift sane") {
    val rows = Similarity.kmeansRefine(spark, sfDir).collect()
    assert(rows.length == 16, "each seed centroid self-assigns, so no cluster is empty")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_assigned")).sum == n, "assignment must partition the corpus")
    rows.foreach { r =>
      val s = r.getAs[Double]("shift_cos")
      assert(s > 0.0 && s <= 1.0001, s"refined mean should stay centroid-aligned, got $s")
    }
  }

  test("vec_scalar_quantize: SQ8 reconstruction error bounded by half a quantization step") {
    val spans = Similarity.dimStats(spark, sfDir).collect()
      .map(r => r.getAs[Double]("mx") - r.getAs[Double]("mn"))
    // Rounded-to-nearest codes put every dim within span/255/2 of its
    // value (+ the 4dp rounding of the fitted stats the bound reuses).
    val bound = spans.max / 510.0 + 1e-4
    val rows = Similarity.scalarQuantize(spark, sfDir).collect()
    assert(rows.length == spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    rows.foreach { r =>
      val c = r.getAs[Long]("code1")
      assert(c >= 0 && c <= 255, s"8-bit code out of range: $c")
      val (mae, mx) = (r.getAs[Double]("mae"), r.getAs[Double]("max_err"))
      assert(mae <= mx + 1e-9)
      assert(mx <= bound, s"max_err $mx exceeds half-step bound $bound")
    }
  }

  test("ivf coarse assignment: full-probe coarse == exact argmax bit-for-bit") {
    // With probe >= nCells every centroid is scored, so the two-level path
    // MUST reproduce the exact argmax (same double fold, same tie rule) —
    // pins the math shared by both paths.
    import org.apache.spark.sql.functions.col
    val n = Similarity.testNormed(spark, sfDir)
    val cents = n.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val both = n.select(col("vec_id"),
      graft.functions.Vec.nearestCentroid(col("embedding"), col("nrm"), cents).as("exact"),
      graft.functions.Vec.nearestCentroidCoarse(col("embedding"), col("nrm"), cents,
        nCells = 8, probe = 8).as("coarse")).collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}: full-probe coarse ${r.getLong(2)} != exact ${r.getLong(1)}"))
  }

  test("ivf coarse assignment: partial-probe agreement high, disagreements boundary-only, driver corpora exact") {
    // Driver-gated corpora all build at nlist <= 16 < CoarseMinNlist, so
    // their oracle results are byte-identical to the pre-coarse build.
    assert(Similarity.CoarseMinNlist > 16,
      "oracle corpora (nlist<=16) must stay on the exact assignment path")
    import org.apache.spark.sql.functions.col
    val n = Similarity.testNormed(spark, sfDir)
    val cents = n.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    // Probe 4, NARROWER than the production default (16): at 8 cells the
    // default's shortlist (16·64/8 = 128 ≥ 64 centroids) degenerates to
    // exact and the boundary analysis below would assert nothing. The
    // default's agreement at production regimes is measured by
    // tools/ProbeCoarseAgreement (r16: 1.0000 at 20M × 64-dim/k=16000,
    // 0.8525 at 1M × 768-dim/k=800) and recorded in TESTDATA.
    val probe = 4
    val both = n.select(col("vec_id"), col("embedding"), col("nrm"),
      graft.functions.Vec.nearestCentroid(col("embedding"), col("nrm"), cents).as("exact"),
      graft.functions.Vec.nearestCentroidCoarse(col("embedding"), col("nrm"), cents,
        nCells = 8, probe = probe).as("coarse")).collect()
    val agree = both.count(r => r.getLong(3) == r.getLong(4))
    val frac = agree.toDouble / both.length
    info(s"coarse/exact agreement at nlist=64, nCells=8, probe=$probe: " +
      s"$agree/${both.length} = $frac")
    // This corpus is the coarse quantizer's WORST case (near-uniform
    // 64-dim vectors: inter-centroid cosines concentrate near 0, so cells
    // are barely separated); real embedding corpora cluster far better.
    // Even here most vectors must resolve identically...
    assert(frac >= 0.85, s"two-level assignment agreement $frac below 0.85 — " +
      "coarse cell structure is mis-partitioning the centroid space")
    // ...and every disagreement must be a BOUNDARY case: the coarse-chosen
    // centroid's cosine within 0.1 of the exact best — bounded quality
    // loss, never an arbitrary cell.
    val byId = cents.map(c => c._1 -> c).toMap
    both.filter(r => r.getLong(3) != r.getLong(4)).foreach { r =>
      val e = r.getSeq[Float](1).toArray
      val nrm = r.getDouble(2)
      def cosTo(cid: Long): Double = {
        val (_, ce, cn) = byId(cid)
        var s = 0.0; var i = 0
        while (i < e.length) { s += e(i).toDouble * ce(i).toDouble; i += 1 }
        s / (nrm * cn)
      }
      val gap = cosTo(r.getLong(3)) - cosTo(r.getLong(4))
      assert(gap >= 0 && gap <= 0.15,
        s"vec ${r.getLong(0)}: coarse pick ${r.getLong(4)} trails exact ${r.getLong(3)} by $gap")
    }
  }
}
