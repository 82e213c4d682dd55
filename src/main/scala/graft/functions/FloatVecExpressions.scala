package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the vector hot path: dot product over two
  * `array<float>` columns, accumulated in double.
  *
  * Why not `zip_with`+`aggregate`: those are codegen'd too, but materialize
  * an intermediate array<double> per row-pair and walk it with per-element
  * null checks. In an N×M scoring loop (pairwise dups, knn join) that
  * allocation dominates. This expression compiles to a tight primitive loop
  * — no allocation, no boxing — via `doGenCode`, and stays inside
  * whole-stage codegen.
  *
  * Accumulation order is the same sequential left fold as the HOF version
  * and the DuckDB oracle's list fold, so results are bit-identical.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatDotProduct needs array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment for the IVF index build: argmax over k of
  * cos(e, c_k) = dot(e, c_k) / (nrm_e · cn_k), ties to the smallest
  * centroid id — one codegen'd loop over a centroid matrix held as a
  * reference object.
  *
  * Why an expression and not `greatest(struct(cos_k, -cid_k), ...)`: the
  * literal formulation builds an nlist-wide expression tree PER ROW —
  * fine at nlist=16, but codegen size (and JIT limits) scale linearly
  * with nlist, which caps the index at tens of centroids. k-means-style
  * builds need k ∝ corpus size (SemDeDup, IVF training), so the argmax
  * must be a loop, not a tree. Double math and fold order are identical
  * to [[FloatDotProduct]] + the division the literal tree performed, so
  * assignments are bit-identical where both are defined.
  */
case class NearestCentroid(left: Expression, right: Expression,
    cids: Array[Long], cents: Array[Array[Float]], cnorms: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"NearestCentroid needs (array<float>, double), got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroid.assign(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      cids, cents, cnorms)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    val cnRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NearestCentroid.assign($a, $b, $cidsRef, $centsRef, $cnRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** Shared by interpreted eval and codegen — the same sequential double
    * fold per centroid as [[FloatDotProduct]], scored as dot/(nrm·cn)
    * exactly like the literal-tree build (division order preserved so
    * near-tie argmaxes cannot flip), strict `>` so ties keep the first
    * (centroids are passed in ascending cid order).
    */
  def assign(e: ArrayData, nrm: Double, cids: Array[Long],
      cents: Array[Array[Float]], cnorms: Array[Double]): Long = {
    var best = Double.NegativeInfinity
    var bid = 0L
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val m = math.min(e.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += e.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      val s = acc / (nrm * cnorms(k))
      if (s > best) { best = s; bid = cids(k) }
      k += 1
    }
    bid
  }

  /** Two-level (coarse-quantizer) assignment — the IMI/IVF-build shape for
    * k-means-scale nlist: score the ~√k coarse cell means first, then argmax
    * only over the centroids belonging to the `probe` best cells. Cost per
    * vector drops from O(k·d) to O((√k + probe·k/√k)·d); with k ∝ n (see
    * Similarity.semNlist) that turns the whole index build from O(n²·d/C)
    * back to O(n^1.5·d/C). Ties break to the smallest cid regardless of
    * cell iteration order (`s == best && cid < bid`), so the result is a
    * pure function of the inputs, not of probe ordering.
    */
  def assignCoarse(e: ArrayData, nrm: Double,
      cmeans: Array[Array[Float]], cmnorms: Array[Double],
      members: Array[Array[Int]], probe: Int,
      cids: Array[Long], cents: Array[Array[Float]], cnorms: Array[Double]): Long = {
    val nc = cmeans.length
    val w = math.min(probe, nc)
    // Partial selection of the top-w coarse cells by cosine: insertion into
    // two w-sized arrays (w is single digits; no heap needed).
    val topS = new Array[Double](w)
    val topI = new Array[Int](w)
    java.util.Arrays.fill(topS, Double.NegativeInfinity)
    java.util.Arrays.fill(topI, -1)
    var j = 0
    while (j < nc) {
      val c = cmeans(j)
      val m = math.min(e.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += e.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      val s = acc / (nrm * cmnorms(j))
      if (s > topS(w - 1)) {
        var p = w - 1
        while (p > 0 && topS(p - 1) < s) {
          topS(p) = topS(p - 1); topI(p) = topI(p - 1); p -= 1
        }
        topS(p) = s; topI(p) = j
      }
      j += 1
    }
    var best = Double.NegativeInfinity
    var bid = Long.MaxValue
    var t = 0
    while (t < w) {
      val cell = topI(t)
      if (cell >= 0) {
        val mem = members(cell)
        var u = 0
        while (u < mem.length) {
          val k = mem(u)
          val c = cents(k)
          val m = math.min(e.numElements(), c.length)
          var acc = 0.0
          var i = 0
          while (i < m) { acc += e.getFloat(i).toDouble * c(i).toDouble; i += 1 }
          val s = acc / (nrm * cnorms(k))
          if (s > best || (s == best && cids(k) < bid)) { best = s; bid = cids(k) }
          u += 1
        }
      }
      t += 1
    }
    bid
  }

  /** Driver-side grouping of the k centroids into `nCells` coarse cells:
    * deterministic Lloyd over the centroid matrix (init = evenly-strided
    * centroids, fixed iteration count, strict-> ties to the lowest cell, an
    * emptied cell keeps its previous mean). k is index-metadata-sized
    * (≤ tens of thousands), so this is microseconds-to-milliseconds of
    * driver math — the same place the centroid collect already happens.
    * Returns (cell means, cell mean norms, member centroid indices).
    */
  def coarseCells(cents: Array[Array[Float]], cnorms: Array[Double],
      nCells: Int, iters: Int = 8)
      : (Array[Array[Float]], Array[Double], Array[Array[Int]]) = {
    val k = cents.length
    val nc = math.min(nCells, k)
    val d = cents(0).length
    val stride = math.max(1, k / nc)
    var means: Array[Array[Double]] =
      Array.tabulate(nc)(j => cents(math.min(j * stride, k - 1)).map(_.toDouble))
    var mnorms: Array[Double] = means.map(m => math.sqrt(m.map(x => x * x).sum))
    var assign = new Array[Int](k)
    var it = 0
    while (it < iters) {
      var ki = 0
      while (ki < k) {
        var best = Double.NegativeInfinity
        var bj = 0
        var j = 0
        while (j < nc) {
          var acc = 0.0
          var i = 0
          val mm = means(j)
          while (i < d) { acc += cents(ki)(i).toDouble * mm(i); i += 1 }
          val s = acc / (cnorms(ki) * mnorms(j))
          if (s > best) { best = s; bj = j }
          j += 1
        }
        assign(ki) = bj
        ki += 1
      }
      val sums = Array.fill(nc)(new Array[Double](d))
      val cnt = new Array[Int](nc)
      ki = 0
      while (ki < k) {
        val j = assign(ki)
        var i = 0
        while (i < d) { sums(j)(i) += cents(ki)(i).toDouble; i += 1 }
        cnt(j) += 1
        ki += 1
      }
      means = Array.tabulate(nc)(j =>
        if (cnt(j) == 0) means(j) else sums(j).map(_ / cnt(j)))
      mnorms = means.map(m => math.sqrt(m.map(x => x * x).sum))
      it += 1
    }
    val members = Array.tabulate(nc)(j =>
      (0 until k).filter(assign(_) == j).toArray)
    (means.map(_.map(_.toFloat)), mnorms, members)
  }
}

/** [[NearestCentroid]]'s two-level sibling for k-means-scale nlist: the
  * coarse cell means, memberships and the full centroid matrix ride along
  * as reference objects; per row the assignment is
  * [[NearestCentroid.assignCoarse]] — O((√k + probe·√k)·d) instead of
  * O(k·d). Used by the IVF index build above `Similarity.CoarseMinNlist`
  * centroids; below that the exact single-level argmax runs, so every
  * oracle-gated corpus keeps byte-identical assignments.
  */
case class NearestCentroidCoarse(left: Expression, right: Expression,
    cmeans: Array[Array[Float]], cmnorms: Array[Double],
    members: Array[Array[Int]], probe: Int,
    cids: Array[Long], cents: Array[Array[Float]], cnorms: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"NearestCentroidCoarse needs (array<float>, double), got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroid.assignCoarse(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      cmeans, cmnorms, members, probe, cids, cents, cnorms)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("cmeans", cmeans, "float[][]")
    val cmnRef = ctx.addReferenceObj("cmnorms", cmnorms, "double[]")
    val memRef = ctx.addReferenceObj("members", members, "int[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    val cnRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NearestCentroid.assignCoarse($a, $b, " +
        s"$cmRef, $cmnRef, $memRef, $probe, $cidsRef, $centsRef, $cnRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Within-cluster SemDeDup pair statistics as ONE compute kernel per
  * cluster: input is the cluster's members `array<struct<vec_id, embedding,
  * nrm>>` (from a `collect_list` group), output is one struct per DUPLICATE
  * member — (id_b, n_earlier, max_cos) over its lower-id cluster-mates at
  * rounded cosine ≥ τ.
  *
  * Why a kernel and not the pair equi-join: the join materializes every
  * candidate pair as a row with BOTH embeddings copied into it (~512 B per
  * pair) — measured ~1.1 µs·core per pair at 2M vectors against ~60 ns for
  * the dot product itself, a ~20× row-machinery tax on an O(Σ|c|²)
  * pair count that dominates the whole operator. Here each cluster's
  * embeddings are unpacked ONCE into primitive arrays and the m²/2 dots
  * run in a tight loop — no pair rows, no copies, no shuffle of pair
  * intermediates. Per-task memory is the cluster itself (≤ the routing
  * threshold × row width; the block grid keeps handling oversized
  * clusters).
  *
  * Parity with the Column formulation (and the DuckDB oracle): the dot is
  * the same sequential double fold as [[FloatDotProduct]], the score the
  * same `dot / (nrm_a · nrm_b)` division order, and the τ gate applies to
  * `round(cos, 4)` computed exactly as Spark's `Round(HALF_UP)` on doubles
  * (`java.math.BigDecimal.valueOf(d).setScale(4, HALF_UP)`). The rounding
  * runs only inside a `τ - 1e-4` boundary band — everything below cannot
  * round up to ≥ τ (4-decimal rounding moves a double by ≤ 5·10⁻⁵ + ulp).
  */
case class SemanticPairStats(child: Expression, tau: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_b", LongType, nullable = false),
    StructField("n_earlier", LongType, nullable = false),
    StructField("max_cos", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // The embedding element type is pinned to FLOAT: an array<double>
    // column would pass a looser check at analysis and only explode later
    // inside toFloatArray's per-element cast at runtime.
    case ArrayType(s: StructType, _) if s.length == 3 &&
        s(0).dataType == LongType &&
        (s(1).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }) &&
        s(2).dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SemanticPairStats needs array<struct<long, array<float>, double>>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    SemanticPairStats.stats(a.asInstanceOf[ArrayData], tau)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SemanticPairStats.stats($a, $tau);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[SemanticPairStats]] for one CELL of the block grid — the oversized-
  * cluster route: the grid decomposition (sub-blocks by pmod(vec_id, NB),
  * every unordered sub-block pair meets in exactly one (gi, gj) cell)
  * stays OUTSIDE in the plan, and the cell's cross-block pair dots run
  * INSIDE this kernel over two unpacked member arrays — no pair rows, no
  * per-pair embedding copies, no per-pair Round. Replaces the pair-row
  * grid join, whose row machinery (plus Spark Round's Double.toString per
  * pair) ran >17 min on a real 61k-member hot cluster where the pair math
  * itself owes ~seconds (measured on the blobs corpus, round 14).
  *
  * Diagonal cells (gi == gj, both inputs the same sub-block) delegate to
  * [[SemanticPairStats.stats]] — i<j pairs once; off-diagonal cells score
  * every cross pair and credit the HIGHER vec_id (blocks partition
  * vec_ids, so cross pairs never tie). Output is the cell's PARTIAL
  * per-vector stats; the caller sums n_earlier / maxes max_cos across
  * cells — exact because cells partition the cluster's pair set.
  * Per-task memory: two sub-blocks, regardless of cluster size.
  */
case class SemanticCellStats(first: Expression, second: Expression,
    third: Expression, tau: Double)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_b", LongType, nullable = false),
    StructField("n_earlier", LongType, nullable = false),
    StructField("max_cos", DoubleType, nullable = false))), containsNull = false)

  private def memberOk(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) if s.length == 3 &&
        s(0).dataType == LongType &&
        (s(1).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }) &&
        s(2).dataType == DoubleType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (memberOk(first.dataType) && memberOk(second.dataType) &&
      third.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SemanticCellStats needs (members, members, boolean), got " +
        s"${first.dataType} / ${second.dataType} / ${third.dataType}")

  override def nullSafeEval(a: Any, b: Any, d: Any): Any =
    SemanticPairStats.cellStats(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], d.asInstanceOf[Boolean], tau)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, d) =>
      s"${ev.value} = graft.functions.SemanticPairStats.cellStats($a, $b, $d, $tau);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SemanticPairStats {
  /** `round(d, 4)` with Spark's double Round semantics (HALF_UP over the
    * shortest-decimal value). The BigDecimal formulation Spark itself runs
    * costs a Double.toString per call — jstack'd as the DOMINANT per-pair
    * cost at the 20M-vector corpus, where clusters are replica blobs and
    * nearly every pair qualifies. Fast path: k = ⌊d·10⁴ + 0.5⌋ is exact
    * for |d| ≤ 1 (cosines), and `k / 10000.0` is the same nearest-double
    * as BigDecimal's `.doubleValue()` of the identical decimal k·10⁻⁴.
    * The two can only disagree when d·10⁴ sits within double error of a
    * half-integer — a ±10⁻⁸ band (shortest-decimal repr vs the product's
    * ulp), where the exact BigDecimal path decides. Non-positive d also
    * falls back (⌊·+0.5⌋ is HALF_UP only for positives).
    */
  private[graft] def round4(d: Double): Double = {
    val t = d * 10000.0
    val f = t - math.floor(t)
    if (d <= 0 || math.abs(f - 0.5) < 1e-8)
      java.math.BigDecimal.valueOf(d)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    else math.floor(t + 0.5) / 10000.0
  }

  /** Flat-packed members: ONE contiguous row-major double[] (ragged rows
    * via off/len) instead of m separate heap arrays — the strip-tiled pair
    * loops below get locality by layout, not by TLAB accident. Optionally
    * laid out in vec_id-sorted order so [[stats]]'s "earlier" prefix is a
    * contiguous flat prefix.
    */
  private final class Packed(val ids: Array[Long], val flat: Array[Double],
      val off: Array[Int], val len: Array[Int], val nrms: Array[Double]) {
    def m: Int = ids.length
  }

  /** Unpack a members array into a [[Packed]] — m·d upfront float→double
    * conversions (exact, so folds match [[FloatDotProduct]]) buying pure-
    * FMA pair loops over a single flat array.
    */
  private def unpack(members: ArrayData, sortById: Boolean): Packed = {
    val m = members.numElements()
    val rawIds = new Array[Long](m)
    val fas = new Array[Array[Float]](m)
    val rawNrms = new Array[Double](m)
    var i = 0
    while (i < m) {
      val r = members.getStruct(i, 3)
      rawIds(i) = r.getLong(0)
      fas(i) = r.getArray(1).toFloatArray()
      rawNrms(i) = r.getDouble(2)
      i += 1
    }
    val ord = if (sortById) Array.range(0, m).sortBy(rawIds)
              else Array.range(0, m)
    val ids = new Array[Long](m)
    val nrms = new Array[Double](m)
    val off = new Array[Int](m)
    val len = new Array[Int](m)
    var tot = 0
    i = 0
    while (i < m) {
      val s = ord(i)
      ids(i) = rawIds(s)
      nrms(i) = rawNrms(s)
      off(i) = tot
      len(i) = fas(s).length
      tot += fas(s).length
      i += 1
    }
    val flat = new Array[Double](tot)
    i = 0
    while (i < m) {
      val fa = fas(ord(i))
      val o = off(i)
      var q = 0
      while (q < fa.length) { flat(o + q) = fa(q).toDouble; q += 1 }
      i += 1
    }
    new Packed(ids, flat, off, len, nrms)
  }

  /** Strip width (vectors) such that one strip of embeddings is
    * ~1.5 MB of doubles — L2-resident on any current server core. The
    * pair loops tile over strips so a sub-block never streams from DRAM
    * once per probe row: at dim 64 a 12k-member sub-block was ~6 MB
    * (cache-covered by accident — why the r13 FMA floor held), at dim 768
    * it is ~75 MB and the untiled loop turned 32 cores into a DRAM-
    * bandwidth fight (measured 319.8 s warm vs the ~100-130 s FMA-floor
    * model at 1M × 768-dim). Tiling restores the floor at any width;
    * per-pair arithmetic and rounding are untouched, so results are
    * bit-identical to the untiled loop.
    */
  private def stripLen(p: Packed): Int = {
    val avgDim = math.max(1, if (p.m == 0) 1 else p.flat.length / p.m)
    math.max(32, math.min(8192, 196608 / avgDim)) // 196608 doubles = 1.5 MB
  }

  /** One grid cell's partial stats — see [[SemanticCellStats]]. Diagonal
    * cells delegate to [[stats]] (i<j once); off-diagonal cells score all
    * cross pairs, crediting the higher vec_id.
    */
  def cellStats(ma: ArrayData, mb: ArrayData, diag: Boolean,
      tau: Double): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (diag) return stats(ma, tau)
    val pa = unpack(ma, sortById = false)
    val pb = unpack(mb, sortById = false)
    val na = pa.m
    val nb = pb.m
    val band = tau - 1e-4
    val nEa = new Array[Long](na)
    val mxA = Array.fill(na)(Double.NegativeInfinity)
    val nEb = new Array[Long](nb)
    val mxB = Array.fill(nb)(Double.NegativeInfinity)
    val fA = pa.flat; val offA = pa.off; val lenA = pa.len
    val fB = pb.flat; val offB = pb.off; val lenB = pb.len
    val idsA = pa.ids; val idsB = pb.ids
    val nrmsA = pa.nrms; val nrmsB = pb.nrms
    // Tile the cross product into L2-resident strip pairs (see
    // [[stripLen]]): the outer A-strip stays cached while B-strips stream
    // through it, so DRAM traffic is O(na·nb·dim/S) not O(na·nb·dim).
    val sA = stripLen(pa)
    val sB = stripLen(pb)
    var as0 = 0
    while (as0 < na) {
      val ae = math.min(as0 + sA, na)
      var bs0 = 0
      while (bs0 < nb) {
        val be = math.min(bs0 + sB, nb)
        var i = as0
        while (i < ae) {
          val oi = offA(i)
          val li = lenA(i)
          val ni = nrmsA(i)
          val ida = idsA(i)
          var j = bs0
          while (j < be) {
            val oj = offB(j)
            val n = math.min(li, lenB(j))
            var acc = 0.0
            var k = 0
            while (k < n) { acc += fA(oi + k) * fB(oj + k); k += 1 }
            val cos = acc / (ni * nrmsB(j))
            if (cos >= band) {
              val r = round4(cos)
              if (r >= tau) {
                if (ida < idsB(j)) {
                  nEb(j) += 1L
                  if (r > mxB(j)) mxB(j) = r
                } else {
                  nEa(i) += 1L
                  if (r > mxA(i)) mxA(i) = r
                }
              }
            }
            j += 1
          }
          i += 1
        }
        bs0 += sB
      }
      as0 += sA
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    def emit(ids: Array[Long], ne: Array[Long], mx: Array[Double]): Unit = {
      var p = 0
      while (p < ids.length) {
        if (ne(p) > 0) {
          val row = new GenericInternalRow(3)
          row.setLong(0, ids(p))
          row.setLong(1, ne(p))
          row.setDouble(2, mx(p))
          out += row
        }
        p += 1
      }
    }
    emit(idsA, nEa, mxA)
    emit(idsB, nEb, mxB)
    new GenericArrayData(out.toArray)
  }

  /** Shared by interpreted eval and codegen. Members are sorted by vec_id
    * inside the kernel (cluster collect order is shuffle-dependent), so the
    * result is a pure function of the member SET.
    */
  def stats(members: ArrayData, tau: Double): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // Flat-packed IN vec_id-SORTED ORDER — position pj's "earlier" mates
    // are exactly the flat prefix before pj, and strips of sorted
    // positions are contiguous memory.
    val p = unpack(members, sortById = true)
    val m = p.m
    val flat = p.flat; val off = p.off; val len = p.len
    val nrms = p.nrms
    val band = tau - 1e-4
    val nEarlier = new Array[Long](m) // indexed by sorted position
    val maxCos = Array.fill(m)(Double.NegativeInfinity)
    // Triangular strip tiling (see [[stripLen]]): for each pj-strip, sweep
    // the earlier pi-strips (dense cross blocks) then the strip's own
    // triangle. Per-pair arithmetic/rounding identical to the untiled
    // loop; count/max accumulation is order-free.
    val s = stripLen(p)
    var js0 = 0
    while (js0 < m) {
      val je = math.min(js0 + s, m)
      var is0 = 0
      while (is0 <= js0) {
        val ie = math.min(is0 + s, m)
        var pj = js0
        while (pj < je) {
          val oj = off(pj)
          val lj = len(pj)
          val nj = nrms(pj)
          val hi = if (is0 == js0) pj else ie // triangle on the diagonal strip
          var pi = is0
          while (pi < hi) {
            val oi = off(pi)
            val n = math.min(len(pi), lj)
            var acc = 0.0
            var k = 0
            while (k < n) { acc += flat(oi + k) * flat(oj + k); k += 1 }
            val cos = acc / (nrms(pi) * nj)
            if (cos >= band) {
              val r = round4(cos)
              if (r >= tau) {
                nEarlier(pj) += 1L
                if (r > maxCos(pj)) maxCos(pj) = r
              }
            }
            pi += 1
          }
          pj += 1
        }
        is0 += s
      }
      js0 += s
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var pj = 1
    while (pj < m) {
      if (nEarlier(pj) > 0) {
        val row = new GenericInternalRow(3)
        row.setLong(0, p.ids(pj))
        row.setLong(1, nEarlier(pj))
        row.setDouble(2, maxCos(pj))
        out += row
      }
      pj += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Sign-bit packing for binary quantization: bit i of the result is set
  * iff element `offset + i` of the float array exists, is non-null and is
  * > 0 — exactly the semantics of the literal
  * `when(element_at(e, offset+i+1) > 0f, 1L<<i)` sum it replaces, whose
  * 32-branch expression tree per word dominated the binary-knn scoring
  * map (each branch re-checked array bounds and nullability; measured
  * 0.92 s vs the sibling knns' ~0.2 s at sf0.1). One primitive loop via
  * a static helper shared by interpreted eval and codegen.
  */
case class SignPackWord(child: Expression, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SignPackWord needs array<float>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    SignPackWord.pack(a.asInstanceOf[ArrayData], offset)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignPackWord.pack($a, $offset);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignPackWord {
  def pack(e: ArrayData, offset: Int): Long = {
    val n = e.numElements()
    var acc = 0L
    var i = 0
    while (i < 32) {
      val idx = offset + i
      if (idx < n && !e.isNullAt(idx)) {
        // Spark SQL comparison semantics, not Java's: NaN is greater than
        // any number, so a NaN element sets its bit exactly like the
        // `when(element_at(e, i) > 0f, …)` chain this replaces (Java's
        // `f > 0f` alone would clear it and flip binary codes).
        val f = e.getFloat(idx)
        if (f > 0f || java.lang.Float.isNaN(f)) acc |= (1L << i)
      }
      i += 1
    }
    acc
  }
}
