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
}
