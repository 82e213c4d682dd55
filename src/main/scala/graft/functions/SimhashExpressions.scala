package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the 62-bit SimHash (Charikar, STOC 2002)
  * of a document's DISTINCT gram-hash set (each gram already reduced mod
  * 2²⁵, see [[graft.operators.Dedup.simhashBitConst]]).
  *
  * Semantics are bit-identical to the aggregated formulation the DuckDB
  * oracle restates — bit i of gram g is the top bit of (g·C_i mod 2²⁵),
  * fingerprint bit i set iff ones_i · 2 > n — but the cost model is
  * transformed: the aggregate version explodes every gram instance and
  * shuffles 62 conditional-count buffers per doc through a hash
  * aggregation (26M rows × 63 buffers at 500k docs), while this expression
  * computes the fingerprint in one compiled pass over the doc's gram array
  * — a NARROW MAP, no exchange anywhere in the fingerprint stage. At
  * 100 TB the fingerprint runs at scan speed and only the 4-chunk
  * pigeonhole bucket join shuffles (fingerprint-sized rows, not grams).
  *
  * All products stay ≤ 2⁵⁰ (both factors < 2²⁵), and the modulus is a
  * power of two, so `& (2²⁵−1)` is the exact congruence.
  */
case class SimhashFingerprint(child: Expression, bits: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SimhashFingerprint needs array<bigint> input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashFingerprint.fingerprint(input.asInstanceOf[ArrayData], bits, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashFingerprint.fingerprint($c, $bits, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashFingerprint {
  /** Bit-constant arrays memoized per (bits, mod): they are invariant
    * across rows, and recomputing the 62-entry family in the hot
    * fingerprint map billed 62 multiply-mods + an allocation to every
    * row. One lock-free lookup replaces them.
    */
  private val csCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()
  private def csFor(bits: Int, mod: Long): Array[Long] =
    csCache.computeIfAbsent((bits, mod), { case (b, m) =>
      Array.tabulate(b)(i => ((2654435761L * (i + 1)) % m) | 1L)
    })

  /** Shared by interpreted eval and codegen. The bit constants are the
    * same multiplicative family as the oracle:
    * C_i = ((2654435761·(i+1)) mod 2²⁵) | 1.
    */
  def fingerprint(gs: ArrayData, bits: Int, mod: Long): Long = {
    val mask = mod - 1L
    val half = mod >> 1
    val n = gs.numElements()
    val ones = new Array[Int](bits)
    val cs = csFor(bits, mod)
    var i = 0
    var j = 0
    while (j < n) {
      val g = gs.getLong(j)
      i = 0
      while (i < bits) {
        if (((g * cs(i)) & mask) >= half) ones(i) += 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    i = 0
    while (i < bits) {
      if (2L * ones(i) > n) fp |= 1L << i
      i += 1
    }
    fp
  }
}
