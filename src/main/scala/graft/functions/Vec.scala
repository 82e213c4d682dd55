package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` columns as codegen'd higher-order
  * functions (`zip_with`/`aggregate`) — no UDFs, so the expressions stay
  * inside whole-stage codegen and Catalyst can see through them.
  *
  * All arithmetic is forced to Double BEFORE accumulation: the oracle
  * (DuckDB) folds lists left-to-right in double too, so results agree to the
  * last bit modulo round(_, 4) on the comparison surface. Summation is the
  * sequential left fold over the array — same order on both engines.
  *
  * Mirrors the query surface of a Milvus collection's vector field
  * (reference: the system milvus-cdc replicates; its search semantics are
  * cosine/IP top-k and range search).
  */
object Vec {
  import org.apache.spark.sql.GraftSql

  /** Sequential left-fold sum of an array<double> expression. */
  private def asum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product in double — native codegen'd loop ([[FloatDotProduct]]);
    * identical fold order (and therefore bits) as [[dotHof]].
    */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(FloatDotProduct(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** HOF formulation of [[dot]] — kept as the cross-check baseline. */
  def dotHof(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm in double. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed norms — avoids recomputing norms inside an
    * N×M score loop (the norm is computed once per row, not once per pair).
    */
  def cosinePrenorm(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Nearest-centroid id by cosine (ties → smallest cid) over a centroid
    * set baked into the expression — the IVF index-build assignment as one
    * codegen'd loop; scales to k-means-sized nlist where a literal
    * `greatest(struct(...))` tree cannot ([[NearestCentroid]]).
    * `cents` must be sorted ascending by cid.
    */
  def nearestCentroid(e: Column, nrm: Column,
      cents: Array[(Long, Array[Float], Double)]): Column =
    GraftSql.column(NearestCentroid(
      GraftSql.expression(e), GraftSql.expression(nrm),
      cents.map(_._1), cents.map(_._2), cents.map(_._3)))

  /** Two-level nearest-centroid: coarse cells built once on the driver
    * ([[NearestCentroid.coarseCells]]), per-row assignment probes only the
    * `probe` best cells' centroid subsets ([[NearestCentroidCoarse]]) —
    * the O(n·√k·d) IVF-build assignment for k-means-scale nlist.
    * `cents` must be sorted ascending by cid.
    */
  def nearestCentroidCoarse(e: Column, nrm: Column,
      cents: Array[(Long, Array[Float], Double)],
      nCells: Int, probe: Int): Column = {
    val (cmeans, cmnorms, members) =
      NearestCentroid.coarseCells(cents.map(_._2), cents.map(_._3), nCells)
    GraftSql.column(NearestCentroidCoarse(
      GraftSql.expression(e), GraftSql.expression(nrm),
      cmeans, cmnorms, members, probe,
      cents.map(_._1), cents.map(_._2), cents.map(_._3)))
  }

  /** Per-cluster SemDeDup duplicate stats over a collect_list'd member
    * array `array<struct<vec_id, embedding, nrm>>` — the within-cluster
    * all-pairs scoring as ONE primitive-loop kernel instead of a pair
    * join ([[SemanticPairStats]]).
    */
  def semanticPairStats(members: Column, tau: Double): Column =
    GraftSql.column(SemanticPairStats(GraftSql.expression(members), tau))

  def semanticCellStats(msa: Column, msb: Column, diag: Column,
      tau: Double): Column =
    GraftSql.column(SemanticCellStats(GraftSql.expression(msa),
      GraftSql.expression(msb), GraftSql.expression(diag), tau))

  /** 32 sign bits of `e[offset .. offset+31]` packed into a long —
    * binary quantization's word builder as one codegen'd loop
    * ([[SignPackWord]]) instead of a 32-branch `when(element_at…)` tree.
    */
  def signPackWord(e: Column, offset: Int): Column =
    GraftSql.column(SignPackWord(GraftSql.expression(e), offset))
}
