package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram kernels for [[graft.operators.Text.ngramFreq]] — one
  * compiled string walk per document replacing the interpreted
  * tokenize→transform(sequence)→concat_ws→explode HOF chain (which
  * re-evaluated per gram POSITION and was the 5M-doc suite ceiling: the
  * two corpus-wide gram passes cost ~2×16 s of pure lambda machinery).
  *
  * Parity contract (spec-pinned against the Column formulation):
  * - tokenization is the same call chain as `split(trim(lower(text)),
  *   "\s+")`: UTF8String.toLowerCase → .trim() → Java-regex split with
  *   limit −1 (the [[TextGates]] pattern);
  * - a gram's BYTES are tok(i) ++ ' ' ++ … ++ tok(i+n−1) — exactly the
  *   UTF-8 bytes `concat_ws(" ", …)` produces, each token encoded once
  *   (not once per covering gram);
  * - [[WordGramHashes]] emits `XXH64.hashUnsafeBytes(gramBytes, seed=42)`,
  *   bit-identical to `xxhash64(gram)` on the concat_ws column (the same
  *   core the XxHash64 expression calls on a UTF8String's bytes).
  *
  * Three views over the one walk:
  * - [[WordGramHashes]] → `array<bigint>`: phase-1 counting — no gram
  *   STRING ever materializes, the exchange carries 8-byte codes;
  * - [[WordGramHits]] → `array<string>`: phase-2 winner recount — only
  *   grams whose hash is in the (driver-collected, bounded) winner set
  *   materialize as strings;
  * - [[WordGrams]] → `array<string>`: the exact single-phase fallback for
  *   tiny/degenerate corpora where the two-phase floor is not a safe gate.
  */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordGramHashes needs a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramUtil.gramHashes(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramUtil.gramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All word n-grams of `child` as strings — the exact-count fallback path. */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordGrams needs a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramUtil.grams(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramUtil.grams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The word n-grams of `child` whose xxhash64 code is in `winners` — the
  * phase-2 winner filter fused into the gram walk: hash each gram in the
  * reused byte buffer, binary-search the sorted winner array, and only
  * materialize a string on a hit. `winners` is a Seq (not Array) so the
  * case-class equality Catalyst uses for plan canonicalization compares by
  * VALUE; the sorted primitive array is derived once per (driver/executor)
  * instance and shipped to codegen as a reference object.
  */
case class WordGramHits(child: Expression, n: Int, winners: Seq[Long])
    extends UnaryExpression {

  @transient private lazy val sorted: Array[Long] = {
    val a = winners.toArray
    java.util.Arrays.sort(a)
    a
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordGramHits needs a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramUtil.gramHits(input.asInstanceOf[UTF8String], n, sorted)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnerHashes", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramUtil.gramHits($c, $n, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document distinct tokens with in-doc occurrence counts, as
  * `array<struct<tok: string, c: bigint>>` — the grain-collapse behind
  * [[graft.operators.Text.rarityScore]] in one compiled walk. Replaces the
  * interpreted array_sort → run-starts filter → transform(sequence) chain
  * (three HOF lambdas per doc, never codegen'd — the residual cold-path
  * cost after the round-11 grain reshape). The (tok, c) multiset is
  * identical to the sorted-runs formulation; emission order is first
  * occurrence (order is irrelevant — the frame feeds only aggregations).
  */
case class TokenRuns(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tok", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"TokenRuns needs a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramUtil.tokenRuns(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramUtil.tokenRuns($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document rarity statistics with the corpus vocabulary FUSED into
  * the scan — `struct<n_toks: bigint, rarity_sum: bigint>` where
  * rarity_sum = Σ over token positions of (N DIV cnt(tok)), the
  * integer-rarity sum [[graft.operators.Text.rarityScore]] defines.
  *
  * `vocabTokens(i) → rarity(i)` is the driver-collected (bounded,
  * cap-guarded by the caller) durable unigram vocab with N DIV cnt
  * PRE-divided per entry; the kernel is then one tokenizer pass + one
  * hash probe per position — no distinct-(doc, tok) explode, no join, no
  * corpus-sized executor cache at query time. Tokens absent from the map
  * contribute to neither sum, replaying the join route's inner-join
  * semantics exactly (with the vocab built from the same corpus, every
  * token hits).
  */
case class RarityStats(child: Expression, vocab: VocabTable)
    extends UnaryExpression {

  @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.tokens.length * 2)
    var i = 0
    while (i < vocab.tokens.length) { m.put(vocab.tokens(i), vocab.rarities(i)); i += 1 }
    m
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_toks", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("rarity_sum", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"RarityStats needs a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramUtil.rarityStats(input.asInstanceOf[UTF8String], map)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rarityMap", map, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramUtil.rarityStats($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Identity-equality holder for a driver-built vocab table embedded in
  * [[RarityStats]]. A ~10⁵-entry Seq as a case-class field would be
  * walked by every Catalyst transform / canonicalization / semanticEquals
  * pass during planning (measured: tens of seconds of pure planner
  * overhead at a 92k vocab); identity equality makes those O(1). Two
  * separately-collected vocabs therefore never canonicalize equal — at
  * worst a missed exchange-reuse between two queries built in the same
  * session, never a correctness issue.
  */
final class VocabTable(val tokens: Array[String], val rarities: Array[Long])
    extends Serializable {
  override def hashCode: Int = System.identityHashCode(this)
  override def equals(o: Any): Boolean = o match {
    case r: AnyRef => r eq this
    case _ => false
  }
}

/** Compiled kernel shared by the gram/token expressions — plain object so
  * the generated Java calls static forwarders and each loop stays one
  * JIT-compiled method inside whole-stage codegen.
  */
object WordGramUtil {
  /** Same tokenizer call chain as `split(trim(lower(text)), "\s+")` — and
    * as [[TextGates]]'s: keep the three in sync (the parity specs pin it).
    */
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  /** xxhash64()'s fixed seed. */
  private val Seed = 42L
  private val EmptyLongs = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
  private val EmptyStrings = new GenericArrayData(Array.empty[Any])

  def tokens(text: UTF8String): Array[String] =
    Ws.split(text.toLowerCase.trim().toString, -1)

  /** UTF-8 bytes per token, encoded once (a token is covered by up to n
    * grams; re-encoding per gram would triple the walk's allocation).
    */
  private def encode(toks: Array[String]): Array[Array[Byte]] = {
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    tb
  }

  /** Longest gram in bytes (sliding-window sum), sizing the reusable
    * assembly buffer. Precondition: tb.length >= n.
    */
  private def maxGramBytes(tb: Array[Array[Byte]], n: Int): Int = {
    var s = n - 1
    var i = 0
    while (i < n) { s += tb(i).length; i += 1 }
    var best = s
    var g = 1
    while (g + n - 1 < tb.length) {
      s += tb(g + n - 1).length - tb(g - 1).length
      if (s > best) best = s
      g += 1
    }
    best
  }

  /** Write gram g's bytes (tokens joined by ' ') into buf; returns length. */
  private def fillGram(tb: Array[Array[Byte]], g: Int, n: Int,
      buf: Array[Byte]): Int = {
    var len = 0
    var j = 0
    while (j < n) {
      if (j > 0) { buf(len) = ' '; len += 1 }
      val b = tb(g + j)
      System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
      j += 1
    }
    len
  }

  def gramHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val nG = toks.length - n + 1
    if (nG <= 0) return EmptyLongs
    val tb = encode(toks)
    val buf = new Array[Byte](maxGramBytes(tb, n))
    val out = new Array[Long](nG)
    var g = 0
    while (g < nG) {
      val len = fillGram(tb, g, n, buf)
      out(g) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def grams(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val nG = toks.length - n + 1
    if (nG <= 0) return EmptyStrings
    val tb = encode(toks)
    val buf = new Array[Byte](maxGramBytes(tb, n))
    val out = new Array[Any](nG)
    var g = 0
    while (g < nG) {
      val len = fillGram(tb, g, n, buf)
      out(g) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len))
      g += 1
    }
    new GenericArrayData(out)
  }

  def tokenRuns(text: UTF8String): ArrayData = {
    val toks = tokens(text)
    // First-occurrence-ordered counts; docs are small (~10²-10³ tokens),
    // the boxed merge is noise next to the regex split.
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val prev = m.get(t)
      m.put(t, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      row.update(0, UTF8String.fromString(e.getKey))
      row.setLong(1, e.getValue)
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  def rarityStats(text: UTF8String,
      map: java.util.HashMap[String, java.lang.Long])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokens(text)
    var n = 0L
    var s = 0L
    var i = 0
    while (i < toks.length) {
      val r = map.get(toks(i))
      if (r != null) { n += 1L; s += r.longValue() }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.setLong(0, n)
    row.setLong(1, s)
    row
  }

  def gramHits(text: UTF8String, n: Int, sortedWinners: Array[Long]): ArrayData = {
    val toks = tokens(text)
    val nG = toks.length - n + 1
    if (nG <= 0) return EmptyStrings
    val tb = encode(toks)
    val buf = new Array[Byte](maxGramBytes(tb, n))
    var hits: java.util.ArrayList[Any] = null
    var g = 0
    while (g < nG) {
      val len = fillGram(tb, g, n, buf)
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      if (java.util.Arrays.binarySearch(sortedWinners, h) >= 0) {
        if (hits == null) hits = new java.util.ArrayList[Any]()
        hits.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, len)))
      }
      g += 1
    }
    if (hits == null) EmptyStrings
    else new GenericArrayData(hits.toArray)
  }
}
