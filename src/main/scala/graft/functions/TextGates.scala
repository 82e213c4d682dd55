package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The clean-corpus gate columns — quality score, language guess, token
  * count — as ONE compiled pass per document instead of a forest of
  * higher-order-function lambdas.
  *
  * Why: transform/filter/array_distinct lambdas are never whole-stage
  * codegen'd and allocate per call (the round-5 bench lesson); at 5M docs
  * the gate projection measured ~25 s of pipeline_clean_corpus's ~26 s —
  * ~5 µs/doc of interpreted lambda machinery for work that is one string
  * walk. This expression evaluates the SAME definitions in one pass.
  *
  * Parity with the Column formulation (Text.scoreCol / Text.guessCol /
  * size(Text.toks)) is EXACT by construction, not by reimplementation:
  * - tokenization calls the same UTF8String.toLowerCase → .trim() the
  *   `lower`/`trim` expressions call, then the same `\s+` Java-regex
  *   split with limit -1 that `split` uses;
  * - distinct token count uses String equality (= UTF8String equality on
  *   well-formed input);
  * - the punctuation count equals numChars(text) − numChars(text without
  *   [.,;:!?]) — those are single ASCII bytes, and ASCII bytes never
  *   occur inside multi-byte UTF-8 sequences, so a byte scan is exact;
  * - double math replays the Column tree's association order
  *   0.4·uniq + 0.4·(1−stop) + 0.2·(1−punct), and the 4-decimal round is
  *   [[SemanticPairStats.round4]] (spec-pinned equal to Spark's Round);
  * - the guess replays the same greatest + when-chain tie-break
  *   (en > de > es > fr > zh, 'und' on all-zero).
  * A spec compares every (score, guess, n_tokens) against the Column
  * formulation over the test corpus.
  */
case class TextGates(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("guess", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"TextGates needs string, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    TextGates.gates(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextGates.gates($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextGates {
  private val Ws = java.util.regex.Pattern.compile("\\s+")
  // THE stopword profiles — single definition site, referenced by the
  // Column formulation too (Text.guessCol / Text.StopEn build their Seqs
  // from these), so the two sides cannot drift; the parity spec pins the
  // outputs on top.
  private[graft] val StopEn = Array("the", "a", "and", "of", "is")
  private[graft] val StopDe = Array("der", "die", "und", "das", "ist")
  private[graft] val StopEs = Array("el", "los", "las", "y", "es")
  private[graft] val StopFr = Array("le", "la", "et", "les", "des")
  private[graft] val StopZh = Array("de", "shi", "le", "bu", "wo")
  private val En = StopEn
  private val De = StopDe
  private val Es = StopEs
  private val Fr = StopFr
  private val Zh = StopZh
  private val Guesses =
    Array("en", "de", "es", "fr", "zh").map(UTF8String.fromString)
  private val Und = UTF8String.fromString("und")

  private def countOf(tok: String, ws: Array[String]): Int = {
    var i = 0
    while (i < ws.length) { if (ws(i) == tok) return 1; i += 1 }
    0
  }

  /** Shared by interpreted eval and codegen. */
  def gates(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // Same call chain as lower() -> trim() -> split(_, "\s+", -1).
    val toks = Ws.split(text.toLowerCase.trim().toString, -1)
    val nTokI = toks.length
    val distinct = new java.util.HashSet[String]()
    var sEn = 0; var sDe = 0; var sEs = 0; var sFr = 0; var sZh = 0
    var i = 0
    while (i < nTokI) {
      val tok = toks(i)
      distinct.add(tok)
      // Each profile counts a token AT MOST once per occurrence (isin),
      // and a token can score several languages (e.g. "de", "le").
      sEn += countOf(tok, En); sDe += countOf(tok, De); sEs += countOf(tok, Es)
      sFr += countOf(tok, Fr); sZh += countOf(tok, Zh)
      i += 1
    }
    // Punctuation: occurrences of the six ASCII gate chars, counted in
    // bytes (exact — ASCII never appears inside multi-byte sequences).
    val bytes = text.getBytes
    var punctI = 0
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
        punctI += 1
      i += 1
    }
    val nChars = text.numChars().toDouble
    val nTok = nTokI.toDouble
    val uniq = distinct.size().toDouble / nTok
    val stop = sEn.toDouble / nTok
    // Zero-length text: DELIBERATE punct=0 (no characters, no
    // punctuation) rather than 0/0 NaN propagation. The Column chain has
    // no defined value there (its ANSI division throws), so the kernel's
    // totality on empty docs is an extension, not a divergence — the
    // gated corpora all carry n_chars > 0 (spec-pinned contract).
    val punct = if (nChars == 0.0) 0.0 else punctI.toDouble / nChars
    val score = SemanticPairStats.round4(
      0.4 * uniq + 0.4 * (1.0 - stop) + 0.2 * (1.0 - punct))
    val mx = math.max(sEn, math.max(sDe, math.max(sEs, math.max(sFr, sZh))))
    val guess =
      if (mx == 0) Und
      else if (sEn == mx) Guesses(0)
      else if (sDe == mx) Guesses(1)
      else if (sEs == mx) Guesses(2)
      else if (sFr == mx) Guesses(3)
      else Guesses(4)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    row.setDouble(0, score)
    row.update(1, guess)
    row.setLong(2, nTokI.toLong)
    row
  }
}
