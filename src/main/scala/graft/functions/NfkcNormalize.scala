package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware canonical text normalization — the multilingual form
  * of [[graft.ops.TextAnalysis.normalizeText]] (whose `[a-z0-9 ]`
  * character class normalizes EVERY non-Latin document to the empty
  * string: on a real multilingual crawl, q153-style normalized dedup
  * would then collapse all CJK/Cyrillic/Arabic docs into one
  * "duplicate" cluster and silently delete entire languages — the
  * round-15 review's missing item #2).
  *
  * Pipeline, in order (deterministic, documented so an external
  * engine can replay it on known inputs — q224 does, via
  * construction):
  *
  *  1. NFKC normalization (`java.text.Normalizer`): compatibility
  *     folding — fullwidth forms → ASCII (ａ→a, ０→0, U+3000
  *     ideographic space → space), ligatures (ﬁ→fi), precomposition
  *     of combining sequences. The standard dedup move: trivially
  *     reformatted copies (fullwidth spam, copy-paste ligatures)
  *     land on one normal form.
  *  2. Case fold via `toLowerCase(Locale.ROOT)` — locale-insensitive,
  *     script-preserving.
  *  3. Character filter on the folded code points: letters and digits
  *     of ANY script are kept (`Character.isLetterOrDigit`, the
  *     `\p{L}\p{N}` classes); combining marks are DROPPED IN PLACE
  *     (not turned into separators — "İstanbul" case-folds to
  *     i + U+0307, and splitting on the stray mark would tear the
  *     word); everything else becomes a separator.
  *  4. Separator runs collapse to one ASCII space; ends trimmed.
  *
  * On pure `[a-z0-9 ]` input the result is byte-identical to
  * [[graft.ops.TextAnalysis.normalizeText]] (steps 1–2 are no-ops and
  * steps 3–4 degenerate to its regex pair) — so the Latin-only oracle
  * replays are unaffected and the unicode form is a strict widening.
  *
  * Implementation note: normalization is inherently allocating (NFKC
  * can change lengths), so unlike the zero-copy scanners
  * ([[TokensInSet]]) this round-trips through java.lang.String — one
  * codegen'd static call per row, no interpreted lambdas, no UDF
  * registry. Unicode tables come from the pinned JDK (Java 17);
  * normalization output is stable for a given JDK major, which the
  * engine's environment pins. */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfkc_normalize requires string, got $t")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfkcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfkcNormalize.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

object NfkcNormalize {
  /** Static implementation shared by interpreted eval and codegen. */
  def compute(s: UTF8String): UTF8String = {
    val nfkc = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC)
    val folded = nfkc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(folded.length)
    var i = 0
    var pendingSep = false
    while (i < folded.length) {
      val cp = folded.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) {
        if (pendingSep && sb.length > 0) sb.append(' ')
        sb.appendCodePoint(cp)
        pendingSep = false
      } else {
        val t = Character.getType(cp)
        val mark = t == Character.NON_SPACING_MARK ||
          t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK
        // marks vanish in place; everything else separates
        if (!mark) pendingSep = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
