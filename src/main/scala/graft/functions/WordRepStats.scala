package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-scan word-repetition statistics of a text column —
  * struct(n_toks, n_distinct, top_cnt, nb, nbd), all long:
  *
  *  - n_toks     = size(split(text, ' ', -1))       (spans incl. empty)
  *  - n_distinct = size(array_distinct(tokens))
  *  - top_cnt    = max token multiplicity
  *  - nb         = word-bigram count = max(n_toks - 1, 0)
  *  - nbd        = distinct word-bigram count, where a bigram is
  *                 `concat_ws(' ', t(i), t(i+1))` —
  *
  * semantically identical to the HOF/built-in chain over
  * `split(text, ' ')` ([[graft.ops.Curation.repetitionSignalCols]]'s
  * former body), which paid: a per-row `sort_array` + an INTERPRETED
  * `aggregate` lambda walk for top_cnt (lambda bodies are never
  * whole-stage-codegen'd), two `transform` lambdas building bigram
  * STRINGS (one UTF8String concat allocation per bigram) and an
  * `array_distinct` over them. This expression scans the UTF-8 bytes
  * once: token counting over zero-copy `UTF8String` views
  * (`fromAddress` — no byte copies), and the bigram trick that because
  * tokens are single-space-separated spans of the ORIGINAL bytes, the
  * bigram string `t(i) + ' ' + t(i+1)` is byte-identical to the
  * contiguous source span from t(i)'s start to t(i+1)'s end — distinct
  * bigrams are distinct source spans, no concatenation ever
  * materializes. Exact integer outputs, bit-identical to the built-in
  * chain (CurationSpec pins the equality on the hand-checked corpus).
  */
case class WordRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_rep_stats requires string, got $t")
    }

  override def dataType: DataType = WordRepStats.Schema

  override def prettyName: String = "word_rep_stats"

  override def nullSafeEval(input: Any): Any =
    WordRepStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordRepStats.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): WordRepStats = copy(child = newChild)
}

object WordRepStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("nb", LongType, nullable = false),
    StructField("nbd", LongType, nullable = false)))

  /** Static implementation shared by interpreted eval and codegen.
    * Token spans split on single spaces exactly like
    * `split(text, ' ', -1)`: empty spans are tokens (a doc of "" is
    * one empty token; "a  b" is ["a", "", "b"]). */
  def compute(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // token span boundaries: starts(i) .. ends(i), byte offsets
    var nToks = 0
    val tokCounts = new java.util.HashMap[UTF8String, Array[Int]]()
    var topCnt = 0L
    // previous token's start — a bigram is the source span
    // prevStart .. current token's end
    var prevStart = -1
    var nbd: java.util.HashSet[UTF8String] = null
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        nToks += 1
        val tok = UTF8String.fromAddress(base, off + start, i - start)
        var c = tokCounts.get(tok)
        if (c == null) { c = Array(0); tokCounts.put(tok, c) }
        c(0) += 1
        if (c(0) > topCnt) topCnt = c(0)
        if (prevStart >= 0) {
          if (nbd == null) nbd = new java.util.HashSet[UTF8String]()
          nbd.add(UTF8String.fromAddress(base, off + prevStart,
            i - prevStart))
          ()
        }
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nToks.toLong, tokCounts.size.toLong, topCnt,
      math.max(nToks - 1, 0).toLong,
      (if (nbd == null) 0 else nbd.size).toLong))
  }
}
