package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Fused marker-word counter: the number of whitespace tokens equal to
  * any word of a small fixed set — semantically identical to
  * `size(filter(split(text, ' '), t => t.isin(words: _*)))`, which
  * runs an interpreted lambda per token and allocates a UTF8String per
  * token. This expression scans the UTF-8 bytes once and compares each
  * token span in place against the precompiled word bytes (length
  * first) — zero allocation, inside whole-stage codegen.
  *
  * The hot loop of the quality/language-ID heuristics
  * ([[graft.ops.TextAnalysis]]): stopword ratios and per-language
  * marker scores are all tokens-in-set counts.
  */
case class TokensInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty && words.forall(_.nonEmpty),
    "words must be a non-empty set of non-empty strings")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"tokens_in_set requires string, got $t")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "tokens_in_set"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    TokensInSet.compute(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("tokensInSetWords", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokensInSet.compute($a, $wordsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensInSet =
    copy(child = newChild)
}

object TokensInSet {
  /** Static implementation shared by interpreted eval and codegen.
    * Token spans are split on single spaces exactly like
    * `split(text, ' ')` with limit -1 (empty spans kept — they can
    * never match a non-empty word). */
  def compute(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var count = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var w = 0
          var matched = false
          while (!matched && w < words.length) {
            val wb = words(w)
            if (wb.length == len &&
              ByteArrayMethods.arrayEquals(base, offset + start,
                wb, Platform.BYTE_ARRAY_OFFSET, len)) {
              matched = true
            }
            w += 1
          }
          if (matched) count += 1
        }
        start = i + 1
      }
      i += 1
    }
    count
  }
}
