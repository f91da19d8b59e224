package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused content-defined-chunking boundary scan: the 1-based token
  * positions that OPEN a chunk (position 1, plus every token whose
  * md5-top-60-bit hash ≡ 0 mod `targetTokens`) in one zero-copy pass
  * over the UTF-8 bytes.
  *
  * The HOF formulation ([[graft.ops.TextAnalysis.cdcStartsHof]] —
  * `filter(sequence(1, n), i => md5(element_at(toks, i)) … )`) runs an
  * interpreted lambda computing an md5 PER TOKEN per row and
  * materializes the token array — the exact hot-loop pattern the
  * engine fuses everywhere else ([[SimHash64Md5]], [[RollingFingerprint]]
  * et al.); it is kept only as the bit-identity property-test twin.
  * Token spans are the `split(text, " ")` spans (limit -1 semantics —
  * empty tokens from leading/consecutive/trailing spaces included),
  * and the hash is the md5-prefix construction (top 60 bits — the
  * first 15 hex digits), so the boundary set replays in an external
  * engine (q146/q147's oracles).
  */
case class CdcChunkStarts(child: Expression, targetTokens: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if targetTokens > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"cdc_chunk_starts requires targetTokens > 0, got $targetTokens")
      case t => TypeCheckResult.TypeCheckFailure(
        s"cdc_chunk_starts requires string, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_chunk_starts"

  override def nullSafeEval(input: Any): Any =
    CdcChunkStarts.compute(input.asInstanceOf[UTF8String], targetTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CdcChunkStarts.compute($a, $targetTokens);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunkStarts = copy(child = newChild)
}

object CdcChunkStarts {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static implementation shared by interpreted eval and codegen. */
  def compute(s: UTF8String, targetTokens: Int): GenericArrayData = {
    val bytes = s.getBytes
    val md = md5.get()
    val n = bytes.length
    val starts = new java.util.ArrayList[Integer]()
    var tokenIdx = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        tokenIdx += 1
        if (tokenIdx == 1) starts.add(1)
        else {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          var top = 0L
          var j = 0
          while (j < 8) { top = (top << 8) | (d(j) & 0xFFL); j += 1 }
          val h = top >>> 4 // value of the first 15 hex digits
          if (h % targetTokens == 0) starts.add(tokenIdx)
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Int](starts.size())
    var k = 0
    while (k < out.length) { out(k) = starts.get(k); k += 1 }
    new GenericArrayData(out)
  }
}
