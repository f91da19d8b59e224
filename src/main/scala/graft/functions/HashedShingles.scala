package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashed word-k-gram shingler: text → distinct 64-bit k-gram
  * hashes in one pass, with zero intermediate strings.
  *
  * Pipeline per row: scan the UTF-8 bytes once, hash each
  * space-delimited token span in place (XXH64 over the byte window —
  * no substring allocation), then combine each k-token window of token
  * hashes with a rolling hashLong fold, deduplicating into the output.
  *
  * Replaces the HOF chain `array_distinct(transform(seq, i ->
  * xxhash64(concat_ws(' ', slice(tokens, i, k)))))`, which allocates a
  * string per window position per row and runs interpreted.
  */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hashed_shingles requires string, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashedShingles.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  private final val TokenSeed = 0x9747b28cL
  private final val GramSeed = 0x85ebca6bL

  /** Static implementation shared by interpreted eval and codegen. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    // pass 1: hash token byte-spans in place
    var tokenHashes = new Array[Long](math.max(8, n / 4))
    var nTokens = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        if (nTokens == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTokens * 2)
        }
        tokenHashes(nTokens) =
          XXH64.hashUnsafeBytes(base, offset + start, i - start, TokenSeed)
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    // pass 2: rolling k-window combine + dedup
    val nGrams = nTokens - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var m = 0
    var g = 0
    while (g < nGrams) {
      var acc = GramSeed
      var j = 0
      while (j < k) {
        acc = XXH64.hashLong(tokenHashes(g + j), acc)
        j += 1
      }
      if (seen.add(acc)) {
        out(m) = acc
        m += 1
      }
      g += 1
    }
    new GenericArrayData(
      if (m == nGrams) out else java.util.Arrays.copyOf(out, m))
  }
}
