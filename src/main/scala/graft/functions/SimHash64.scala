package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 64-bit SimHash: text → fingerprint in one byte scan.
  *
  * Semantics are EXACTLY the HOF formulation it replaces
  * ([[graft.ops.Dedup.simhash64Hof]], property-tested bit-identical):
  * tokens are the `split(text, " ")` spans (empty spans from leading /
  * consecutive / trailing spaces included — limit -1 semantics), each
  * token's xxhash64 (seed 42, the `xxhash64()` SQL function) casts 64
  * ±1 bit votes, and the sign of each bit's total becomes that bit of
  * the fingerprint (strictly-positive vote → 1, else 0).
  *
  * The HOF path runs an interpreted lambda per token × 64 bits and
  * allocates the token array plus a 64-long accumulator array per row;
  * this expression is a single zero-copy scan over the UTF-8 bytes
  * (token spans hashed in place, votes in one stack array) inside
  * whole-stage codegen — the same fusion the engine applies to every
  * other per-row hot loop (TokensInSet, NgramsInSet, HashedShingles,
  * SortedIntersectCount).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires string, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Seed of the SQL `xxhash64()` function — the HOF path hashes each
    * token with it, so the fused path must too. */
  private final val XxHashSeed = 42L

  /** Static implementation shared by interpreted eval and codegen. */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, XxHashSeed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
