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

/** Cross-engine-replayable SimHash: the same sign-aggregation as
  * [[SimHash64]], but the per-token hash is the top 60 bits of the
  * token's MD5 (the [[RollingFingerprintMd5]] construction) and the
  * vote/fingerprint domain is 60 bits — every quantity stays in
  * [0, 2^60), so an external engine replays the exact aggregation with
  * plain signed-64-bit arithmetic: per bit b, the bit is set iff
  * strictly more tokens have bit b set than clear
  * (`2·|{h : (h>>b)&1=1}| > n_tokens`), which DuckDB states directly —
  * q26's oracle proves the expression end-to-end. Still one fused scan
  * per document on the Spark side; MD5 is ~3× slower per token than
  * xxhash64, so keep [[SimHash64]] for pipelines that don't need
  * external replay (the banded near-dup operators use it). */
case class SimHash64Md5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64_md5 requires string, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64_md5"

  override def nullSafeEval(input: Any): Any =
    SimHash64Md5.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64Md5.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5 =
    copy(child = newChild)
}

object SimHash64Md5 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static implementation shared by interpreted eval and codegen:
    * one pass over the UTF-8 bytes; per token, MD5 top-60-bit hash
    * casting ±1 votes on 60 bit positions; sign of each total becomes
    * that fingerprint bit. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val md = md5.get()
    val n = bytes.length
    val votes = new Array[Int](60)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // value of the first 15 hex digits = big-endian first 8 bytes >>> 4
        var top = 0L
        var j = 0
        while (j < 8) { top = (top << 8) | (d(j) & 0xFFL); j += 1 }
        val h = top >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
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
