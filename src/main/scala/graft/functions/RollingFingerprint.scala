package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused order-sensitive rolling document fingerprint: rotate-left-5
  * XOR accumulation of per-token xxhash64 values in one byte scan —
  * semantically identical to the HOF formulation
  * ([[graft.ops.TextAnalysis.fingerprintHof]]:
  * `aggregate(split(text,' '), 0L, (acc, t) => (acc << 5) ^
  * (acc >>> 59) ^ xxhash64(t))`), which allocates the token array and
  * runs an interpreted lambda per token. Tokens are the
  * `split(text, " ")` spans (limit -1 — empty spans from leading /
  * consecutive / trailing spaces included); each token hashes with the
  * SQL `xxhash64()` seed. Completes the engine's rule that every
  * per-row text hot loop is a fused codegen expression.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint requires string, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingFingerprint.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint = copy(child = newChild)
}

object RollingFingerprint {
  private final val XxHashSeed = 42L

  /** Static implementation shared by interpreted eval and codegen. */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, XxHashSeed)
        acc = (acc << 5) ^ (acc >>> 59) ^ h
        start = i + 1
      }
      i += 1
    }
    acc
  }
}

/** Cross-engine-replayable rolling fingerprint: the same one-scan
  * rotate-XOR fold as [[RollingFingerprint]], but the per-token hash
  * is the top 60 bits of the token's MD5 (the value of the first 15
  * hex digits — q109's md5-uniform construction) and the fold runs in
  * a 60-bit domain (`acc' = rotl60(acc, 5) XOR h`). Every quantity
  * stays in [0, 2^60), so an external engine replays the fold with
  * plain signed-64-bit ops and no overflow:
  * DuckDB `list_reduce(list_prepend(0, list_transform(string_split(
  * text,' '), t -> CAST('0x'||substring(md5(t),1,15) AS BIGINT))),
  * (acc,h) -> xor(((acc & 2^55-1) << 5) | (acc >> 55), h))` — which is
  * how q28's oracle proves the expression end-to-end. MD5 is ~3×
  * slower per token than xxhash64; keep [[RollingFingerprint]] for
  * pipelines that don't need external replay. */
case class RollingFingerprintMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint_md5 requires string, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_fingerprint_md5"

  override def nullSafeEval(input: Any): Any =
    RollingFingerprintMd5.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingFingerprintMd5.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprintMd5 = copy(child = newChild)
}

object RollingFingerprintMd5 {
  private final val Mask55 = (1L << 55) - 1

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static implementation shared by interpreted eval and codegen:
    * one pass over the UTF-8 bytes; per token, MD5 of the token's
    * bytes, top 60 bits as the hash, rotl5-XOR in the 60-bit domain. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val md = md5.get()
    val n = bytes.length
    var acc = 0L
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
        acc = (((acc & Mask55) << 5) | (acc >>> 55)) ^ h
        start = i + 1
      }
      i += 1
    }
    acc
  }
}
