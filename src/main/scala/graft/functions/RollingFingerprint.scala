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
