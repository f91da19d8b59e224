package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the number of POSITIONS at which two
  * `array<long>` minhash signatures agree — the numerator of the
  * standard MinHash Jaccard estimator (agreement / numHashes).
  *
  * Rationale (scale/perf): this is the verification hot loop of the
  * incremental near-dup sidecar ([[graft.ops.Dedup
  * .nearDupAgainstSidecar]]) — one evaluation per CANDIDATE PAIR, of
  * which a banded LSH join emits millions per shard at corpus scale.
  * The `zip_with`+`aggregate` HOF formulation allocates an
  * intermediate array and runs interpreted lambdas per pair; this is
  * one fused loop inside whole-stage codegen, nothing allocated,
  * nothing boxed (the [[SortedIntersectCount]] pattern, positional
  * instead of sorted-merge).
  *
  * Positions past the shorter signature's length count as
  * disagreement (equal-length signatures in practice — the sidecar
  * pins numHashes). Returns null if either input is null.
  */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"signature_agreement requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "signature_agreement"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0, $c = 0;
         |while ($i < $n) {
         |  if ($a.getLong($i) == $b.getLong($i)) { $c++; }
         |  $i++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignatureAgreement =
    copy(left = newLeft, right = newRight)
}
