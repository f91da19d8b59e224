package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused hyperplane-LSH bucket id: bit i of the result is the sign of
  * the dot product `vec · plane_i` — semantically identical to the HOF
  * formulation ([[graft.ops.Similarity.lshBucketHof]]:
  * `reduce(bitwiseOR, when(aggregate(zip_with(v, plane, _*_), 0.0,
  * _+_ ) >= 0, 1<<i))`), which runs interpreted lambdas per element ×
  * plane × row and materializes a product array per plane. This
  * expression is one fused loop over the vector per plane, inside
  * whole-stage codegen — the bucketing hot path of every LSH ANN /
  * embedding-dedup query.
  *
  * Bit-exactness: products accumulate LEFT-TO-RIGHT exactly like the
  * HOF's `aggregate` fold (no reordering, no FMA), so the sign — and
  * therefore the bucket — is identical. HOF null semantics are
  * mirrored: a vector whose length differs from the planes' dimension
  * (zip_with pads with null → null dot → no bit set) or containing a
  * null element yields bucket 0 with every bit clear.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes(0).length),
    "planes must be non-empty and rectangular")
  require(planes.length <= 63, s"at most 63 planes, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket requires array<double>, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneBucket.compute($a, $planesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Static implementation shared by interpreted eval and codegen. */
  def compute(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val dim = planes(0).length
    val n = v.numElements()
    if (n != dim) return 0L
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return 0L
      j += 1
    }
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var acc = 0.0
      var k = 0
      while (k < dim) {
        acc += v.getDouble(k) * p(k)
        k += 1
      }
      // Spark SQL ordering puts NaN above every double, so the HOF's
      // `dot >= 0` is TRUE for a NaN dot; Java's primitive >= is not
      if (acc >= 0 || java.lang.Double.isNaN(acc)) bucket |= 1L << i
      i += 1
    }
    bucket
  }
}
