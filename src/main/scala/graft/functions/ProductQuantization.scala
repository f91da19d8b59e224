package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization (PQ) expression family — the compression
  * layer of large-scale ANN (the IVFPQ architecture): a d-dim vector
  * is cut into `m` subvectors, each quantized to the nearest of
  * `ksub` per-subspace centroids, so the stored representation is m
  * small ints (m bytes at ksub ≤ 256) instead of d floats — a 32×
  * storage/IO cut at d=64, m=8, float32. Query-time distances come
  * from a per-query LOOKUP TABLE (LUT) of subspace distances, so
  * scoring a corpus vector is m array reads + m adds, never touching
  * the original floats (asymmetric distance computation, ADC).
  *
  * All three expressions are fused codegen loops (the
  * [[SqEuclideanDistance]] discipline — per-row vector hot loops
  * never run interpreted HOF lambdas): [[PqEncode]] is the
  * index-ingest hot path, [[PqLut]] runs once per query row,
  * [[PqAdcDistance]] is the per-candidate scoring loop.
  *
  * Shared numeric contract, pinned by the PqSpec property tests:
  * subspace distances accumulate LEFT-TO-RIGHT within a subspace
  * (`acc += (v−c)²` in element order, no FMA, no reordering) and ADC
  * sums subspaces in ascending j — so `PqAdcDistance(PqEncode(v),
  * PqLut(q)) == Σⱼ sqEuclidean(qⱼ, centroid(codeⱼ))` BIT-exactly, and
  * encode ties break to the LOWEST code (strict `<` scan), the same
  * first-minimum rule the IVF append path uses.
  *
  * Null semantics (the [[SqEuclideanDistance]] family's): a null
  * input row yields null; a vector whose length is not m·dsub, a
  * vector containing a null element, or a code/LUT whose lengths
  * disagree yield null rather than a wrong distance.
  *
  * Cosine metric: with `normalize = true` both encode and LUT first
  * scale the input to unit length IN the fused loop (zero vectors
  * pass through unscaled), so the euclidean quantizer ranks by
  * cosine — ‖q−v‖² = 2 − 2·cos(q, v) on the unit sphere. The
  * codebook must then be trained on normalized vectors too
  * ([[graft.ops.Similarity.fitPq]] does).
  *
  * The codebook rides the expression as a literal reference object
  * (the [[HyperplaneBucket]] pattern — broadcast once with the plan,
  * m·ksub·dsub doubles, KBs); structural equals/hashCode are
  * overridden ([[BloomMightContain]] precedent) so plan
  * canonicalization and subexpression elimination see two
  * same-codebook expressions as equal.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
                    normalize: Boolean, roundTo: Int = -1)
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be m × ksub × dsub, all non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<double>, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks, normalize,
      roundTo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("codes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.PqEncode.compute($a, $cbRef, $normalize, $roundTo);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case PqEncode(c, cb, n, r) =>
      c == child && n == normalize && r == roundTo &&
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode() + normalize.hashCode()) + roundTo) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** 1/‖v‖ (or 1.0 for a zero vector — leave it untouched rather than
    * divide by zero): the cosine-metric lift shared by encode and LUT.
    * On the unit sphere, squared-euclidean rank equals cosine rank
    * (‖q−v‖² = 2 − 2·cos for unit q, v), which is how a euclidean
    * quantizer serves a cosine metric. The norm accumulates
    * left-to-right like every other fold in the family. */
  def invNorm(v: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.numElements()) {
      val x = v.getDouble(i)
      acc += x * x
      i += 1
    }
    if (acc == 0.0) 1.0 else 1.0 / math.sqrt(acc)
  }

  /** Spark's `round(double, scale)` convention, verbatim (RoundBase's
    * DoubleType branch): shortest-decimal BigDecimal, HALF_UP,
    * NaN/Infinity pass through. The FIXTURE-serving paths round each
    * subspace distance with THIS before comparing/summing so the
    * DuckDB oracle's `round(..., n)` replays the argmin and the ADC
    * sum bit-for-bit (the q124 rounded-distance convention, pushed
    * inside the fused loop).
    *
    * KNOWN EDGE (ADVICE r17, kept diagnosable): this rounds the
    * SHORTEST-DECIMAL form of the double, while DuckDB's `round()` is
    * binary-value-based — for a distance whose shortest-decimal form
    * sits exactly on a half at the target scale (…xxx5 exactly) the
    * two conventions can round differently. No such value occurs in
    * the committed fixtures (hash-green at three SFs, ~10⁶ rounded
    * values), and pushing the convention into the per-element
    * encode/LUT loops multiplies exposure, which is why EVERY fixture
    * regeneration must re-run the three-SF hash validation
    * ([[graft.FixtureDump]]'s contract) — a future mismatch surfaces
    * there as a named diff, not as an opaque gate failure. */
  def roundLikeSpark(x: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else scala.math.BigDecimal(x)
      .setScale(scale, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Static implementation shared by interpreted eval and codegen.
    * Returns null (not an exception) on a wrong-length or
    * null-element vector. `roundTo < 0` (the default, every live-fit
    * path) keeps the exact-double contract PqSpec pins; `roundTo ≥ 0`
    * rounds each subspace distance before the argmin compare — the
    * committed-codebook serving mode, where cross-engine replay needs
    * ULP differences absorbed before ties break. */
  def compute(v: ArrayData, cb: Array[Array[Array[Double]]],
              normalize: Boolean, roundTo: Int = -1): ArrayData = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    if (v.numElements() != m * dsub) return null
    var t = 0
    while (t < v.numElements()) {
      if (v.isNullAt(t)) return null
      t += 1
    }
    val s = if (normalize) invNorm(v) else 1.0
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val cent = cb(j)(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getDouble(base + i) * s - cent(i)
          acc += d * d
          i += 1
        }
        if (roundTo >= 0) acc = roundLikeSpark(acc, roundTo)
        // strict < : ties keep the LOWEST code (first-minimum rule)
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}

/** Per-query ADC lookup table: entry `j·ksub + c` is the squared
  * euclidean distance from the query's j-th subvector to centroid c
  * of subspace j (same left fold as [[PqEncode]]). One row-level
  * array of m·ksub doubles, computed once per query row and carried
  * through the broadcast to every candidate scoring site. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]],
                 normalize: Boolean, roundTo: Int = -1)
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be m × ksub × dsub, all non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires array<double>, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "pq_lut"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PqLut.compute(input.asInstanceOf[ArrayData], codebooks, normalize, roundTo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("lut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.PqLut.compute($a, $cbRef, $normalize, $roundTo);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case PqLut(c, cb, n, r) =>
      c == child && n == normalize && r == roundTo &&
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode() + normalize.hashCode()) + roundTo) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  /** Static implementation shared by interpreted eval and codegen.
    * `roundTo ≥ 0` rounds each LUT entry to that scale (committed-
    * codebook serving mode): every engine then SUMS the same rounded
    * doubles in the same ascending-j order, so the downstream ADC
    * distance is bit-identical cross-engine without touching
    * [[PqAdcDistance]]. */
  def compute(v: ArrayData, cb: Array[Array[Array[Double]]],
              normalize: Boolean, roundTo: Int = -1): ArrayData = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    if (v.numElements() != m * dsub) return null
    var t = 0
    while (t < v.numElements()) {
      if (v.isNullAt(t)) return null
      t += 1
    }
    val s = if (normalize) PqEncode.invNorm(v) else 1.0
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var c = 0
      while (c < ksub) {
        val cent = cb(j)(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getDouble(base + i) * s - cent(i)
          acc += d * d
          i += 1
        }
        lut(j * ksub + c) =
          if (roundTo >= 0) PqEncode.roundLikeSpark(acc, roundTo) else acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }
}

/** Asymmetric PQ distance: `Σⱼ lut[j·ksub + codes[j]]`, subspaces
  * summed in ascending j — the per-candidate scoring loop of a PQ
  * scan (m reads + m adds per corpus vector; the original floats are
  * never touched). */
case class PqAdcDistance(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  require(ksub > 0, s"ksub must be > 0, got $ksub")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int> codes, array<double> lut), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc"

  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcDistance.compute(
      codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("adc")
      s"""
         |java.lang.Double $out =
         |  graft.functions.PqAdcDistance.compute($a, $b, $ksub);
         |if ($out == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = $out.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

object PqAdcDistance {
  /** Static implementation shared by interpreted eval and codegen.
    * Returns null when the codes/LUT lengths disagree or a code is
    * out of range — a parameter-mismatched scan must not produce
    * plausible wrong distances. */
  def compute(codes: ArrayData, lut: ArrayData, ksub: Int): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * ksub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) return null
      acc += lut.getDouble(j * ksub + c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
