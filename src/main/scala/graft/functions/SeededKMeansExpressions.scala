package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused expressions for the micro-grid (all-integer) KMeans family
  * ([[graft.ops.SeededKMeans]]) — the long-typed twins of
  * [[SqEuclideanDistance]] / [[PqEncode]] / [[PqAdcDistance]].
  *
  * Rationale (the family's standing discipline — per-row vector hot
  * loops never run interpreted HOF lambdas): the first formulation of
  * the seeded fit scored cells with
  * `array_sort(transform(sequence(...), i => struct(aggregate(
  * zip_with(...)))))` over a k×d literal centroid array — interpreted
  * lambdas per element per row PLUS a ~k·d-literal Catalyst tree
  * re-analyzed per Lloyd iteration, which put the 5-iteration fit at
  * ~38 s on 2 000×64 vectors (bench round 9). Each expression here is
  * one fused Java loop in WholeStageCodegen with the constant table
  * riding as a plan reference object (KBs, broadcast with the plan).
  *
  * Numeric contract: there are NO floats anywhere — distances are
  * exact long sums, so unlike the double family there is no
  * accumulation-order caveat; ties break to the LOWEST cell/code
  * (strict `<` first-minimum scan), the rule the DuckDB oracle
  * replays. Null semantics: null input row → null; a wrong-length
  * vector or one containing a null element → null rather than a wrong
  * answer ([[PqEncode]] precedent).
  */
object SeededKMeansExpressions {

  /** Exact squared euclidean distance of a long vector to each row of
    * `cents`, returning the argmin index (ties → lowest). */
  def argminCell(v: ArrayData, cents: Array[Array[Long]]): Any = {
    val d = cents(0).length
    if (v.numElements() != d) return null
    var t = 0
    while (t < d) { if (v.isNullAt(t)) return null; t += 1 }
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var acc = 0L
      var i = 0
      while (i < d) {
        val x = v.getLong(i) - cent(i)
        acc += x * x
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    Integer.valueOf(best)
  }

  /** Per-subspace argmin codes of a long vector against m long
    * codebooks (the integer [[PqEncode.compute]]). */
  def encode(v: ArrayData, cb: Array[Array[Array[Long]]]): ArrayData = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    if (v.numElements() != m * dsub) return null
    var t = 0
    while (t < v.numElements()) { if (v.isNullAt(t)) return null; t += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val cent = cb(j)(c)
        var acc = 0L
        var i = 0
        while (i < dsub) {
          val d = v.getLong(base + i) - cent(i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Exact-long ADC: Σⱼ dist²(query slice j, codebookⱼ[codeⱼ]). */
  def adc(q: ArrayData, codes: ArrayData,
          cb: Array[Array[Array[Long]]]): Any = {
    val m = cb.length
    val dsub = cb(0)(0).length
    if (q.numElements() != m * dsub || codes.numElements() != m) return null
    var t = 0
    while (t < q.numElements()) { if (q.isNullAt(t)) return null; t += 1 }
    var acc = 0L
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val code = codes.getInt(j)
      if (code < 0 || code >= cb(j).length) return null
      val cent = cb(j)(code)
      val base = j * dsub
      var i = 0
      while (i < dsub) {
        val d = q.getLong(base + i) - cent(i)
        acc += d * d
        i += 1
      }
      j += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Exact squared euclidean distance of two long vectors under the
    * module null contract: length mismatch or a null element → null
    * (never a silently-truncated distance). */
  def sqDist(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var t = 0
    while (t < n) {
      if (x.isNullAt(t) || y.isNullAt(t)) return null
      t += 1
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Argmin cell of an `array<long>` micro-grid vector against a
  * constant k×d long centroid table (ties → lowest cell). The
  * assignment step of every seeded Lloyd iteration and of
  * [[graft.ops.SeededKMeans.Model.assign]]. */
case class ArgminCellLong(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "centroid table must be k × d, rectangular and non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"argmin_cell_long requires array<bigint>, got $t")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_cell_long"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SeededKMeansExpressions.argminCell(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seededCents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("cell")
      s"""
         |Object $out = graft.functions.SeededKMeansExpressions.argminCell($a, $ref);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $out).intValue(); }
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case ArgminCellLong(c, cs) => c == child && java.util.Arrays.deepEquals(
      cs.asInstanceOf[Array[AnyRef]], cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): ArgminCellLong =
    copy(child = newChild)
}

/** PQ-encode an `array<long>` vector: m per-subspace argmin codes
  * against constant long codebooks — the integer [[PqEncode]]. */
case class PqEncodeLong(child: Expression, codebooks: Array[Array[Array[Long]]])
    extends UnaryExpression {

  // mirror ArgminCellLong's rectangularity require (round-10 ADVICE):
  // the fused loop takes ksub/dsub from codebook 0, so a jagged table
  // would mis-index or return wrong codes rather than fail loudly
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty) &&
    codebooks.forall(_.length == codebooks(0).length) &&
    codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "codebooks must be m × ksub × dsub, rectangular and non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_long requires array<bigint>, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_long"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SeededKMeansExpressions.encode(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seededCodebooks", codebooks, "long[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("codes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.SeededKMeansExpressions.encode($a, $ref);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case PqEncodeLong(c, cb) => c == child && java.util.Arrays.deepEquals(
      cb.asInstanceOf[Array[AnyRef]], codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PqEncodeLong =
    copy(child = newChild)
}

/** Exact-long asymmetric distance: query `array<long>` vs a
  * neighbor's `array<int>` codes under constant long codebooks — the
  * integer [[PqAdcDistance]], the per-candidate scoring loop of
  * [[graft.ops.SeededKMeans.annJoinPqSeeded]] (q176). */
case class PqAdcLong(left: Expression, right: Expression,
                     codebooks: Array[Array[Array[Long]]])
    extends BinaryExpression {

  // same rectangularity require as PqEncodeLong (round-10 ADVICE)
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty) &&
    codebooks.forall(_.length == codebooks(0).length) &&
    codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "codebooks must be m × ksub × dsub, rectangular and non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_long requires (array<bigint>, array<int>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_long"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SeededKMeansExpressions.adc(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seededCodebooks", codebooks, "long[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("adc")
      s"""
         |Object $out = graft.functions.SeededKMeansExpressions.adc($a, $b, $ref);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $out).longValue(); }
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case PqAdcLong(l, r, cb) => l == left && r == right &&
      java.util.Arrays.deepEquals(
        cb.asInstanceOf[Array[AnyRef]], codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcLong =
    copy(left = newLeft, right = newRight)
}

/** Exact squared euclidean distance of two `array<long>` columns —
  * the long twin of [[SqEuclideanDistance]], for distances where BOTH
  * sides are columns (the stored-index probe join scores query rows
  * against the centroid TABLE, where no constant table exists to ride
  * an argmin expression). Holds the module null contract like its
  * three siblings: a length mismatch or a null element yields null,
  * never a silently-truncated distance — this one is SQL-registered
  * (`sq_euclidean_long`), so user SQL over un-quantized data can hit
  * the malformed-input paths (round-10 ADVICE). */
case class SqEuclideanLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_euclidean_long requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sq_euclidean_long"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SeededKMeansExpressions.sqDist(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("d2")
      s"""
         |Object $out = graft.functions.SeededKMeansExpressions.sqDist($a, $b);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $out).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqEuclideanLong =
    copy(left = newLeft, right = newRight)
}
