package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-n-gram counter: the number of sliding CHARACTER
  * windows of the text equal to any gram of a small fixed ASCII set —
  * semantically identical to
  * `size(filter(transform(sequence(1, len-(n-1)), i -> substring(t, i, n)),
  *              g -> g.isin(grams)))`
  * which allocates a substring per window position and runs
  * interpreted lambdas.
  *
  * The byte-scan shortcut is exact BECAUSE the gram set is ASCII-only
  * (enforced): in UTF-8, continuation bytes and multi-byte lead bytes
  * are all >= 0x80, so a byte window can equal an ASCII gram only when
  * it starts on a character boundary and covers exactly n ASCII
  * characters — a 1:1 correspondence with the matching character
  * windows. One pass, zero allocation, whole-stage codegen.
  */
case class NgramsInSet(child: Expression, grams: Seq[String])
    extends UnaryExpression {

  require(grams.nonEmpty, "grams must be non-empty")
  private val n = grams.head.length
  require(n >= 1 && grams.forall(_.length == n),
    "all grams must have the same length")
  require(grams.forall(_.forall(_ < 0x80)),
    "grams must be ASCII (the byte-scan equivalence depends on it)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ngrams_in_set requires string, got $t")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "ngrams_in_set"

  @transient private lazy val gramBytes: Array[Array[Byte]] =
    grams.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    NgramsInSet.compute(input.asInstanceOf[UTF8String], gramBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gramsRef = ctx.addReferenceObj("ngramsInSetGrams", gramBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramsInSet.compute($a, $gramsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramsInSet =
    copy(child = newChild)
}

object NgramsInSet {
  /** Static implementation shared by interpreted eval and codegen. */
  def compute(s: UTF8String, grams: Array[Array[Byte]]): Int = {
    val total = s.numBytes()
    val w = grams(0).length
    var count = 0
    var i = 0
    while (i + w <= total) {
      var g = 0
      var matched = false
      while (!matched && g < grams.length) {
        val gb = grams(g)
        var j = 0
        var eq = true
        while (eq && j < w) {
          if (s.getByte(i + j) != gb(j)) eq = false
          j += 1
        }
        if (eq) matched = true
        g += 1
      }
      if (matched) count += 1
      i += 1
    }
    count
  }
}
