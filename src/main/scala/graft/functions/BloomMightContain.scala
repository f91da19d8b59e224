package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a string column: `true` when the
  * value MIGHT be in the set the filter was built from, `false` when it
  * definitely is not. The filter rides the expression as its serialized
  * bytes (stable for plan equality/serialization) and is deserialized
  * once per executor; the probe itself stays inside whole-stage codegen.
  *
  * The scale use is membership PRE-ROUTING: a broadcast-sized bloom of
  * a huge persisted set (e.g. the dedup fingerprint sidecar) lets
  * definitely-new rows bypass the exact anti-join entirely, so the join
  * only processes the might-contain fraction (true-duplicate rate +
  * fpp). Correctness is preserved by construction — `false` is only
  * ever returned for values that were never inserted.
  *
  * Probes hash the UTF-8 bytes (`mightContainBinary`), matching
  * [[BloomMightContain.put]]'s insertion of UTF-8 bytes — build and
  * probe MUST go through this pair to stay symmetric.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  // Array[Byte] equals/hashCode are reference-based, which would make
  // two semantically identical probes (or a deserialized copy) compare
  // unequal — defeating plan canonicalization and subexpression
  // elimination. Compare the bytes structurally.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires string, got $t")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomMightContain.deserialize(bloomBytes)

  override def nullSafeEval(input: Any): Any =
    BloomMightContain.compute(input.asInstanceOf[UTF8String], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomMightContain.compute($a, $bloomRef);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def compute(s: UTF8String, bloom: BloomFilter): Boolean =
    bloom.mightContainBinary(s.getBytes)

  /** Insertion twin of the probe: UTF-8 bytes of the string form. */
  def put(bloom: BloomFilter, s: String): Unit = {
    bloom.putBinary(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
