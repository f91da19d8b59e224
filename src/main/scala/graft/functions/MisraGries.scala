package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Buffer: at most k (term → residual count) counters. Values are
  * boxed explicitly — a scala.Long-typed java.util.HashMap silently
  * unboxes a missing key's null to 0 and turns every absence check
  * into "present". */
final class MisraGriesBuffer(val k: Int) {
  val counts = new java.util.HashMap[UTF8String, java.lang.Long](k * 2)
}

/** Bounded-state heavy-hitter CANDIDATES per group:
  * `mg_candidates(col, k)` returns the distinct values that survive a
  * merged Misra-Gries summary of k counters, as a sorted
  * `array<string>`.
  *
  * Why a custom [[TypedImperativeAggregate]]: an exact
  * `groupBy(term).count` shuffles one row per DISTINCT term — at
  * web-scale n-gram cardinality that shuffle is the job. The MG
  * summary holds ≤ k counters per partial whatever the cardinality,
  * map-side combines like any partial aggregate (partition summaries
  * merge by pointwise addition + subtracting the (k+1)-th largest
  * counter — Agarwal et al.'s mergeable-summaries result, which keeps
  * the total undercount ≤ n/(k+1)), and its output is ≤ k candidate
  * terms. The candidate SET depends on partition layout (MG is
  * stream-order-sensitive) — what is layout-invariant is the
  * guarantee: **every value with true frequency > n/k survives**, so
  * an exact candidate-only recount + `cnt·k > n` threshold yields the
  * exact heavy-hitter set deterministically (q189 composes exactly
  * that; the sketch prunes, the recount decides — the LSH-bucketCap /
  * HLL-screen discipline applied to frequency).
  */
case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(k > 0 && k <= 100000, s"mg_candidates: k must be in [1, 100000], got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mg_candidates requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): MisraGriesBuffer = new MisraGriesBuffer(k)

  override def update(buf: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val existing: java.lang.Long = buf.counts.get(s)
      if (existing != null) buf.counts.put(s, java.lang.Long.valueOf(existing.longValue + 1L))
      else if (buf.counts.size < k) {
        // the input UTF8String may point into a reused row buffer —
        // copy the bytes before retaining it across rows
        buf.counts.put(UTF8String.fromBytes(s.getBytes), java.lang.Long.valueOf(1L))
      } else {
        // classic MG step: a new value against a full table decrements
        // every counter by one (the new value's single occurrence is
        // absorbed by the same decrement)
        val it = buf.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue <= 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1L))
        }
      }
    }
    buf
  }

  /** Pointwise addition, then subtract the (k+1)-th largest counter
    * value and drop non-positive counters — the mergeable-summary
    * reduction that restores size ≤ k while preserving the n/k
    * no-false-negative guarantee. */
  override def merge(a: MisraGriesBuffer, b: MisraGriesBuffer): MisraGriesBuffer = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val existing: java.lang.Long = a.counts.get(e.getKey)
      // b's keys were copied at their own update time — safe to share
      a.counts.put(e.getKey,
        if (existing == null) e.getValue
        else java.lang.Long.valueOf(existing.longValue + e.getValue.longValue))
    }
    if (a.counts.size > k) {
      val vals = new Array[Long](a.counts.size)
      val vit = a.counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next().longValue; i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - 1 - k) // (k+1)-th largest
      val eit = a.counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue.longValue <= d) eit.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - d))
      }
    }
    a
  }

  override def eval(buf: MisraGriesBuffer): Any = {
    val keys = buf.counts.keySet().toArray(new Array[UTF8String](buf.counts.size))
    java.util.Arrays.sort(keys, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    new GenericArrayData(keys.asInstanceOf[Array[AnyRef]])
  }

  override def serialize(buf: MisraGriesBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesCandidates =
    copy(child = newChildren.head)
}
