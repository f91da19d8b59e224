package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Buffer: Algorithm-R reservoir of longs + count of rows seen. */
final class ReservoirBuffer(val k: Int) {
  val items = new Array[Long](k)
  var seen: Long = 0L
}

/** Single-pass bounded uniform sample per group: `reservoir_sample(col, k)`
  * returns up to k values drawn uniformly from the group, as
  * `array<long>`.
  *
  * Why a custom [[TypedImperativeAggregate]]: `collect_list + slice`
  * materializes every group's full contents before truncating —
  * unbounded memory on a hot group at 100 TB. The reservoir holds
  * exactly k values per group whatever the group size, and merges
  * partial reservoirs with seen-count-weighted selection, so it
  * map-side combines like any other partial aggregate.
  *
  * Randomness is derived deterministically from (seen-count, seed) via
  * XXH64 — no RNG state in the buffer, and results are reproducible
  * for a fixed row order (row order across partitions is not
  * guaranteed by Spark, so treat output membership as sampled, sizes
  * as exact).
  */
case class ReservoirSample(
    child: Expression,
    k: Int,
    seed: Long = 42L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"reservoir_sample requires bigint input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "reservoir_sample"

  override def createAggregationBuffer(): ReservoirBuffer = new ReservoirBuffer(k)

  /** Uniform draw in [0, bound) derived from the buffer's state. */
  private def draw(buf: ReservoirBuffer, salt: Long, bound: Long): Long = {
    val h = XXH64.hashLong(buf.seen ^ salt, seed)
    java.lang.Math.floorMod(h, bound)
  }

  override def update(buf: ReservoirBuffer, input: InternalRow): ReservoirBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      buf.seen += 1
      if (buf.seen <= k) {
        buf.items((buf.seen - 1).toInt) = x
      } else {
        val j = draw(buf, x, buf.seen)
        if (j < k) buf.items(j.toInt) = x
      }
    }
    buf
  }

  /** Merge two reservoirs: selects each slot from the pair weighted by
    * their seen counts — the standard distributed-reservoir merge. */
  override def merge(a: ReservoirBuffer, b: ReservoirBuffer): ReservoirBuffer = {
    if (b.seen == 0) return a
    if (a.seen == 0) {
      System.arraycopy(b.items, 0, a.items, 0, k)
      a.seen = b.seen
      return a
    }
    val total = a.seen + b.seen
    val na = math.min(a.seen, k.toLong).toInt
    val nb = math.min(b.seen, k.toLong).toInt
    val out = new Array[Long](k)
    val nOut = math.min(total, k.toLong).toInt
    var i = 0
    var ia = 0
    var ib = 0
    while (i < nOut) {
      val takeFromA =
        if (ia >= na) false
        else if (ib >= nb) true
        else draw(a, i.toLong * 0x9E3779B97F4A7C15L + b.seen, total) < a.seen
      if (takeFromA) { out(i) = a.items(ia); ia += 1 }
      else { out(i) = b.items(ib); ib += 1 }
      i += 1
    }
    System.arraycopy(out, 0, a.items, 0, nOut)
    a.seen = total
    a
  }

  override def eval(buf: ReservoirBuffer): Any = {
    val n = math.min(buf.seen, k.toLong).toInt
    new GenericArrayData(java.util.Arrays.copyOf(buf.items, n))
  }

  override def serialize(buf: ReservoirBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.seen)
    val n = math.min(buf.seen, k.toLong).toInt
    var i = 0
    while (i < n) { out.writeLong(buf.items(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ReservoirBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ReservoirBuffer(k)
    buf.seen = in.readLong()
    val n = math.min(buf.seen, k.toLong).toInt
    var i = 0
    while (i < n) { buf.items(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirSample =
    copy(child = newChildren.head)
}
