package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-replayable MinHash signature straight from text: one
  * fused scan computing, for every k-token shingle window and every
  * seed `0 ≤ i < numHashes`, the md5-top-60-bit hash of
  * `shingle + "|" + i`, keeping the per-seed minimum.
  *
  * The production signature path ([[MinHashSignature]] over
  * [[HashedShingles]]) derives all hash functions from one xxhash64
  * per shingle — ~numHashes× cheaper, but not replayable outside the
  * JVM. This md5 form exists so an external engine can replay the
  * ENTIRE banded-LSH near-dup pipeline (signature → band chunks →
  * bucket groups → candidate pairs → exact Jaccard) value-for-value —
  * q149's oracle does exactly that in DuckDB with
  * `list_min(list_transform(...md5...))` per seed. Use it for
  * verification corpora and keep the xxhash64 path for production
  * scale (documented on [[graft.ops.Dedup.minhashDedupPairsMd5]]).
  *
  * Semantics pinned to the HOF twin
  * ([[graft.ops.Dedup.minhashMd5SignatureHof]], property-tested
  * bit-identical): tokens are `split(text, " ")` spans (limit -1),
  * shingles are the k-token windows joined by a single space
  * (duplicate windows cannot change a minimum, so no distinct pass is
  * needed), hash = value of the first 15 hex digits of
  * md5(shingleUtf8 ++ "|" ++ seedDecimal); docs with fewer than k
  * tokens yield null (no sentinel signatures — empty docs must not
  * collide into shared LSH buckets).
  */
case class MinHashMd5Signature(child: Expression, shingleK: Int,
                               numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if shingleK > 0 && numHashes > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"minhash_md5_signature requires shingleK > 0 and numHashes > 0, " +
          s"got ($shingleK, $numHashes)")
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_md5_signature requires string, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_md5_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashMd5Signature.compute(input.asInstanceOf[UTF8String], shingleK,
      numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $out =
         |  graft.functions.MinHashMd5Signature.compute($a, $shingleK, $numHashes);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashMd5Signature = copy(child = newChild)
}

object MinHashMd5Signature {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static implementation shared by interpreted eval and codegen.
    * Returns null for docs with fewer than shingleK tokens. */
  def compute(s: UTF8String, shingleK: Int,
              numHashes: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token span boundaries (limit -1 split semantics)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts.add(start); ends.add(i)
        start = i + 1
      }
      i += 1
    }
    val nTokens = starts.size()
    if (nTokens < shingleK) return null
    val md = md5.get()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seedSuffix = new Array[Array[Byte]](numHashes)
    var h = 0
    while (h < numHashes) {
      seedSuffix(h) = ("|" + h)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      h += 1
    }
    var w = 0
    while (w <= nTokens - shingleK) {
      // shingle bytes = tokens w..w+k-1 joined by ' ' — exactly the
      // bytes from the first token's start to the last token's end
      // (separators between tokens in the source ARE single spaces)
      val from = starts.get(w)
      val until = ends.get(w + shingleK - 1)
      h = 0
      while (h < numHashes) {
        md.reset()
        md.update(bytes, from, until - from)
        md.update(seedSuffix(h))
        val d = md.digest()
        var top = 0L
        var j = 0
        while (j < 8) { top = (top << 8) | (d(j) & 0xFFL); j += 1 }
        val v = top >>> 4
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
