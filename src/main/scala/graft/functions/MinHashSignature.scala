package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: input is a document's hashed shingle set
  * (`array<long>`), output is the `numHashes`-long signature where
  *   sig[i] = min over shingles h of xxhash64(h, i)
  * with xxhash64's column-chaining semantics replicated exactly:
  *   xxhash64(h, i) = XXH64.hashLong(i, XXH64.hashLong(h, 42L)),
  * so this expression is BIT-IDENTICAL to the HOF formulation
  * [[graft.ops.Dedup.minhashSignatureHof]] (long-typed seed sequence).
  * The inner hash depends only on the shingle — it is computed once
  * per shingle, not once per (shingle, i).
  *
  * Rationale (scale/perf): the HOF formulation evaluates interpreted
  * lambdas — shingles × numHashes expression dispatches per row, which
  * dominated near-dup detection cost. This expression generates one
  * fused two-level Java loop (no per-element allocation, no virtual
  * dispatch) and stays inside whole-stage codegen.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<long>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  /** Null on empty input (there is no min over an empty set): matches
    * the HOF formulation's array_min-of-empty → null, and keeps all
    * empty/short docs from sharing one sentinel signature that would
    * collide them into the same LSH buckets. */
  override def nullable: Boolean = true

  /** xxhash64's default seed (Spark's XxHash64 expression). */
  private final val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val inner = XXH64.hashLong(hs.getLong(j), Seed)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(i.toLong, inner)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $best = $xxh.hashLong($a.getLong($j), ${Seed}L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $h = $xxh.hashLong((long) $i, $best);
         |      if ($h < $sig[$i]) $sig[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = new $gad($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
