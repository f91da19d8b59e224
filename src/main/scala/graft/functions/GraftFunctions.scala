package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** The engine's custom function surface.
  *
  * Three access paths, all backed by the same Catalyst expressions:
  *  - Scala `Column` API: [[cosine_sim]];
  *  - SQL, per session: [[register]];
  *  - SQL, at session build time:
  *    `.withExtensions(new GraftExtensions)` (the
  *    SparkSessionExtensions route for cluster-wide deployment).
  */
object GraftFunctions {

  /** Codegen'd cosine similarity (see [[CosineSimilarity]]). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  /** Codegen'd minhash signature (see [[MinHashSignature]]). */
  def minhash_signature(hashedShingles: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(hashedShingles), numHashes))

  /** Fused zero-copy hashed word-k-gram shingler (see [[HashedShingles]]). */
  def hashed_shingles(text: Column, k: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(text), k))

  /** Bounded single-pass uniform sample aggregate (see [[ReservoirSample]]). */
  def reservoir_sample(c: Column, k: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      ReservoirSample(ColumnBridge.expression(c), k, seed).toAggregateExpression())

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))))

  /** Register all custom functions in an existing session's registry
    * (SQL name resolution). Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Session-extension registration: injects the custom functions into
  * every session built with these extensions — the deployment path for
  * a shared cluster (spark.sql.extensions=graft.functions.GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}
