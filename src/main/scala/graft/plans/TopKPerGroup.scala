package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Custom whole-operator: per-group top-k by a numeric score WITHOUT
  * sorting each partition.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY key
  * ORDER BY score DESC) <= k` — shuffles on the key and then SORTS
  * every partition by (key, score): O(n log n) per partition, with the
  * whole partition materialized for the sort. This operator keeps only
  * a k-bounded min-heap per key: O(n log k) time and O(groups·k)
  * memory, streaming the input once. Same single shuffle (it declares
  * `ClusteredDistribution` on the keys), no sort.
  *
  * Ladder position (SURVEY.md §8.4): the (c) option — logical node +
  * planner strategy + physical exec, registered through
  * SparkSessionExtensions — used here because no composition of
  * built-ins avoids the sort.
  *
  * Ties at the k-boundary resolve arbitrarily (like a LIMIT without a
  * full ORDER BY); add a deterministic tiebreak to the score if exact
  * tie behavior matters.
  */
case class TopKPerGroup(keys: Seq[Expression], score: Expression, k: Int,
                        child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(keys: Seq[Expression], score: Expression, k: Int,
                            child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  /** Per-group state: a k-bounded min-heap of non-null-scored rows,
    * plus up to k null-scored filler rows. Null scores rank AFTER all
    * non-null scores (ROW_NUMBER ... DESC NULLS LAST parity): they
    * surface only when a group has fewer than k non-null rows, and
    * both formulations pick their survivors arbitrarily among ties. */
  private final class GroupState(k: Int,
      cmp: java.util.Comparator[(Double, InternalRow)]) {
    val heap = new java.util.PriorityQueue[(Double, InternalRow)](k + 1, cmp)
    var nullRows: List[InternalRow] = Nil
    private var nNull = 0
    def offerNull(row: InternalRow): Unit =
      if (nNull < k) { nullRows ::= row.copy(); nNull += 1 }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys.map(BindReferences.bindReference(_, child.output))
    val scoreExpr = BindReferences.bindReference(score, child.output)
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs)
      val groups = new java.util.HashMap[InternalRow, GroupState]()
      val cmp = java.util.Comparator.comparingDouble[(Double, InternalRow)](_._1)
      rows.foreach { row =>
        val key = keyProj(row)
        var st = groups.get(key)
        if (st == null) {
          st = new GroupState(k, cmp)
          groups.put(key.copy(), st)
        }
        val sv = scoreExpr.eval(row)
        if (sv == null) {
          st.offerNull(row)
        } else {
          val s = sv.asInstanceOf[Double]
          if (st.heap.size < k) {
            st.heap.add((s, row.copy()))
          } else if (cmp.compare((s, row), st.heap.peek()) > 0) {
            st.heap.poll()
            st.heap.add((s, row.copy()))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap { st =>
        st.heap.iterator().asScala.map(_._2) ++
          st.nullRows.iterator.take(k - st.heap.size)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, score, k, child) =>
      TopKPerGroupExec(keys, score, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Column-API entry: top `k` rows per `keys` group by descending
    * `score`. Any numeric score column is accepted — it is cast to
    * double for heap comparison (the exec binds a DoubleType
    * expression, never a raw attribute of another type). Null scores
    * rank after every non-null score (ROW_NUMBER ... DESC NULLS LAST
    * parity). Registers the planner strategy on first use
    * (idempotent). */
  def topKPerGroup(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                   scoreCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    val resolve = analyzed.outputSet.toSeq.map(a => a.name -> a).toMap
    val keyExprs = keys.map(resolve(_))
    val scoreAttr = resolve(scoreCol)
    require(scoreAttr.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"topKPerGroup score column '$scoreCol' must be numeric, " +
        s"got ${scoreAttr.dataType}")
    val scoreExpr =
      if (scoreAttr.dataType == org.apache.spark.sql.types.DoubleType) scoreAttr
      else org.apache.spark.sql.catalyst.expressions.Cast(
        scoreAttr, org.apache.spark.sql.types.DoubleType)
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark,
      TopKPerGroup(keyExprs, scoreExpr, k, analyzed))
  }
}

/** Planner-strategy injection for shared deployments
  * (spark.sql.extensions): makes TopKPerGroup plannable in any session
  * built with [[graft.functions.GraftExtensions]]-style wiring. */
class TopKExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy((_: SparkSession) => TopKStrategy)
}
