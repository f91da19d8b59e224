package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Optimizer rule (`Rule[LogicalPlan]`, the missing rung of the
  * customization ladder next to the expressions and the planner
  * strategy): rewrites the classic top-k-per-group idiom
  *
  * {{{
  *   ... row_number() OVER (PARTITION BY p ORDER BY score DESC) AS rn
  *   WHERE rn <= k          -- rn then dropped from the projection
  * }}}
  *
  * into the heap-based [[TopKPerGroup]] operator, eliminating the
  * per-partition sort the window formulation pays (O(n log n) + full
  * materialization → O(n log k) streaming). Spark's own
  * InferWindowGroupLimit inserts a group-limit BELOW the window but
  * still sorts and still runs the window; this rewrite removes both.
  *
  * Semantics: row_number over a non-unique ordering is already
  * nondeterministic in its tie choice, so replacing it with the heap
  * operator (arbitrary ties at the k boundary) preserves the same
  * deterministic contract. The rewrite fires only when provably safe:
  *
  *  - the window computes exactly ONE expression: row_number() with
  *    the default (UnboundedPreceding, CurrentRow) row frame;
  *  - ordered by a numeric column DESCENDING (the heap is a max-take;
  *    ascending would need a mirrored comparator) whose type is
  *    EXACTLY representable as double — double/float/int/short/byte.
  *    Long and decimal are excluded: the heap compares doubles, and
  *    distinct values beyond 2^53 would collapse to equal doubles,
  *    silently changing which rows (and which tiebreak resolution) the
  *    exact ROW_NUMBER ordering selects. Optionally followed by ONE
  *    integral tiebreak column ASC NULLS FIRST (row_number's ASC
  *    default) — the heap honors it exactly;
  *  - the rn attribute is used ONLY by the `rn <= k` / `rn < k`
  *    filter and dropped by the projection directly above it (the
  *    Project match proves nothing upstream reads rn);
  *  - null ordering is NULLS LAST (the DESC default), which the heap
  *    operator reproduces (null scores fill trailing slots only).
  *
  * Off by default; enable with `spark.graft.topk.rewrite=true`.
  * Registered by [[graft.functions.GraftExtensions]] (which also
  * injects [[TopKStrategy]] so the logical node it produces is
  * plannable), or manually via `spark.experimental`.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.rewrite"

  private def enabled: Boolean =
    conf.getConfString(ConfKey, "false").toBoolean

  private[plans] def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case _: org.apache.spark.sql.types.ByteType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Types whose every value survives a cast to double unchanged —
    * the only scores the heap (which compares doubles) may rank on
    * behalf of an exact ROW_NUMBER ordering. Long/decimal are out:
    * distinct values beyond 2^53 collapse to equal doubles. */
  private[plans] def isExactAsDouble(t: DataType): Boolean = t match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private object RowNumberWindow {
    /** Matches Window nodes whose single expression is a default-frame
      * row_number over (part, numeric DESC [, integral ASC tiebreak]);
      * returns (rnAttrId, partition, score, tiebreak, child). */
    def unapply(w: Window): Option[(ExprId, Seq[Expression], Expression,
        Option[Expression], LogicalPlan)] =
      w match {
        case Window(Seq(a @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, orders, frame)), _)),
            _, _, child, _)
          if frame == SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
          val scoreOk = orders.headOption.exists(o =>
            o.direction == Descending && o.nullOrdering == NullsLast &&
              o.child.isInstanceOf[AttributeReference] &&
              isExactAsDouble(o.child.dataType))
          val tiebreak = orders match {
            case Seq(_) => Some(None)
            case Seq(_, t) if t.direction == Ascending &&
                t.nullOrdering == NullsFirst &&
                t.child.isInstanceOf[AttributeReference] &&
                isIntegral(t.child.dataType) =>
              Some(Some(t.child))
            case _ => None // unsupported ordering shape
          }
          (scoreOk, tiebreak) match {
            case (true, Some(tb)) =>
              Some((a.exprId, part, orders.head.child, tb, unwrapGroupLimit(child)))
            case _ => None
          }
        case _ => None
      }

    /** Depending on where the rule runs (extension-injected rules run
      * inside operator optimization; `spark.experimental` rules run
      * after everything), Spark's InferWindowGroupLimit may already
      * have inserted a WindowGroupLimit below the Window. It's
      * redundant once the whole window is replaced — and worse, its
      * physical operator requires sorted input, reintroducing exactly
      * the sort this rewrite removes — so strip it. */
    private def unwrapGroupLimit(child: LogicalPlan): LogicalPlan = child match {
      case WindowGroupLimit(_, _, _: RowNumber, _, grandchild) => grandchild
      case other => other
    }
  }

  /** `rn <= k` / `rn < k+1` / `rn = 1` → k (the top-k bound).
    * Equality matches only k=1 (the argmax/latest-per-key idiom);
    * `rn = 5` alone is NOT a top-k. */
  private object RankBound {
    def unapply(e: Expression): Option[(AttributeReference, Int)] = e match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if k > 0 => Some((a, k))
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if k > 1 => Some((a, k - 1))
      case EqualTo(a: AttributeReference, Literal(1, IntegerType)) =>
        Some((a, 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case p @ Project(projList,
          Filter(RankBound(rnAttr, k),
            RowNumberWindow(rnId, part, score, tiebreak, child)))
        if rnAttr.exprId == rnId &&
          p.references.subsetOf(child.outputSet) &&
          projList.forall(_.deterministic) =>
        if (part.nonEmpty) {
          val scoreExpr =
            if (score.dataType == DoubleType) score else Cast(score, DoubleType)
          Project(projList, TopKPerGroup(part, scoreExpr, tiebreak, k, child))
        } else {
          // global ranking (empty PARTITION BY): TopKPerGroup would
          // declare ClusteredDistribution(Nil), which Spark rejects.
          // Sort+Limit carries the same semantics and plans as
          // TakeOrderedAndProject — per-partition k-heaps merged on a
          // single reducer, still no full sort.
          val orders = SortOrder(score, Descending, NullsLast, Seq.empty) +:
            tiebreak.toSeq.map(SortOrder(_, Ascending, NullsFirst, Seq.empty))
          Project(projList, Limit(Literal(k), Sort(orders, global = true, child)))
        }
    }
}
