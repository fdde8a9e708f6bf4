package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, CurrentRow, EqualTo, Expression, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, Literal, NamedExpression, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, SparkStrategy}

/** Planner strategy: `filter(row_number().over(partitionBy.orderBy) <= k)`
  * — the universal per-group top-k / latest-by-key idiom — planned as
  * [[BoundedTopKExec]] instead of Exchange + full Sort + WindowExec +
  * Filter. The built-in plan sorts every partition end to end to keep k
  * rows per key; the bounded-heap node keeps the same single Exchange and
  * replaces the sort with an O(n log k) streaming pass.
  *
  * Matched shapes (both produced by the DataFrame idiom):
  *   - `Filter(rn <= k, Window[row_number])` (rank consumed or dropped
  *     later)
  *   - `Filter(rank <= k, Project[..., rank = cast(rn)], Window)` (the
  *     `.withColumn("rank", row_number().over(w).cast(...))` form)
  * plus `rn === 1` (latest-by-key) and `rn < k` variants. Only a SOLE
  * row_number window expression with the standard ROWS UNBOUNDED
  * PRECEDING..CURRENT ROW frame is rewritten — anything else falls
  * through to the built-in planner untouched.
  *
  * Tie behavior matches WindowExec's contract exactly as far as it goes:
  * with a non-total `orderBy`, row_number already assigns tied rows
  * arbitrarily (partition-layout-dependent); the heap makes a different
  * but equally valid choice. Queries wanting stable output must order by
  * a total key — all graft queries do.
  *
  * Installed by [[graft.GraftSession]] via `experimental.extraStrategies`
  * and by `spark.sql.extensions=graft.functions.GraftExtensions`. */
object BoundedTopKStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(cond, w: Window) =>
      (for {
        (part, order, rnAttr) <- matchRowNumberWindow(w)
        k <- limitFromCond(cond, rnAttr)
      } yield twoPhase(part, order, rnAttr, k, w) :: Nil)
        .getOrElse(Nil)

    case Filter(cond, p @ Project(projList, w: Window)) =>
      (for {
        (part, order, rnAttr) <- matchRowNumberWindow(w)
        rankAlias <- projList.collectFirst {
          case a: Alias if isRankOf(a.child, rnAttr) => a
        }
        k <- limitFromCond(cond, rankAlias.toAttribute)
        // every other projected column must be computable from the
        // window's CHILD plus the rank attribute the exec node emits
        if projList.forall(e => (e eq rankAlias) ||
          e.references.subsetOf(w.child.outputSet ++
            org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)))
      } yield ProjectExec(projList, twoPhase(part, order, rnAttr, k, w)) :: Nil)
        .getOrElse(Nil)

    case _ => Nil
  }

  /** Partial (map-side prune, below the exchange) + final (rank-emitting)
    * pair — the partial-aggregation shape for top-k. Spark's own
    * InferWindowGroupLimit rule (3.5+) will usually have inserted a
    * logical WindowGroupLimit below the window from the SAME rank filter;
    * its physical form requires SORTED input in both modes, so leaving it
    * in place would re-introduce the map-side sort the heap exists to
    * remove — the partial heap subsumes it (same superset guarantee),
    * so it is stripped when its bound is at least as tight as ours. */
  private def twoPhase(part: Seq[Expression], order: Seq[SortOrder],
      rnAttr: Attribute, k: Int,
      w: Window): BoundedTopKExec = {
    import org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
    val realChild = w.child match {
      case WindowGroupLimit(p2, o2, RowNumber(), limit, grandchild)
          if limit >= k && p2 == part && o2 == order =>
        grandchild
      case other => other
    }
    BoundedTopKExec(part, order, rnAttr, k, partial = false,
      BoundedTopKExec(part, order, rnAttr, k, partial = true,
        planLater(realChild)))
  }

  /** The sole-window-expression row_number pattern with its required
    * ROWS UNBOUNDED PRECEDING..CURRENT ROW frame. */
  private def matchRowNumberWindow(
      w: Window): Option[(Seq[Expression], Seq[SortOrder], Attribute)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          // empty partitionBy = GLOBAL top-k: ClusteredDistribution
          // cannot express it (and TakeOrderedAndProject already covers
          // it) — fall through to the built-in planner
          if part.nonEmpty && order.nonEmpty =>
        Some((part, order, a.toAttribute))
      case _ => None
    }

  /** `rank` / `cast(rank)` aliases of the window column. */
  private def isRankOf(e: Expression, rnAttr: Attribute): Boolean = e match {
    case a: Attribute => a.semanticEquals(rnAttr)
    case Cast(inner, _, _, _) => isRankOf(inner, rnAttr)
    case _ => false
  }

  /** Extract the k bound from the filter condition, if the condition is
    * EXACTLY a bound on the rank column (conjunctions fall through — the
    * built-in planner keeps full generality). */
  private def limitFromCond(cond: Expression, rank: Attribute): Option[Int] = {
    def longOf(l: Literal): Option[Long] = l match {
      case IntegerLiteral(v) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(r, l: Literal) if isRankOf(r, rank) =>
        longOf(l).filter(v => v >= 1 && v <= Int.MaxValue).map(_.toInt)
      case LessThan(r, l: Literal) if isRankOf(r, rank) =>
        longOf(l).filter(v => v >= 2 && v <= Int.MaxValue).map(v => (v - 1).toInt)
      case GreaterThanOrEqual(l: Literal, r) if isRankOf(r, rank) =>
        longOf(l).filter(v => v >= 1 && v <= Int.MaxValue).map(_.toInt)
      case EqualTo(r, l: Literal) if isRankOf(r, rank) =>
        longOf(l).filter(_ == 1L).map(_.toInt)
      case EqualTo(l: Literal, r) if isRankOf(r, rank) =>
        longOf(l).filter(_ == 1L).map(_.toInt)
      case _ => None
    }
  }
}
