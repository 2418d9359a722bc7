package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Exists, ListQuery, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.Decimal

/** Statement-scoped bin width for [[RangeJoinRewrite]] — the per-join
  * alternative to the session-global `spark.graft.rangeJoin.binWidth`
  * conf, which (as the rule's doc warns) rewrites EVERY
  * opposite-inequality join in the session while set, possibly in the
  * wrong unit.
  *
  * Usage mirrors Spark's built-in join hints:
  * {{{
  *   df.hint("range_bin", 3600).join(other, cond)          // DataFrame
  *   SELECT /*+ RANGE_BIN(3600) */ ... FROM a JOIN b ON …  -- SQL
  * }}}
  * The width applies to every range/overlap join BENEATH the hint in the
  * same plan tree (innermost hint wins on nesting) and to nothing else —
  * two joins in one session can carry two different widths with no conf
  * set. Width units are the bound columns' bin image: native for numeric
  * columns, epoch MICROS for timestamps, epoch DAYS for dates — and
  * because the hint names one specific join, timestamp/date containments
  * with raw `[start, end)` columns (which the conf path declines — its
  * unit would be a blind guess) ARE hintable. The hint carries exactly
  * ONE width, applied to the join's primary range dimension; a second
  * dimension still bins only from its own inferable sliding-window
  * literal (a width list would need a width-to-conjunct mapping the
  * user can't see — for full multi-dimension control call
  * `Joins.rangeJoin(left, right, keys, dims)` directly).
  *
  * Resolution: Spark's analyzer knows only its built-in hint names and
  * would drop `RANGE_BIN` with an "Unrecognized hint" warning, so
  * [[ResolveRangeBinHint]] (injected via
  * `SparkSessionExtensions.injectResolutionRule`, which runs before the
  * analyzer's hint-removal batch) converts the [[UnresolvedHint]] into
  * the [[RangeBinHint]] marker node. The marker is transparent (output =
  * child output) and is consumed — width read, node stripped — by
  * [[RangeJoinRewrite]]; joins BORN in `RewriteSubquery` (semi/anti
  * joins from `EXISTS`/`IN` predicates) see it too, in either placement:
  * a hint written inside the subquery is hoisted to the outer operator
  * at analysis (see [[ResolveRangeBinHint]]), the early optimizer pass
  * keeps the marker alive while a predicate subquery sits beneath it,
  * and the final pass ([[RangeJoinRewriteFinal]], which runs after
  * `RewriteSubquery`) consumes the width and strips the marker
  * unconditionally, so it never reaches physical planning.
  */
final case class RangeBinHint(width: Long, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): RangeBinHint = copy(child = newChild)
}

/** Analyzer rule: `UnresolvedHint("RANGE_BIN", Seq(width), child)` →
  * [[RangeBinHint]]. A malformed width fails loudly — the user opted in
  * by writing the hint, and silently dropping it would be undiagnosable
  * (the same contract as the conf's validation in [[RangeJoinRewrite]]).
  *
  * A hint written INSIDE a subquery —
  * `WHERE EXISTS (SELECT /&#42;+ RANGE_BIN(w) &#42;/ …)` — is HOISTED: the
  * marker is stripped from the subquery plan and re-wrapped around the
  * outer operator holding the subquery expression. Two reasons: (1) the
  * join the hint targets is born at exactly that outer node (when
  * `RewriteSubquery` turns the predicate into a semi/anti join), so the
  * outer placement is where [[RangeJoinRewrite]] can consume the width;
  * (2) a correlated subquery may hold outer references ONLY beneath
  * operators Spark's `ValidateSubqueryExpression` whitelists — a marker
  * left above the correlated filter fails analysis. Hoisting covers
  * EXISTS / IN always, and other subquery kinds when correlated (an
  * uncorrelated scalar subquery keeps its marker: its joins live inside
  * the subquery plan, which `OptimizeSubqueries` optimizes — and strips —
  * standalone). Trade-off, documented: a hint deep inside a predicate
  * subquery that targeted a join WITHIN the subquery body is applied to
  * the subquery-born join instead — hint the inner join from the outer
  * statement, or use `Joins.rangeJoin`, for that shape.
  */
object ResolveRangeBinHint extends Rule[LogicalPlan] {

  val HintName = "RANGE_BIN"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case UnresolvedHint(name, params, child)
          if name.equalsIgnoreCase(HintName) =>
        RangeBinHint(parseWidth(params), child)
      case node if node.expressions.exists(_.exists {
          case s: SubqueryExpression => hoistable(s) && hasMarker(s.plan)
          case _ => false
        }) =>
        var width: Option[Long] = None
        val cleaned = node.transformExpressions {
          case s: SubqueryExpression if hoistable(s) && hasMarker(s.plan) =>
            val (stripped, w) = stripMarkers(s.plan)
            (width, w) match {
              case (None, _) => width = w
              case (Some(first), Some(other)) if other != first =>
                // fail-loud policy, soft form: the hoist target can carry
                // ONE width, so a second differing hint must not vanish
                // without a diagnostic (parseWidth's contract)
                logWarning(s"$HintName: operator holds multiple hoisted " +
                  s"subquery hints with different widths — keeping the " +
                  s"first ($first), ignoring $other. Hint the outer " +
                  "statement once, or call Joins.rangeJoin directly for " +
                  "per-join width control.")
              case _ => ()
            }
            s.withNewPlan(stripped)
        }
        width.map(RangeBinHint(_, cleaned)).getOrElse(cleaned)
    }

  /** EXISTS/IN plans are inlined as join inputs by `RewriteSubquery`, so
    * their hints always hoist; any other subquery kind hoists only when
    * correlated (where the marker node would fail
    * `ValidateSubqueryExpression`'s outer-reference whitelist).
    */
  private def hoistable(s: SubqueryExpression): Boolean = s match {
    case _: Exists | _: ListQuery => true
    case other => other.isCorrelated
  }

  private def hasMarker(plan: LogicalPlan): Boolean =
    plan.exists(_.isInstanceOf[RangeBinHint])

  /** Remove every marker from a subquery plan; the outermost width wins
    * (matching "innermost hint wins" from the hoist target's viewpoint —
    * the hoisted marker lands closest to the born join).
    */
  private def stripMarkers(plan: LogicalPlan): (LogicalPlan, Option[Long]) = {
    var w: Option[Long] = None
    val stripped = plan.resolveOperatorsUp {
      case RangeBinHint(width, child) =>
        w = Some(width) // resolveOperatorsUp: last assignment = outermost
        child
    }
    (stripped, w)
  }

  private def parseWidth(params: Seq[Any]): Long = {
    def fail(detail: String): Nothing =
      throw new IllegalArgumentException(
        s"$HintName hint takes exactly one positive integer bin width " +
          s"(in the bound columns' bin-image units), $detail")
    val w = params match {
      case Seq(one) => one match {
        case i: Int => i.toLong
        case l: Long => l
        case Literal(v, _) => v match {
          case i: Int => i.toLong
          case l: Long => l
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case d: Decimal if d.toDouble == math.floor(d.toDouble) =>
            d.toLong
          case other => fail(s"got literal '$other'")
        }
        case other => fail(s"got '$other'")
      }
      case other => fail(s"got ${other.length} arguments")
    }
    if (w <= 0) fail(s"got $w")
    w
  }
}
