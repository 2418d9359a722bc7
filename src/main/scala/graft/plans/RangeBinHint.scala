package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Literal}
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
  * [[RangeJoinRewrite]] on its first optimizer pass, so it never reaches
  * physical planning. Limitation: joins that are BORN after that pass
  * (e.g. semi-joins from `EXISTS` subquery rewriting) no longer see the
  * hint; use the conf for those.
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
  */
object ResolveRangeBinHint extends Rule[LogicalPlan] {

  val HintName = "RANGE_BIN"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case UnresolvedHint(name, params, child)
          if name.equalsIgnoreCase(HintName) =>
        RangeBinHint(parseWidth(params), child)
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
