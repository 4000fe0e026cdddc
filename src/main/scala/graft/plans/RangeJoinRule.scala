package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Automatic RANGE-JOIN rewrite — q129's cell-bucketization as a
  * Catalyst optimizer `Rule[LogicalPlan]` instead of a hand-applied
  * kernel (the brief's option (c) applied to the OPTIMIZER, the way
  * [[AsOfJoinPlan]] applies it to the planner).
  *
  * A keyless time-range theta-join
  * {{{ a.join(b, abs(a.ta - b.tb) <= δ) }}}
  * plans as BroadcastNestedLoopJoin: O(|A|·|B|) comparisons and a
  * broadcast that dies when neither side is small. This rule detects
  * the shape in the logical plan and rewrites it into the scale form
  * transparently — the user keeps writing the declarative condition:
  *
  *   - probe side (the one whose bound column appears on the LEFT of
  *     the subtraction) explodes each row to the ≤2 distinct cells of
  *     width W = 2δ its interval [t−δ, t+δ] can touch
  *     (`array_distinct` is load-bearing: when both endpoints land in
  *     one cell, exploding twice would emit duplicate pairs);
  *   - build side registers in its single cell `t div W`;
  *   - the theta-join becomes an EQUI-join on cell, with the ORIGINAL
  *     condition kept as a post-join filter (so the rewrite can only
  *     narrow candidates, never change semantics);
  *   - a final projection restores the original output, dropping cells.
  *
  * Every matching pair meets exactly once: integer division is
  * monotonic and cell boundaries sit W apart, so an interval of length
  * exactly W spans at most one boundary — the build cell is always one
  * of the probe's two endpoint cells (signs included: toward-zero
  * division keeps exact multiples exact, so the boundary count
  * argument holds for negative timestamps too).
  *
  * The rewrite FIRES only when the join is Inner, the bound is a
  * positive integral literal, the two compared expressions split
  * across the two sides, and NO equi-join conjunct is already present
  * (with an equi key the standard hash join is the right plan, and the
  * guard also makes the rule idempotent: the join it emits is
  * equi-keyed, so a fixed-point batch — or an AQE re-optimization that
  * pushed the kept filter back into the join — cannot match it again).
  *
  * Install per session via [[RangeJoin.install]]
  * (`spark.experimental.extraOptimizations`, idempotent) or for all
  * sessions through [[graft.functions.GraftExtensions]].
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** `abs(x - y) <= δ` in any of its four spellings (≤/≥/</> with the
    * literal on either side), normalized to (x, y, δ) with δ the
    * INCLUSIVE bound. Strict forms shrink by one — exact on integers.
    */
  private def absBound(e: Expression): Option[(Expression, Expression, Long)] = {
    def lit(l: Any): Option[Long] = l match {
      case i: Int => Some(i.toLong)
      case i: Long => Some(i)
      case _ => None
    }
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(d, IntegerType | LongType)) =>
        lit(d).map(v => (x, y, v))
      case GreaterThanOrEqual(Literal(d, IntegerType | LongType), Abs(Subtract(x, y, _), _)) =>
        lit(d).map(v => (x, y, v))
      case LessThan(Abs(Subtract(x, y, _), _), Literal(d, IntegerType | LongType)) =>
        lit(d).map(v => (x, y, v - 1))
      case GreaterThan(Literal(d, IntegerType | LongType), Abs(Subtract(x, y, _), _)) =>
        lit(d).map(v => (x, y, v - 1))
      case _ => None
    }
  }

  /** True when the conjunct is an equality joining the two sides — the
    * standard-hash-join guard (and the idempotency guard, see above).
    */
  private def isEquiConjunct(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = e match {
    case EqualTo(a, b) => splitsAcross(a, b, l, r)
    case EqualNullSafe(a, b) => splitsAcross(a, b, l, r)
    case _ => false
  }

  private def splitsAcross(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
        (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists(isEquiConjunct(_, left, right))
      val bound = if (hasEqui) None else conjuncts.iterator.flatMap { c =>
        absBound(c).flatMap { case (x, y, d) =>
          if (d <= 0 || !integral(x) || !integral(y) || !x.deterministic || !y.deterministic) {
            None
          } else if (x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet)) {
            Some((asLong(x), asLong(y), d))
          } else if (y.references.subsetOf(left.outputSet) &&
              x.references.subsetOf(right.outputSet)) {
            Some((asLong(y), asLong(x), d))
          } else None
        }
      }.take(1).toList.headOption
      bound match {
        case None => j
        case Some((ta, tb, delta)) =>
          val w = Literal(2 * delta, LongType)
          val d = Literal(delta, LongType)
          val cells = ArrayDistinct(CreateArray(Seq(
            IntegralDivide(Subtract(ta, d), w),
            IntegralDivide(Add(ta, d), w))))
          val probeCell = AttributeReference("graft_cell", LongType)()
          val probe = Generate(Explode(cells), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(probeCell), child = left)
          val buildCell = Alias(IntegralDivide(tb, w), "graft_cell")()
          val build = Project(right.output :+ buildCell, right)
          Project(j.output,
            Filter(cond,
              Join(probe, build, Inner,
                Some(EqualTo(probeCell, buildCell.toAttribute)), hint)))
      }
  }
}

/** Session-level installer + the declarative user surface. */
object RangeJoin {
  /** Idempotently adds [[RangeJoinRule]] to this session's optimizer
    * (`experimental.extraOptimizations` — the runtime analog of
    * `injectOptimizerRule`, usable on an already-built session the way
    * [[AsOf.join]] installs its strategy).
    */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(RangeJoinRule))
      exp.extraOptimizations = exp.extraOptimizations :+ RangeJoinRule
  }
}
