package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, IntegerType, LongType, TimestampType}

/** Automatic RANGE-JOIN rewrite — q129's cell-bucketization as a
  * Catalyst optimizer `Rule[LogicalPlan]` instead of a hand-applied
  * kernel (the brief's option (c) applied to the OPTIMIZER, the way
  * [[AsOfJoinPlan]] applies it to the planner).
  *
  * A keyless time-range theta-join —
  * {{{ a.join(b, abs(a.ta - b.tb) <= δ)                      // symmetric
  *     a.join(b, b.tb - a.ta between 0 and δ)                // directional
  *     a.join(b, a.ta >= b.tb && a.ta <= b.tb + δ)           // spelled out }}}
  * — plans as BroadcastNestedLoopJoin: O(|A|·|B|) comparisons and a
  * broadcast that dies when neither side is small. This rule detects
  * every conjunctive spelling that bounds an integral difference
  * x − y (x from one side, y from the other) to a finite window
  * [lo, hi], and rewrites the join into the scale form transparently:
  *
  *   - the window has width W = max(hi − lo, 1); the probe side (x's)
  *     explodes each row to the ≤2 distinct cells `(x−hi) div W` and
  *     `(x−lo) div W` its matching interval x−hi ≤ y ≤ x−lo can touch
  *     (`array_distinct` is load-bearing: when both endpoints land in
  *     one cell, exploding twice would emit duplicate pairs);
  *   - the build side (y's) registers in its single cell `y div W`;
  *   - the theta-join becomes an EQUI-join on cell, with the ORIGINAL
  *     condition kept as a post-join filter (so the rewrite can only
  *     narrow candidates, never change semantics);
  *   - a final projection restores the original output, dropping cells.
  *
  * Every matching pair meets exactly once: integer division is
  * monotonic and cell boundaries sit W apart, so an interval of length
  * hi − lo ≤ W spans at most one boundary — the build cell is always
  * one of the probe's two endpoint cells (signs included: toward-zero
  * division keeps exact multiples exact, so the boundary-count argument
  * holds for negative timestamps too). A degenerate window (lo = hi,
  * i.e. `x − y = c`) still rewrites — W = 1 makes the cell join an
  * exact offset-equality join, which is precisely the right plan.
  *
  * TWO independently bounded difference dimensions (a spatial box join
  * `|x−x'| ≤ dx AND |y−y'| ≤ dy`) compose into a 2-D GRID rewrite: the
  * probe explodes the ≤4-element cross product of its per-dimension
  * endpoint cells, the build registers once in its (cell₁, cell₂), and
  * the join is equi on the composite key — the optimizer form of the
  * hand-built neighbor-cell join (q217). Dimensions beyond the second
  * stay in the kept filter (fan-out doubles per dimension; the filter
  * already enforces them).
  *
  * The rewrite FIRES only when the join is Inner, the window bounds are
  * integral literals with lo ≤ hi, the compared expressions split
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

  /** One conjunct's contribution: a bound on the difference p − q.
    * `upper = true` means p − q ≤ c, else p − q ≥ c.
    */
  private final case class DiffBound(
      p: Expression, q: Expression, upper: Boolean, c: Long)

  private def litVal(l: Any): Option[Long] = l match {
    case i: Int => Some(i.toLong)
    case i: Long => Some(i)
    case _ => None
  }

  /** Int-typed ± nodes in the ORIGINAL predicate evaluate wrapped
    * 32-bit (non-ANSI), while cell bucketing computes the same
    * difference in Long after Cast — a pair whose Int difference
    * overflows can satisfy the wrapped original yet land in distant
    * cells, so the rewrite would silently drop rows the un-rewritten
    * plan emits. Accept Int arithmetic only under ANSI (where the
    * original join itself fails loudly on overflow, so every surviving
    * pair is overflow-free); Long-typed arithmetic matches the
    * bucketing width and wraps identically on both paths.
    */
  private def exactArith(node: Expression): Boolean =
    node.dataType == LongType ||
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  /** Integral columns bucketize directly; `TimestampType` bucketizes
    * through [[UnixMicros]] (its physical value IS UTC micros, so the
    * conversion is TZ-independent and exact — which is why NTZ, whose
    * session-TZ cast could straddle a DST fold, is NOT supported).
    */
  private def integral(e: Expression): Boolean =
    (e.dataType == LongType || e.dataType == IntegerType ||
      e.dataType == TimestampType) && e.deterministic

  /** Normalize `u ≤ v` (non-strict) into difference bounds. Every
    * integral spelling of a one-sided window lands here —
    * Subtract-vs-literal, bare column vs column ± literal, the plain
    * column-vs-column comparison (bound 0) — plus the native timestamp
    * spelling `ts ≤ ts' + INTERVAL` (day-time intervals only: their
    * literal is exact micros; year-month intervals have no fixed width
    * and can never bucketize).
    */
  private def leBounds(u: Expression, v: Expression): Seq[DiffBound] = (u, v) match {
    case (x, TimestampAddInterval(y, Literal(c: Long, _: DayTimeIntervalType), _))
        if x.dataType == TimestampType =>
      Seq(DiffBound(x, y, upper = true, c))
    case (TimestampAddInterval(y, Literal(c: Long, _: DayTimeIntervalType), _), x)
        if x.dataType == TimestampType =>
      Seq(DiffBound(x, y, upper = false, c))
    case (s @ Subtract(x, y, _), Literal(c, IntegerType | LongType)) if exactArith(s) =>
      litVal(c).map(DiffBound(x, y, upper = true, _)).toSeq
    case (Literal(c, IntegerType | LongType), s @ Subtract(x, y, _)) if exactArith(s) =>
      litVal(c).map(DiffBound(x, y, upper = false, _)).toSeq
    case (x, a @ Add(y, Literal(c, IntegerType | LongType), _))
        if integral(x) && exactArith(a) =>
      litVal(c).map(DiffBound(x, y, upper = true, _)).toSeq
    case (x, a @ Add(Literal(c, IntegerType | LongType), y, _))
        if integral(x) && exactArith(a) =>
      litVal(c).map(DiffBound(x, y, upper = true, _)).toSeq
    case (a @ Add(y, Literal(c, IntegerType | LongType), _), x)
        if integral(x) && exactArith(a) =>
      litVal(c).map(DiffBound(x, y, upper = false, _)).toSeq
    case (a @ Add(Literal(c, IntegerType | LongType), y, _), x)
        if integral(x) && exactArith(a) =>
      litVal(c).map(DiffBound(x, y, upper = false, _)).toSeq
    case (x, s @ Subtract(y, Literal(c, IntegerType | LongType), _))
        if integral(x) && exactArith(s) =>
      litVal(c).map(v => DiffBound(x, y, upper = true, -v)).toSeq
    case (s @ Subtract(y, Literal(c, IntegerType | LongType), _), x)
        if integral(x) && exactArith(s) =>
      litVal(c).map(v => DiffBound(x, y, upper = false, -v)).toSeq
    case (x, y) if integral(x) && integral(y) &&
        x.references.nonEmpty && y.references.nonEmpty =>
      Seq(DiffBound(x, y, upper = true, 0L))
    case _ => Nil
  }

  /** All difference bounds a single conjunct implies (strict forms
    * shrink by one — exact on integers; `abs` contributes both sides of
    * the symmetric window).
    */
  private def boundsOf(e: Expression): Seq[DiffBound] = e match {
    case LessThanOrEqual(Abs(s @ Subtract(x, y, _), _), Literal(c, IntegerType | LongType))
        if exactArith(s) =>
      litVal(c).toSeq.flatMap(v =>
        Seq(DiffBound(x, y, upper = true, v), DiffBound(x, y, upper = false, -v)))
    case GreaterThanOrEqual(Literal(c, IntegerType | LongType), Abs(s @ Subtract(x, y, _), _))
        if exactArith(s) =>
      litVal(c).toSeq.flatMap(v =>
        Seq(DiffBound(x, y, upper = true, v), DiffBound(x, y, upper = false, -v)))
    case LessThan(Abs(s @ Subtract(x, y, _), _), Literal(c, IntegerType | LongType))
        if exactArith(s) =>
      litVal(c).toSeq.flatMap(v =>
        Seq(DiffBound(x, y, upper = true, v - 1), DiffBound(x, y, upper = false, 1 - v)))
    case GreaterThan(Literal(c, IntegerType | LongType), Abs(s @ Subtract(x, y, _), _))
        if exactArith(s) =>
      litVal(c).toSeq.flatMap(v =>
        Seq(DiffBound(x, y, upper = true, v - 1), DiffBound(x, y, upper = false, 1 - v)))
    case LessThanOrEqual(u, v) => leBounds(u, v)
    case GreaterThanOrEqual(u, v) => leBounds(v, u)
    case LessThan(u, v) => leBounds(u, v).map(b =>
      if (b.upper) b.copy(c = b.c - 1) else b.copy(c = b.c + 1))
    case GreaterThan(u, v) => leBounds(v, u).map(b =>
      if (b.upper) b.copy(c = b.c - 1) else b.copy(c = b.c + 1))
    case _ => Nil
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

  private def asMicros(e: Expression): Expression = e.dataType match {
    case LongType => e
    case TimestampType => UnixMicros(e) // physical micros, TZ-independent
    case _ => Cast(e, LongType)
  }

  /** Orient a bound so `p` references the probe (left) side: a bound on
    * p − q with p on the right flips to the equivalent bound on q − p.
    * Timestamp bounds (micros) must not mix with integral-column bounds.
    */
  private def orient(b: DiffBound, left: LogicalPlan, right: LogicalPlan): Option[DiffBound] =
    if (!integral(b.p) || !integral(b.q) ||
      (b.p.dataType == TimestampType) != (b.q.dataType == TimestampType)) None
    else if (b.p.references.nonEmpty && b.q.references.nonEmpty &&
        b.p.references.subsetOf(left.outputSet) &&
        b.q.references.subsetOf(right.outputSet)) Some(b)
    else if (b.p.references.nonEmpty && b.q.references.nonEmpty &&
        b.p.references.subsetOf(right.outputSet) &&
        b.q.references.subsetOf(left.outputSet))
      Some(DiffBound(b.q, b.p, !b.upper, -b.c))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val windows: Seq[(Expression, Expression, Long, Long)] =
        if (conjuncts.exists(isEquiConjunct(_, left, right))) Nil
        else {
          val bounds = conjuncts.flatMap(boundsOf).flatMap(orient(_, left, right))
          // every (p, q) pair with BOTH a finite lower and upper bound —
          // each is an independently bucketizable dimension
          bounds.map(b => (b.p, b.q)).distinct.flatMap { case (p, q) =>
            val same = bounds.filter(b =>
              b.p.semanticEquals(p) && b.q.semanticEquals(q))
            val los = same.filter(!_.upper).map(_.c)
            val his = same.filter(_.upper).map(_.c)
            if (los.isEmpty || his.isEmpty) None
            else {
              val lo = los.max
              val hi = his.min
              // hi - lo < 0 despite lo <= hi means the span overflowed Long
              if (lo > hi || hi - lo < 0) None else Some((p, q, lo, hi))
            }
          }
        }
      // bucketize up to two dimensions: 1 window = the interval rewrite;
      // 2 windows = the 2-D GRID rewrite (a spatial box join — each
      // dimension contributes ≤2 endpoint cells, the probe explodes
      // their ≤4-element cross product, the build registers in its one
      // (cell₁, cell₂), and the join is equi on the composite key).
      // Exactly-once survives composition: per dimension the build cell
      // is one of the probe's distinct endpoint cells, and the cross
      // product of per-dimension-distinct arrays has no duplicate
      // pairs. Beyond 2-D the fan-out doubles per dimension while extra
      // windows keep filtering post-join anyway — dimensions 3+ stay in
      // the kept filter by design.
      if (windows.isEmpty) j
      else {
        val dims = windows.take(2)
        val probeCells = dims.zipWithIndex.map { case ((p, _, lo, hi), i) =>
          val ta = asMicros(p)
          val w = Literal(math.max(hi - lo, 1L), LongType)
          (ArrayDistinct(CreateArray(Seq(
            IntegralDivide(Subtract(ta, Literal(hi, LongType)), w),
            IntegralDivide(Subtract(ta, Literal(lo, LongType)), w)))),
            AttributeReference(s"graft_cell$i", LongType)())
        }
        val probe = probeCells.foldLeft(left: LogicalPlan) {
          case (child, (cells, attr)) =>
            Generate(Explode(cells), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(attr), child = child)
        }
        val buildCells = dims.zipWithIndex.map { case ((_, q, lo, hi), i) =>
          val w = Literal(math.max(hi - lo, 1L), LongType)
          Alias(IntegralDivide(asMicros(q), w), s"graft_cell$i")()
        }
        val build = Project(right.output ++ buildCells, right)
        val keys = probeCells.map(_._2).zip(buildCells.map(_.toAttribute))
          .map { case (pc, bc) => EqualTo(pc, bc): Expression }
        Project(j.output,
          Filter(cond,
            Join(probe, build, Inner, Some(keys.reduce(And)), hint)))
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
