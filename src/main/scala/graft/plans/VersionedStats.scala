package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

import graft.sources.v2.VersionedScan

/** Make the versioned catalog table's MANIFEST STATISTICS visible to
  * join planning (q298).
  *
  * [[VersionedScan]] implements [[SupportsReportStatistics]] (row
  * counts and byte sizes are manifest arithmetic, post-prune), but the
  * scan is a [[V1Scan]], and Spark's pushdown wraps every V1 scan in
  * [[V1ScanWrapper]] — which implements only `Scan`, so
  * `DataSourceV2ScanRelation.computeStats` never sees the interface
  * and prices the table at `defaultSizeInBytes` (effectively
  * infinite). The consequence at 100 TB is severe: a 25-row dimension
  * table joined to a fact NEVER broadcasts from the estimate — the
  * initial plan is a full sort-merge shuffle of the fact side, and AQE
  * can only repair it after the first shuffle has already been paid.
  *
  * The rule runs among the user-provided optimizations (AFTER the
  * early-pushdown batch that created the wrapper, BEFORE physical
  * planning reads stats) and swaps the wrapper for a subclass that
  * forwards [[SupportsReportStatistics]] to the inner scan — Spark's
  * own physical strategy still matches it as a [[V1ScanWrapper]], so
  * execution is byte-identical; only the ESTIMATE changes. Registered
  * idempotently by [[graft.sources.v2.GraftCatalog.initialize]], the
  * [[RangeJoinRule]] runtime-injection pattern.
  */
final class StatsV1ScanWrapper(inner: VersionedScan,
    handled: Seq[Filter], ops: PushedDownOperators)
  extends V1ScanWrapper(inner, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = inner.estimateStatistics()

  // the parent's generated case-class equality would make this node ==
  // the plain wrapper it replaces (same product fields, permissive
  // inherited canEqual) — and TreeNode.transform KEEPS the original
  // node when the rule's output fastEquals it, silently undoing the
  // swap. Type-asymmetric equality makes the replacement stick.
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case o: StatsV1ScanWrapper =>
      o.v1Scan == v1Scan && o.handledFilters == handledFilters &&
        o.pushedDownOperators == pushedDownOperators
    case _ => false
  }
  override def hashCode(): Int = 31 * v1Scan.hashCode() + 1
}

object VersionedStatsRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
        if w.v1Scan.isInstanceOf[VersionedScan] &&
          !w.isInstanceOf[StatsV1ScanWrapper] =>
      r.copy(scan = new StatsV1ScanWrapper(
        w.v1Scan.asInstanceOf[VersionedScan],
        w.handledFilters, w.pushedDownOperators))
  }

  /** Idempotent runtime registration on an already-built session (the
    * [[RangeJoinRule.register]] pattern — `extraOptimizations` runs in
    * the "User Provided Optimizers" batch, after early scan pushdown).
    */
  def register(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(VersionedStatsRule))
      exp.extraOptimizations = exp.extraOptimizations :+ VersionedStatsRule
  }
}
