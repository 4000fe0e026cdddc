package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

/** Plan-shape guard for the q104 quality audit: the rule set must cost
  * two passes regardless of rule count — one conditional aggregation
  * (with the FK dimension broadcast) plus one keyed uniqueness agg.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("audit plan: 3 scans, broadcast FK probe, no extra shuffles") {
    val df = Quality.q104QualityAudit.run(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 3, s"expected lineitem x2 + orders x1 scans, saw $scans:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"FK probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join in the audit:\n$p")
    assert(!p.contains("Expand"), s"uniqueness must avoid countDistinct Expand:\n$p")
  }

  test("audit reports every declared rule exactly once") {
    val rules = Quality.q104QualityAudit.run(spark, sfDir)
      .select("rule").collect().map(_.getString(0)).toSeq
    assert(rules == rules.sorted && rules.distinct == rules)
    assert(rules.size == 7)
  }
}
