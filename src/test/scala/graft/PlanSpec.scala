package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the optimizations the engine leans on
  * (pushdown, pruning, broadcast, top-k) must actually appear in the
  * executed plan, not just be hoped for.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q02 pushes both predicates into the parquet scan") {
    val p = planOf("q02_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("EqualTo(event_type,signup)"))
    assert(p.contains("GreaterThan(value,100.0)"))
  }

  test("q01 prunes the read schema to the projected columns") {
    val p = planOf("q01_scan_project")
    assert(!p.contains("l_shipdate"), "unprojected column must not be read")
    assert(!p.contains("l_tax"))
  }

  test("q06 dictionary joins are broadcast, not shuffled") {
    val p = planOf("q06_dict_lookup")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q10 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q10_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q18 similarity probe uses the codegen'd native cosine") {
    val p = planOf("q18_similarity")
    assert(p.contains("graft_cosine"))
  }
}
