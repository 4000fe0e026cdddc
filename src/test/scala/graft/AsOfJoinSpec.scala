package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOf, AsOfJoinExec}

/** The custom as-of operator: its one-pass merge must agree with the
  * engine's union+window formulation (q41) row-for-row, and the planner
  * must deliver the SortMergeJoin-style contract (co-partitioning
  * exchange + sort per side) that the exec's distribution/ordering
  * requirements demand.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("native as-of join agrees with the union+window form row-for-row") {
    val native = graft.plans.AsOf.q94AsofNative.run(spark, sfDir)
      .as[(Long, Long, java.time.LocalDateTime, Long)].collect().toSeq
    val windowForm = graft.operators.Advanced.q41AsofJoin.run(spark, sfDir)
      .as[(Long, Long, java.time.LocalDateTime, Long)].collect().toSeq
    assert(native == windowForm)
  }

  test("planner inserts co-partitioning exchange + sort per side for the exec") {
    val df = graft.plans.AsOf.q94AsofNative.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    // both children must be hash-exchanged on the key and sorted — the
    // contract EnsureRequirements owes our requiredChild* declarations
    assert("Exchange hashpartitioning".r.findAllIn(plan).length >= 2, plan)
    assert("(?m)^.*Sort ".r.findAllIn(plan).length >= 2, plan)
  }

  test("as-of picks the latest right row at or before each left ts") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r90"), (1L, 150L, "r150"), (3L, 10L, "r10"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("tag"), col("rtag"))
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "r90", "b" -> "r150", "c" -> null))
  }

  test("ties on right ts resolve to a match at equality (ts <= semantics)") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, "exact")).toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select("rtag").as[String].collect().toSeq
    assert(got == Seq("exact"))
  }

  test("mismatched key types are rejected at construction") {
    val left = Seq((1, 100L)).toDF("k", "t") // int key
    val right = Seq((1L, 90L)).toDF("rk", "rt")
    val e = intercept[Exception] {
      AsOf.join(left, right, "k", "t", "rk", "rt").collect()
    }
    assert(e.getMessage.contains("key"))
  }
}
