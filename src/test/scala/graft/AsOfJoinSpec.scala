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

  test("string keys join through the interpreted ordering") {
    val left = Seq(("aa", 100L, "l1"), ("b", 200L, "l2"), ("zz", 50L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq(("aa", 90L, "r_aa"), ("aa", 99L, "r_aa2"), ("b", 300L, "r_b"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("tag"), col("rtag"))
      .as[(String, String)].collect().toMap
    assert(got == Map("l1" -> "r_aa2", "l2" -> null, "l3" -> null))
  }

  test("composite keys join via a packed struct key") {
    // multi-column as-of keys need no operator change: structs are
    // orderable, so packing (symbol, venue) into one struct key — same
    // field names/types both sides — routes through the native exec
    val left = Seq(("ES", 1L, 100L, "l_es1"), ("ES", 2L, 100L, "l_es2"),
      ("NQ", 1L, 100L, "l_nq1"))
      .toDF("sym", "venue", "t", "tag")
      .withColumn("k", struct(col("sym"), col("venue")))
    val right = Seq(("ES", 1L, 90L, "r_es1"), ("ES", 2L, 95L, "r_es2"),
      ("ES", 1L, 120L, "r_late"))
      .toDF("rsym", "rvenue", "rt", "rtag")
      .withColumn("rk", struct(col("rsym").as("sym"), col("rvenue").as("venue")))
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("tag"), col("rtag")).as[(String, String)].collect().toMap
    // (ES,1) and (ES,2) resolve independently; (NQ,1) has no right side
    assert(got == Map("l_es1" -> "r_es1", "l_es2" -> "r_es2", "l_nq1" -> null))
  }

  test("tolerance voids a match older than the window") {
    val left = Seq((1L, 1000L, "in"), (1L, 2000L, "out")).toDF("k", "t", "tag")
    val right = Seq((1L, 900L, "r900")).toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt", tolerance = Some(500L))
      .select(col("tag"), col("rtag"))
      .as[(String, String)].collect().toMap
    // 1000-900=100 <= 500 matches; 2000-900=1100 > 500 is voided
    assert(got == Map("in" -> "r900", "out" -> null))
  }

  test("native tolerance query agrees with the union+window q69-style oracle form") {
    val native = graft.plans.AsOf.q97AsofToleranceNative.run(spark, sfDir)
      .as[(Long, Long, java.time.LocalDateTime, Long)].collect().toSeq
    // independent formulation: q69's window carry with the µs-interval gap
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.TimestampNTZType
    val orders = graft.engine.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("user_id"),
        col("o_orderdate").cast(TimestampNTZType).as("t"))
      .agg(max("o_orderkey").as("id"))
      .select(col("user_id"), col("t"), lit(0).as("src"), col("id"))
    val events = graft.engine.Tables.events(spark, sfDir).select(
      col("user_id"), col("ts").as("t"), lit(1).as("src"), col("event_id").as("id"))
    val w = Window.partitionBy("user_id").orderBy("t", "src", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowForm = orders.unionAll(events)
      .select(col("*"),
        last(when(col("src") === 0, col("id")), ignoreNulls = true).over(w).as("asof_id"),
        last(when(col("src") === 0, col("t")), ignoreNulls = true).over(w).as("asof_t"))
      .filter(col("src") === 1)
      .select(col("id").as("event_id"), col("user_id"), col("t").as("ts"),
        when(col("asof_id").isNotNull &&
          col("asof_t") >= col("t") - expr("INTERVAL 7 DAY"), col("asof_id"))
          .otherwise(lit(-1L)).as("asof_orderkey"))
      .orderBy("event_id")
      .as[(Long, Long, java.time.LocalDateTime, Long)].collect().toSeq
    assert(native == windowForm)
  }

  test("null keys and null timestamps yield unmatched left rows") {
    val left = Seq((Option(1L), Option(100L), "ok"),
      (None, Option(100L), "nullkey"), (Option(1L), None, "nullts"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r90")).toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("tag"), col("rtag"))
      .as[(String, String)].collect().toMap
    assert(got == Map("ok" -> "r90", "nullkey" -> null, "nullts" -> null))
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
