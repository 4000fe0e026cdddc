package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Cost-based-optimizer join reorder, pinned the way SkewSpec pins AQE
  * skew handling: Spark's CBO is OFF by default and reorders only with
  * table-level statistics — this spec documents the exact recipe
  * (catalog tables + ANALYZE + two flags) and proves the reorder
  * actually fires, so a 100 TB deployment knows precisely what it must
  * provide to get stats-driven join trees rather than textual order.
  */
class CboSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("with ANALYZE stats and cbo.joinReorder, the join tree leaves textual order") {
    // three catalog tables of very different sizes, joined in the WORST
    // textual order (big-to-big first, tiny last)
    Seq("graft_cbo_li", "graft_cbo_ord", "graft_cbo_tiny").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").saveAsTable("graft_cbo_li")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .write.mode("overwrite").saveAsTable("graft_cbo_ord")
    Tables.orders(spark, sfDir).select(col("o_custkey").as("c_key"))
      .distinct().limit(5)
      .write.mode("overwrite").saveAsTable("graft_cbo_tiny")
    Seq("graft_cbo_li", "graft_cbo_ord", "graft_cbo_tiny").foreach(t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS"))

    val q =
      """SELECT count(*) FROM graft_cbo_li l
        |JOIN graft_cbo_ord o ON l.l_orderkey = o.o_orderkey
        |JOIN graft_cbo_tiny t ON o.o_custkey = t.c_key""".stripMargin

    def joinTree(cbo: Boolean): String = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.cbo.enabled", cbo.toString)
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      s2.sql(q).queryExecution.optimizedPlan.toString
    }

    val off = joinTree(cbo = false)
    val on = joinTree(cbo = true)
    // without CBO the optimized tree keeps textual order — the TOP join
    // closes over the tiny dim (its condition names c_key); with stats
    // the reorderer joins tiny against orders FIRST, so the top join's
    // condition becomes the fact keys instead
    def topJoinCond(plan: String): String =
      plan.linesIterator.find(_.contains("Join Inner")).getOrElse("")
    assert(topJoinCond(off).contains("c_key"),
      s"baseline shape unexpected:\n$off")
    assert(!topJoinCond(on).contains("c_key"),
      s"CBO did not reorder the tiny dim out of the top join:\n$on")
  }

  test("q269's stats-chosen Q5 tree matches the hand-ordered q147 shape") {
    // q147 is the hand-ordered reference (dims broadcast down the
    // snowflake, exactly ONE shuffle join on the fact keys); q269 hands
    // CBO the worst textual order + ANALYZE stats and must arrive at a
    // plan at least as good — same broadcast-vs-shuffle join mix, no
    // extra exchanges. Counted on the FINAL AQE plan of each.
    def mix(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
      df.queryExecution.executedPlan.execute().count() // settle AQE
      val full = df.queryExecution.executedPlan.toString
      val p = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i => full.substring(0, i)
      }
      def c(re: String) = re.r.findAllIn(p).size
      (c("BroadcastHashJoin") + c("BroadcastNestedLoopJoin"),
        c("SortMergeJoin") + c("ShuffledHashJoin"),
        c("Exchange") - c("ReusedExchange"))
    }
    val ref = mix(graft.operators.Relational.q147TpchQ5.run(spark, sfDir))
    val cbo = mix(graft.operators.Relational.q269CboQ5.run(spark, sfDir))
    assert(cbo._1 == ref._1,
      s"broadcast-join count: cbo ${cbo._1} vs hand-ordered ${ref._1}")
    assert(cbo._2 <= ref._2,
      s"shuffle-join count: cbo ${cbo._2} vs hand-ordered ${ref._2}")
    assert(cbo._3 <= ref._3,
      s"exchange count: cbo ${cbo._3} vs hand-ordered ${ref._3}")
    assert(cbo._2 <= 1, s"Q5 must shuffle-join at most the fact pair, got ${cbo._2}")
  }
}
