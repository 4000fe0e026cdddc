package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.OffersV2

/** Storage-partitioned execution pins (q236): the graft-offers scan's
  * reported lake-leaf clustering must actually ELIMINATE the shuffles —
  * asserted on the executed plan, with the no-option read as the
  * negative control and value equality between both forms.
  */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val dirs: (String, String) = {
    val dir = graft.engine.Staging.scratch("graft-spj-spec", "lakes").getAbsolutePath
    OffersV2.writeRaw(OffersV2.spjGen(spark, sfDir, yesterday = true), s"$dir/yday")
    OffersV2.writeRaw(OffersV2.spjGen(spark, sfDir, yesterday = false), s"$dir/today")
    (s"$dir/yday", s"$dir/today")
  }

  private def withSpjConfs[A](f: => A): A = {
    val prior = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try f
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    unwrap(df.queryExecution.executedPlan).toString
  }

  private def exchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan).length - "ReusedExchange".r.findAllIn(plan).length

  test("leaf-keyed aggregation over an spj read plans with zero exchanges") {
    val (yday, _) = dirs
    withSpjConfs {
      // countDistinct is NOT count-pushdown-eligible, so this exercises the
      // row scan's reported partitioning, not the aggregate pushdown path
      val agg = OffersV2.readRaw(spark, yday, Map("spj" -> "true"))
        .groupBy("site", "region", "experience")
        .agg(countDistinct(col("company_raw")).as("nc"))
      val p = finalPlan(agg)
      assert(exchanges(p) == 0, s"expected shuffle-free leaf aggregation:\n$p")
    }
  }

  test("the spj join is shuffle-free below the join; the control shuffles") {
    val (yday, today) = dirs
    withSpjConfs {
      val spjPlan = finalPlan(OffersV2.spjChurn(spark, yday, today, spj = true))
      // the join itself must sit directly on sorted scans — the only
      // exchanges in the whole plan carry leaf-grained aggregate rows
      val joinIdx = spjPlan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$spjPlan")
      assert(exchanges(spjPlan.substring(joinIdx)) == 0,
        s"expected no exchange below the join:\n$spjPlan")
      assert(exchanges(spjPlan) <= 2, s"only leaf-grained exchanges allowed:\n$spjPlan")

      val control = finalPlan(OffersV2.spjChurn(spark, yday, today, spj = false))
      val cIdx = control.indexOf("Join")
      assert(exchanges(control.substring(cIdx)) >= 2,
        s"control without spj should shuffle both sides:\n$control")
    }
  }

  test("spj and control forms agree row-for-row") {
    val (yday, today) = dirs
    withSpjConfs {
      val a = OffersV2.spjChurn(spark, yday, today, spj = true).collect().toSeq
      val b = OffersV2.spjChurn(spark, yday, today, spj = false).collect().toSeq
      assert(a == b)
      assert(a.nonEmpty && a.map(_.getString(0)).distinct.size == 2)
    }
  }
}
