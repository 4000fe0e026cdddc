package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `GraftExtensions` wiring: a session built with
  * `.withExtensions(new GraftExtensions)` (or the
  * `spark.sql.extensions` conf) must expose the native SQL functions
  * AND plan the native as-of operator without any explicit register
  * call — the deployment path a cluster user takes.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // a separate SparkSession over the SHARED SparkContext, with the
    // extensions applied: clear the session registry so getOrCreate
    // builds fresh instead of returning the shared session, restore it
    // after (tests run sequentially in the forked JVM)
    SparkTestSession.spark // ensure the context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("graft_cosine resolves in SQL with no explicit registration") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("graft_nfc resolves in SQL with no explicit registration") {
    val r = spark.sql("SELECT graft_nfc('e\\u0301') AS n").collect().head.getString(0)
    assert(r == "\u00e9")
  }

  test("as-of plans through the injected strategy") {
    import spark.implicits._
    // note: NOT calling AsOf.register — the extensions must provide it
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r90")).toDF("rk", "rt", "rtag")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val df = org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(spark,
      graft.plans.AsOfJoinPlan(lp, rp, attr(lp, "k"), attr(lp, "t"),
        attr(rp, "rk"), attr(rp, "rt"), None))
    assert(df.select("tag", "rtag").as[(String, String)].collect().toSeq
      == Seq(("a", "r90")))
  }
}
