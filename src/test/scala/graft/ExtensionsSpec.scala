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

  private def hasNestedLoop(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")

  test("range-join rule rewrites the naive theta-join and preserves its results") {
    import org.apache.spark.sql.functions.{abs, col, lit}
    import spark.implicits._
    val av = (0L until 200L).map(i => (i, i * 37 % 1000))
    val bv = (0L until 200L).map(i => (i, i * 53 % 1000))
    val joined = spark.createDataFrame(av).toDF("ida", "ta")
      .join(spark.createDataFrame(bv).toDF("idb", "tb"),
        abs(col("ta") - col("tb")) <= lit(7L))
      .select("ida", "idb").orderBy("ida", "idb")
    // the injected rule must eliminate the nested-loop plan...
    assert(!hasNestedLoop(joined))
    // ...and agree row-for-row with an independent brute-force answer
    // (computed driver-side — the shared session is no reference point,
    // since any earlier q157 run installs the rule there too)
    val brute = (for {
      (ida, ta) <- av
      (idb, tb) <- bv
      if math.abs(ta - tb) <= 7
    } yield (ida, idb)).sorted
    assert(joined.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) == brute)
    assert(brute.size > 100, "fixture must exercise a dense pair set")
  }

  test("range-join rule declines Int-typed arithmetic unless ANSI is on") {
    import org.apache.spark.sql.functions.{abs, col, lit}
    // Under ANSI (the Spark 4 default) Int overflow in the original
    // predicate throws, so every surviving pair is overflow-free and
    // the Long-space rewrite is sound — it must fire.
    val a2 = spark.createDataFrame(Seq((1L, 100), (2L, 5))).toDF("ida", "ta")
    val b2 = spark.createDataFrame(Seq((10L, 96), (20L, 300))).toDF("idb", "tb")
    val j2 = a2.join(b2, abs(col("ta") - col("tb")) <= lit(7)).select("ida", "idb")
    assert(!hasNestedLoop(j2), "ANSI Int arithmetic must rewrite")
    assert(j2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
    // With ANSI disabled, Int − Int evaluates wrapped 32-bit while
    // cell bucketing computes in Long: on an overflowing pair the two
    // disagree, so the rewrite must NOT fire. The fixture makes the
    // disagreement observable: Int.MinValue − Int.MaxValue wraps to
    // +1 ≤ 7, so the WRAPPED original emits the pair — a Long-space
    // rewrite would silently drop it.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val a = spark.createDataFrame(Seq((1L, Int.MinValue), (2L, 5))).toDF("ida", "ta")
      val b = spark.createDataFrame(Seq((10L, Int.MaxValue), (20L, 3))).toDF("idb", "tb")
      val j = a.join(b, abs(col("ta") - col("tb")) <= lit(7)).select("ida", "idb")
      assert(hasNestedLoop(j), "non-ANSI Int arithmetic must keep the un-rewritten plan")
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 20L)), s"wrapped-Int semantics preserved: $got")
      // Long-typed arithmetic wraps identically on both paths, so the
      // rewrite stays on even without ANSI
      val al = spark.createDataFrame(Seq((1L, 100L), (2L, 5L))).toDF("ida", "ta")
      val bl = spark.createDataFrame(Seq((10L, 96L), (20L, 300L))).toDF("idb", "tb")
      val jl = al.join(bl, abs(col("ta") - col("tb")) <= lit(7L)).select("ida", "idb")
      assert(!hasNestedLoop(jl), "non-ANSI Long arithmetic must still rewrite")
      assert(jl.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("range-join rule covers negative timestamps and emits each pair once") {
    import org.apache.spark.sql.functions.{abs, col, lit}
    import spark.implicits._
    // values straddling zero exercise toward-zero division's wide cell
    val ts = Seq(-25L, -10L, -1L, 0L, 1L, 9L, 10L, 26L, 100L)
    val a = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("ida", "ta")
    val b = ts.zipWithIndex.map { case (t, i) => (i.toLong + 100, t + 3) }.toDF("idb", "tb")
    val got = a.join(b, abs(col("ta") - col("tb")) <= lit(5L))
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(!hasNestedLoop(a.join(b, abs(col("ta") - col("tb")) <= lit(5L))))
    val brute = (for {
      (t1, i1) <- ts.zipWithIndex
      (t2, i2) <- ts.zipWithIndex
      if math.abs(t1 - (t2 + 3)) <= 5
    } yield (i1.toLong, i2.toLong + 100)).sorted
    assert(got == brute) // equality (not subset) also proves no duplicate pairs
  }

  test("range-join rule rewrites asymmetric BETWEEN windows and offset equality") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val ts = (-40L to 40L by 3).toSeq
    val a = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("ida", "ta")
    val b = ts.zipWithIndex.map { case (t, i) => (i.toLong + 100, t + 1) }.toDF("idb", "tb")
    // directional window: 0 <= tb - ta <= 10, spelled as the user would
    val dir = a.join(b, (col("tb") - col("ta")).between(lit(0L), lit(10L)))
      .select("ida", "idb")
    assert(!hasNestedLoop(dir))
    val gotDir = dir.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wantDir = (for {
      (ta, i) <- ts.zipWithIndex; (tb0, j) <- ts.zipWithIndex
      d = (tb0 + 1) - ta
      if d >= 0 && d <= 10
    } yield (i.toLong, j.toLong + 100)).sorted
    assert(gotDir == wantDir && wantDir.nonEmpty)
    // spelled-out conjuncts (>= and <= against y + c) hit the same path
    val spelled = a.join(b,
      col("tb") >= col("ta") && col("tb") <= col("ta") + lit(10L))
      .select("ida", "idb")
    assert(!hasNestedLoop(spelled))
    assert(spelled.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == wantDir)
    // degenerate window (exact offset equality) becomes a W=1 cell join
    val eq = a.join(b, (col("tb") - col("ta")).between(lit(1L), lit(1L)))
      .select("ida", "idb")
    assert(!hasNestedLoop(eq))
    val gotEq = eq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wantEq = (for {
      (ta, i) <- ts.zipWithIndex; (tb0, j) <- ts.zipWithIndex
      if (tb0 + 1) - ta == 1
    } yield (i.toLong, j.toLong + 100)).sorted
    assert(gotEq == wantEq && wantEq.nonEmpty)
  }

  test("range-join rule handles native timestamp intervals (the spelling users type)") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val clicks = (0L until 60L).map(i => (i, ts(i * 7 % 90))).toDF("cid", "cts")
    val buys = (0L until 60L).map(i => (i + 100, ts(i * 11 % 90 + 1))).toDF("pid", "pts")
    val joined = clicks.join(buys,
      col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 10 MINUTES"))
      .select("cid", "pid")
    assert(!hasNestedLoop(joined))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      i <- 0L until 60L
      j <- 0L until 60L
      d = (j * 11 % 90 + 1) - (i * 7 % 90)
      if d >= 0 && d <= 10
    } yield (i, j + 100)).sorted
    assert(got == want && want.nonEmpty)
  }

  test("range-join rule fires through the spark.sql path too") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 500L)).toDF("ida", "ta").createOrReplaceTempView("rja")
    Seq((7L, 12L), (8L, 700L)).toDF("idb", "tb").createOrReplaceTempView("rjb")
    val df = spark.sql(
      "SELECT ida, idb FROM rja JOIN rjb ON abs(ta - tb) <= 5 ORDER BY ida, idb")
    assert(!hasNestedLoop(df))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 7L)))
    val between = spark.sql(
      "SELECT ida, idb FROM rja JOIN rjb ON tb - ta BETWEEN 0 AND 5 ORDER BY ida, idb")
    assert(!hasNestedLoop(between))
    assert(between.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 7L)))
  }

  test("range-join rule stands down when an equi key is present") {
    import org.apache.spark.sql.functions.{abs, col, lit}
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "ta")
    val b = Seq((1L, 12L), (2L, 99L)).toDF("rk", "tb")
    val df = a.join(b, col("k") === col("rk") && abs(col("ta") - col("tb")) <= lit(5L))
    // an equi-keyed plan must NOT grow the explode/cell machinery
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_cell"))
    assert(df.select("k").collect().map(_.getLong(0)).toSeq == Seq(1L))
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
