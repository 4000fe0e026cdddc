package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide plan-shape regression gate.
  *
  * [[PlanSpec]] pins hand-picked plan properties for a few flagship
  * queries; this spec covers EVERY declared query with a checked-in
  * golden of the three load-bearing plan counts — parquet scans, scans
  * with non-empty `PushedFilters`, and `Exchange` nodes (shuffles +
  * broadcasts, minus `ReusedExchange` cache hits). A refactor that adds
  * a shuffle, duplicates a scan, or loses a pushdown to ANY query fails
  * here, not in a post-round bench autopsy.
  *
  * Shapes are read from the UNEXECUTED physical plan (under AQE that is
  * the initial plan): deterministic for fixed test data + session conf,
  * and planning-only, so the whole 85-query sweep costs seconds.
  * Strictly-better shapes (fewer scans/exchanges, more pushdown) pass —
  * regenerate to tighten the golden:
  *
  *   GRAFT_PLANS_REGEN=1 sbt "testOnly graft.PlanGoldenSpec"
  */
class PlanGoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val goldenPath = Paths.get("src/test/resources/plan_expectations.tsv")

  private case class Shape(scans: Int, pushed: Int, exchanges: Int)

  private def shapeOf(name: String): Shape = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    def count(needle: String): Int = needle.r.findAllIn(p).length
    Shape(
      count("FileScan parquet"),
      count("PushedFilters: \\[[^\\]]"),
      count("Exchange") - count("ReusedExchange"))
  }

  test("no query's plan grows scans, loses pushdown, or adds exchanges") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val shapes = names.map(n => n -> shapeOf(n))

    if (sys.env.contains("GRAFT_PLANS_REGEN")) {
      val lines =
        "# query\tscans\tpushed\texchanges — golden plan shapes at sf0.001" +:
          shapes.map { case (n, s) => s"$n\t${s.scans}\t${s.pushed}\t${s.exchanges}" }
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, lines.asJava, StandardCharsets.UTF_8)
      info(s"regenerated $goldenPath (${shapes.size} queries)")
    } else {
      assert(Files.isRegularFile(goldenPath),
        s"missing $goldenPath — run GRAFT_PLANS_REGEN=1 sbt 'testOnly graft.PlanGoldenSpec'")
      val golden = Files.readAllLines(goldenPath).asScala
        .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        .map { l =>
          val Array(n, sc, pu, ex) = l.split("\t")
          n -> Shape(sc.toInt, pu.toInt, ex.toInt)
        }.toMap
      val problems = shapes.flatMap { case (n, s) =>
        golden.get(n) match {
          case None =>
            Some(s"$n: new query with no golden row — regenerate the golden")
          case Some(g) =>
            val bad = Seq(
              (s.scans > g.scans) -> s"scans ${g.scans}->${s.scans}",
              (s.pushed < g.pushed) -> s"pushed filters ${g.pushed}->${s.pushed}",
              (s.exchanges > g.exchanges) -> s"exchanges ${g.exchanges}->${s.exchanges}")
              .collect { case (true, msg) => msg }
            if (bad.isEmpty) None else Some(s"$n: plan regressed (${bad.mkString(", ")})")
        }
      }
      assert(problems.isEmpty, "plan regressions:\n" + problems.mkString("\n"))
    }
  }
}
