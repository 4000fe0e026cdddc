package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.TextAnalysis

/** Cross-check for q101's per-document repetition metrics: recompute all
  * three metrics driver-side with plain Scala collections and compare
  * row-for-row. This exercises the higher-order-function run-length
  * encoding (mode-bigram via sorted-run trick) independently of the
  * DuckDB oracle's unnest/window formulation.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def maxRun[A](xs: Seq[A]): Int =
    if (xs.isEmpty) 0
    else xs.tail.foldLeft((xs.head, 1, 1)) { case ((prev, run, best), x) =>
      val r = if (x == prev) run + 1 else 1
      (x, r, math.max(best, r))
    }._3

  test("q101 metrics match a plain-Scala recomputation") {
    val got = TextAnalysis.q101Repetition.run(spark, sfDir)
      .as[(Long, Int, Double, Double, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size == docs.length)

    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq.filter(_.nonEmpty)
      val n = toks.size
      val dupFrac = (n - toks.distinct.size).toDouble / n
      val bigrams = toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val topBi = bigrams.groupBy(identity).values.map(_.size).max
      val topBiFrac = topBi.toDouble / (n - 1)
      val run = maxRun(toks)
      val rep = topBiFrac > 0.05 || dupFrac > 0.6 || run >= 3
      val (gn, gd, gt, gr, gflag) = got(id)
      assert(gn == n, s"doc $id n_tokens")
      assert(gd == dupFrac, s"doc $id dup_token_frac")
      assert(gt == topBiFrac, s"doc $id top_bigram_frac")
      assert(gr == run, s"doc $id max_token_run")
      assert(gflag == rep, s"doc $id repetitive")
    }
  }

  test("q101 plan is a single projection: no exchange before the sort") {
    val df = TextAnalysis.q101Repetition.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // one Sort for presentation order; no Exchange other than the one
    // feeding that sort, and no generate/expand/join from the metrics
    assert(!plan.contains("Generate"), "explode crept into q101")
    assert(!plan.toLowerCase.contains("join"), "join crept into q101")
    // allowed exchanges: widen's round-robin (parallelize the single-row-
    // group testdata scan) and the final range sort — but never a
    // hash-partitioned shuffle, which would mean a groupBy/window snuck in
    assert(!plan.contains("hashpartitioning"),
      s"q101 must not hash-shuffle (per-row metrics only):\n$plan")
  }
}
