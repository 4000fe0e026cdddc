package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quality, TextAnalysis}

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

  test("q130 fused gates agree with the standalone q28 and q123 verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    // recompute the cross-tab by joining the two standalone gate outputs
    val h = TextAnalysis.q28QualityScore.run(spark, sf01)
      .select(col("doc_id"), (col("quality_score") >= 0.28).as("keep_h"))
    val c = TextAnalysis.q123QualityClassifier.run(spark, sf01)
      .select(col("doc_id"), col("keep").as("keep_c"))
    val src = graft.engine.Tables.documents(spark, sf01).select("doc_id", "source")
    val joined = h.join(c, "doc_id").join(src, "doc_id")
      .groupBy("source")
      .agg(
        sum(when(col("keep_h") && col("keep_c"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("keep_h") && !col("keep_c"), 1L).otherwise(0L)).as("n_h_only"),
        sum(when(!col("keep_h") && col("keep_c"), 1L).otherwise(0L)).as("n_c_only"),
        sum(when(!col("keep_h") && !col("keep_c"), 1L).otherwise(0L)).as("n_neither"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val reported = Quality.q130GateAgreement.run(spark, sf01)
      .select("source", "n_both", "n_h_only", "n_c_only", "n_neither")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(reported === joined)
    // non-vacuous: the gates must actually disagree somewhere
    assert(reported.exists(r => r._3 > 0 || r._4 > 0))
  }

  test("q128 confusion matrix partitions the corpus; shares sum to 1 per label") {
    import spark.implicits._
    val rows = TextAnalysis.q128LangConfusion.run(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    val nDocs = graft.engine.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum === nDocs, "every doc lands in exactly one cell")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-12, s"$lang shares")
    }
    // non-vacuous: the heuristic must both hit and miss somewhere
    assert(rows.exists(r => r._1 == r._2) && rows.exists(r => r._1 != r._2))
  }

  test("q123 classifier scores equal the brute-force hashed-model recompute") {
    // recompute every doc's score from scratch on the driver: md5 the
    // token, take the 15-hex-char prefix bucket, Knuth-hash it to a
    // weight, sum exactly in integers — the HOF projection must agree
    // bit-for-bit, and the keep flag must be exactly score > 0
    import spark.implicits._
    def weight(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (BigInt(hex, 16) % 1024).toLong * 2654435761L % 2048 - 1024
    }
    val reported = TextAnalysis.q123QualityClassifier.run(spark, sfDir)
      .select("doc_id", "n_toks", "score_raw", "score", "keep")
      .as[(Long, Int, Long, Double, Boolean)].collect()
    val texts = graft.engine.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(reported.nonEmpty)
    reported.foreach { case (id, n, raw, score, keep) =>
      val toks = texts(id).split(" ").filter(_.nonEmpty)
      assert(n === toks.length)
      assert(raw === toks.map(weight).sum, s"raw score mismatch for doc $id")
      assert(score === raw.toDouble / (1024.0 * n))
      assert(keep === (score > 0))
    }
  }
}
