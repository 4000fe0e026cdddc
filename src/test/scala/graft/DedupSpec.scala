package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Guards for the dedup-quality evaluation pair (q228 full / q266
  * sampled) the oracle gate can't express: the sampled report must be a
  * faithful estimator of the full-corpus report, and the stratum must
  * be the deterministic md5 bucket, not a seeded RNG.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.GraftFunctions.register(s)
    s
  }
  private val sfDir = "/root/testdata/sf0.001"

  test("q266 sampled P/R lands within the stated bound of q228's full-corpus P/R") {
    val full = Dedup.q228DedupEval.run(spark, sfDir).head()
    val sampled = Dedup.q266DedupEvalSampled.run(spark, sfDir).head()
    val (pF, rF) = (full.getAs[Long]("precision_bp"), full.getAs[Long]("recall_bp"))
    val (pS, rS) = (sampled.getAs[Long]("precision_bp"), sampled.getAs[Long]("recall_bp"))
    // the stratum keeps ~40% of docs, hence ~16% of pairs: at this test
    // scale the full corpus has ~28 exact pairs, the stratum ~5, so the
    // sampled point estimate carries small-sample width. The bound below
    // is the honest one for n≈5: recall (what the bands MISS) is the
    // number dedup quality decisions ride on and must agree tightly;
    // precision (over-generation) may wobble by a few candidate pairs.
    assert(math.abs(rS - rF) <= 1500L, s"sampled recall $rS vs full $rF")
    assert(math.abs(pS - pF) <= 3000L, s"sampled precision $pS vs full $pF")
    // sampling actually happened: the stratum is a strict subset
    val nAll = graft.engine.Tables.documents(spark, sfDir).count()
    val nS = sampled.getAs[Long]("n_docs")
    assert(nS > 0 && nS < nAll, s"stratum $nS of $nAll")
    // and it is the DETERMINISTIC md5 bucket (q67's pattern) — an
    // independent recount over the raw table must give the same size
    val expected = graft.engine.Tables.documents(spark, sfDir)
      .filter(conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 15), 16, 10).cast("long") % 100 < 40)
      .count()
    assert(nS == expected, s"stratum size $nS != md5-bucket recount $expected")
  }

  test("q266's exact arm equals q216's kernel restricted to the stratum") {
    // the sampled ground truth must be EXACT within the stratum: every
    // full-corpus J >= 1/2 pair with both endpoints sampled, and nothing
    // else — the filter may only remove out-of-stratum pairs, never
    // in-stratum ones (the q103/q51 agreement discipline)
    val inStratum = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 15), 16, 10).cast("long") % 100 < 40
    val stratumIds = graft.engine.Tables.documents(spark, sfDir)
      .filter(inStratum).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val fullPairs = Dedup.exactJaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => stratumIds(a) && stratumIds(b) }
      .toSet
    val sampledPairs = Dedup.exactJaccardPairsOf(
      graft.engine.Tables.documents(spark, sfDir)
        .select("doc_id", "text").filter(inStratum))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampledPairs === fullPairs)
  }
}
