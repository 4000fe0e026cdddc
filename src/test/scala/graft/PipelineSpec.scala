package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{Corpus, Pipeline}

/** End-to-end curation pipeline: the whole chain (gate → exact dedup →
  * near-dup keep-list → contamination filter → token budget → shard
  * scatter → JSONL export) runs as one lazily-planned flow, and every
  * stage's invariant must hold on the FINAL output — the form a library
  * user consumes, not the per-stage queries.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark
    graft.functions.GraftFunctions.register(s); s }
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val budget = 2000L
  private val nShards = 4

  private lazy val docs = Tables.widen(Tables.documents(spark, sfDir))
  private lazy val bench = docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
  private lazy val out = Pipeline.curate(
    docs.filter(col("doc_id") % 97 =!= 0), bench, budget, nShards)
    .as[(Long, String, String, Long, Int, Int)].collect()

  test("pipeline emits a non-trivial corpus and every doc passed the gate") {
    assert(out.length > 10)
    val verdicts = docs
      .select(col("doc_id"), Corpus.dropReason(col("text"), col("n_chars"),
        col("lang")).as("v")).as[(Long, String)].collect().toMap
    out.foreach { case (id, _, _, _, _, _) =>
      assert(verdicts(id) == "0_kept", s"doc $id failed the quality gate")
    }
  }

  test("decomposed and precomposed spellings collide in exact dedup (stage 0 NFC)") {
    // identical visible text, different Unicode spelling: doc 1 carries
    // decomposed e+U+0301, doc 2 the precomposed \u00e9. Both must pass
    // the gate (>= 80 canonical chars) and md5-collide after NFC, so
    // only the first-seen id survives. Caller n_chars is deliberately
    // stale/odd — curate recomputes it from canonical text.
    val suffix = " au lait makes the morning quite fine today and the rest of the day goes fine too"
    val twoSpellings = Seq(
      (1L, "cafe\u0301" + suffix, "en", "web", 0L),
      (2L, "caf\u00e9" + suffix, "en", "web", 999L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val curated = Pipeline.curate(twoSpellings,
      Seq((99L, "zzz qqq xxx")).toDF("doc_id", "text"), 1000L, 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(curated == Seq(1L), s"expected only doc 1 to survive, got $curated")
  }

  test("no two output docs share exact text or a benchmark 3-gram") {
    val texts = out.map(_._3)
    assert(texts.distinct.length == texts.length, "exact dup survived")
    def grams(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val benchGrams = bench.select("text").as[String].collect()
      .iterator.flatMap(grams).toSet
    out.foreach { case (id, _, t, _, _, _) =>
      assert(grams(t).intersect(benchGrams).isEmpty, s"doc $id is contaminated")
    }
  }

  test("per-source token budget is a greedy md5-priority prefix, never exceeded") {
    val bySource = out.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._4).sum <= budget, s"$src exceeds the token budget")
    }
  }

  test("shards cover the range, are balanced, and positions are contiguous") {
    val byShard = out.groupBy(_._5)
    assert(byShard.keySet.subsetOf((0 until nShards).toSet))
    val sizes = (0 until nShards).map(s => byShard.get(s).map(_.length).getOrElse(0))
    assert(sizes.max <= 2 * (sizes.min.max(1)) + 8,
      s"shard skew: $sizes — the LCG scatter should be near-uniform")
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._6).sorted.toSeq == (1 to rows.length),
        s"shard $s positions not contiguous")
    }
  }

  test("the curated corpus round-trips through the JSONL export") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeline-jsonl").toString
    val df = Pipeline.curate(
      docs.filter(col("doc_id") % 97 =!= 0), bench, budget, nShards)
    graft.sources.Lake.writeJsonl(df, dir, shards = 2)
    val back = graft.sources.Lake.readJsonl(spark, dir, df.schema)
      .as[(Long, String, String, Long, Int, Int)].collect()
    assert(back.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("pretrain chains curate → tokenize → pack with curate's invariants intact") {
    val merges = Corpus.trainBpe(spark, sfDir, 50)
    val raw = docs.filter(col("doc_id") % 97 =!= 0)
    val pre = Pipeline.pretrain(raw, bench, budget, nShards, merges, binTokens = 64)
      .as[(Long, String, String, Long, Long, Int, Int, Long)].collect()

    // the curated doc set is EXACTLY preserved — tokenize/pack add
    // columns, never rows
    assert(pre.map(r => (r._1, r._2, r._3, r._4, r._6, r._7)).sortBy(_._1).toSeq ==
      out.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).sortBy(_._1).toSeq)

    // the BPE count matches a driver-side re-encode with the same table
    val ranks = graft.functions.BpeKernel.ranksOf(merges)
    pre.take(20).foreach { r =>
      val n = r._3.split(' ').filter(_.nonEmpty)
        .map(w => graft.functions.BpeKernel.encodeWord(w, ranks).length.toLong).sum
      assert(r._5 == n, s"doc ${r._1} BPE count")
    }

    // bin assignment is q99's running-sum semantics per shard,
    // recomputed independently from (shard, pos, n_bpe_tokens)
    pre.groupBy(_._6).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._7).foreach { r =>
        assert(r._8 == cum / 64, s"shard $shard pos ${r._7} bin")
        cum += r._5
      }
    }

    // NO new exchange beyond curate's own: tokenization is a projection
    // and the packing window reuses curate's final (shard) partitioning
    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(
        df.queryExecution.executedPlan.toString).length
    val curatePlan = Pipeline.curate(raw, bench, budget, nShards)
    val prePlan = Pipeline.pretrain(raw, bench, budget, nShards, merges, 64)
    assert(nExchanges(prePlan) == nExchanges(curatePlan),
      "pretrain added a shuffle beyond curate's own")
  }
}
