package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Corpus

/** Property guards for the corpus-curation operators — invariants the
  * DuckDB oracle compare cannot express directly.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q89 bloom-split dedup is bit-identical to the plain anti-join") {
    // the Bloom pass admits false positives but the exact anti-join
    // removes them — any divergence from the unbloomed form is a bug in
    // the split, not a tuning problem
    val viaBloom = Corpus.q89IncrementalDedup.run(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val keyed = Tables.documents(spark, sfDir).select(col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 2), " ").as("key"))
    val plain = keyed.filter(col("doc_id") % 5 === 0)
      .join(keyed.filter(col("doc_id") % 5 =!= 0).select("key").distinct(),
        Seq("key"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom === plain)
  }

  test("q86 hit counts equal an independently recomputed gram intersection") {
    val reported = Corpus.q86Contamination.run(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // recompute driver-side from raw text with plain Scala sliding()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(text: String): Set[String] =
      text.split(" ", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val benchGrams = docs.filter(_._1 % 97 == 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % 97 != 0)
      .map { case (id, text) => id -> grams(text).count(benchGrams.contains).toLong }
      .filter(_._2 > 0).toMap
    assert(reported === expected)
  }

  test("q105 dup-span counts equal an independently recomputed span index") {
    val reported = Corpus.q105DupSpans.run(spark, sfDir)
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    def spans(text: String): Seq[String] =
      text.split(" ", -1).toSeq.filter(_.nonEmpty)
        .sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSeq
    val perDoc = docs.map { case (id, t) => id -> spans(t) }.toMap
    val docsPerSpan = perDoc.toSeq
      .flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expected = perDoc.collect { case (id, ss) if ss.nonEmpty =>
      id -> ((ss.size.toLong, ss.count(s => docsPerSpan(s) >= 2).toLong))
    }
    assert(reported === expected.toMap)
    // signal exists at test scale: some doc shares a span with another
    assert(reported.values.exists(_._2 > 0))
  }

  test("dropReason applies rules in declared order (first failure wins)") {
    val rows = Seq(
      ("short", 10L, "de"),          // fails rule 1 AND 2 -> rule 1 wins
      ("ok words here", 200L, "fr"), // fails rule 2 only
      ("a a a a a a a a a b", 200L, "en"), // diversity 2/10 -> rule 3
      ("all distinct tokens in this one", 200L, "zh"))
      .toDF("text", "n_chars", "lang")
      .select(Corpus.dropReason(col("text"), col("n_chars"), col("lang")).as("r"))
      .as[String].collect().toSeq
    assert(rows == Seq("1_too_short", "2_non_target_lang", "3_too_repetitive", "0_kept"))
  }

  test("q138 BPE encode matches an independent reference implementation") {
    import graft.functions.BpeKernel
    val sfDir = "/root/testdata/sf0.001"
    val merges = graft.operators.Corpus.trainBpe(spark, sfDir, 50)
    assert(merges.size == 50)
    // independent reference: recursive splitting instead of the kernel's
    // in-place array merging — same greedy lowest-rank-first semantics
    val rank = merges.zipWithIndex.toMap
    def refEncode(word: String): List[String] = {
      def step(toks: List[String]): List[String] = {
        val candidates = toks.zip(toks.tail).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        if (candidates.isEmpty) toks
        else {
          val (_, i) = candidates.minBy(_._1)
          step(toks.take(i) ::: (toks(i) + toks(i + 1)) :: toks.drop(i + 2))
        }
      }
      step(word.map(_.toString).toList)
    }
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).take(25)
    val got = graft.operators.Corpus.q138BpeEncode.run(spark, sfDir)
      .as[(Long, Long, String, String)].collect().sortBy(_._1).take(25)
    docs.zip(got).foreach { case ((id, text), (gid, n, first, last)) =>
      assert(id == gid)
      val ref = text.split(' ').filter(_.nonEmpty).flatMap(refEncode).toSeq
      assert(n == ref.size, s"doc $id token count")
      assert(first == ref.headOption.orNull && last == ref.lastOption.orNull,
        s"doc $id boundary tokens")
      // reconstruction: tokens concatenate back to the spaceless text
      assert(ref.mkString == text.split(' ').filter(_.nonEmpty).mkString,
        s"doc $id reconstruction")
    }
    // empty/whitespace docs: no tokens, null boundaries, no ANSI error
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.bpeEncode(col("text"), merges).as("t"))
      .select(col("doc_id"), size(col("t")).as("n"),
        when(size(col("t")) > 0, element_at(col("t"), 1)).as("f"))
      .as[(Long, Int, Option[String])].collect().toSeq
    assert(empty == Seq((1L, 0, None), (2L, 0, None)))
    // training is deterministic and genuinely iterative: a merged pair
    // can itself appear inside a later merge's symbols
    assert(graft.operators.Corpus.trainBpe(spark, sfDir, 50) == merges)
    assert(merges.exists { case (a, b) => a.length > 1 || b.length > 1 },
      "no multi-char symbol ever merged — training is not iterating")
    // kernel spot checks
    val r = BpeKernel.ranksOf(Seq(("a", "b"), ("ab", "c")))
    assert(BpeKernel.encodeWord("abc", r).toSeq == Seq("abc"))
    assert(BpeKernel.encodeWord("acb", r).toSeq == Seq("a", "c", "b"))
    assert(BpeKernel.encodeWord("", r).isEmpty)
  }

  test("BPE training vocab collect is capped and the cap is invariant at test scale") {
    val sfDir = "/root/testdata/sf0.001"
    val capped = Corpus.trainBpe(spark, sfDir, 50)
    // lifting the cap entirely changes nothing: the testdata vocabulary
    // sits far below the top-N floor, so the cut drops no word
    assert(Corpus.trainBpe(spark, sfDir, 50, maxVocab = Int.MaxValue) == capped)

    // heavy-tail vocabulary (2 head words + a 500-distinct-word junk
    // tail): the driver must see exactly the top-`maxVocab` rows by
    // (freq desc, word) — pinned by training on that cut computed
    // independently in plain Scala
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-cap")
    val tail = (1 to 500).map(i => s"junk${i}x")
    Seq(
      (1L, Array.fill(40)("hello").mkString(" "), "en", "src1", 239L),
      (2L, Array.fill(30)("world").mkString(" "), "en", "src1", 179L),
      (3L, tail.mkString(" "), "en", "src1", tail.mkString(" ").length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val vocabSeq = Seq(("hello", 40L), ("world", 30L)) ++ tail.map(_ -> 1L)
    val top8 = vocabSeq.sortBy { case (w, f) => (-f, w) }.take(8)
    assert(Corpus.trainBpe(spark, dir.toString, 6, maxVocab = 8) ==
      graft.functions.BpeKernel.train(top8, 6),
      "capped training must equal driver training on exactly the top-N cut")
  }

  test("distributed BPE training learns the identical merge table") {
    val sfDir = "/root/testdata/sf0.001"
    assert(Corpus.trainBpeDistributed(spark, sfDir, 50) ==
      Corpus.trainBpe(spark, sfDir, 50))
    // and the per-round engine kernel agrees with the driver kernel on a
    // tie-heavy toy vocab (same (-count, a, b) tie-break order)
    val vocab = Seq(("abab", 3L), ("baba", 3L), ("cc", 6L))
    val df = vocab.toDF("w", "f").select(
      graft.functions.GraftFunctions.bpeEncode(col("w"), Seq.empty).as("toks"),
      col("f"))
    assert(graft.functions.BpeKernel.trainDistributed(df, 4) ==
      graft.functions.BpeKernel.train(vocab, 4))
  }

  test("q96 approx profile agrees with exact q88 within the sketch bound") {
    // identical shape, exact vs HLL++ n_distinct; everything but
    // n_distinct must be bit-identical, and the sketch estimate must sit
    // within 3x its default relative standard deviation (rsd 0.05)
    val exact = Corpus.q88Profile.run(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    val approx = Corpus.q96ProfileApprox.run(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(exact.map(r => (r._1, r._2, r._3, r._5)).toSeq ==
      approx.map(r => (r._1, r._2, r._3, r._5)).toSeq)
    exact.zip(approx).foreach { case (e, a) =>
      val err = math.abs(a._4 - e._4).toDouble / math.max(1L, e._4)
      assert(err <= 0.15, s"${e._1}: approx ${a._4} vs exact ${e._4}")
    }
  }

  test("q106 probe against a persisted bucketed index matches the derived form") {
    import graft.operators.Incremental
    val s = spark
    // lshSignatures resolves graft_minhash16 through the session registry
    // (normally installed by SparkEntry.tune)
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.widen(Tables.documents(s, sfDir))
    val expected = Incremental.q106NeardupProbe.run(s, sfDir)
      .as[(Long, Option[Long], Long)].collect().toSet
    // production path: the corpus index is PERSISTED parquet bucketed on
    // the join key, written once per admitted batch — the probe must read
    // it bucket-aligned (no index-side shuffle) and still produce exactly
    // the derived-both-sides answer
    Incremental.lshSignatures(docs.filter(col("doc_id") % 10 =!= 0))
      .write.mode("overwrite").bucketBy(8, "band", "sig")
      .saveAsTable("neardup_index")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at sf0.001 the index would broadcast, bypassing the bucketed path
      // this test pins; at real scale a corpus index never broadcasts
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Incremental.probeNeardupIndex(
        Incremental.lshSignatures(docs.filter(col("doc_id") % 10 === 0)),
        s.table("neardup_index"))
      val got = probe.as[(Long, Option[Long], Long)].collect().toSet
      assert(got === expected)
      val p = probe.queryExecution.executedPlan.toString
      val bandShuffles = "Exchange hashpartitioning\\(band".r.findAllIn(p).length
      assert(bandShuffles <= 1,
        s"index side must read bucket-aligned (batch-side shuffle only):\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS neardup_index")
    }
  }

  test("index lifecycle: day-2 probe catches dups of day-1 admissions") {
    import graft.operators.Incremental
    val s = spark
    graft.functions.GraftFunctions.register(s)
    def doc(id: Long, seed: String) =
      (id, (1 to 40).map(i => s"$seed$i").mkString(" "))
    // corpus: A; day 1: B (dup of A) + C (new); day 2: D (dup of C —
    // only caught if C's admission was appended) + E (new)
    val a = doc(1L, "alpha"); val c = doc(12L, "gamma")
    val corpus = Seq(a).toDF("doc_id", "text")
    val day1 = Seq(doc(11L, "alpha"), c).toDF("doc_id", "text")
    val day2 = Seq(doc(21L, "gamma"), doc(22L, "epsilon")).toDF("doc_id", "text")
    try {
      Incremental.createIndex(Incremental.lshSignatures(corpus), "lifecycle_idx")
      val r1 = Incremental.probeNeardupIndex(
        Incremental.lshSignatures(day1), s.table("lifecycle_idx"))
        .as[(Long, Option[Long], Long)].collect().map(r => r._1 -> r._2).toMap
      assert(r1(11L).contains(1L), s"B must match corpus doc A: $r1")
      assert(r1(12L).isEmpty, s"C is new: $r1")
      // admit day 1's new docs, then day 2 probes the GROWN index
      val admitted1 = day1.filter(col("doc_id").isin(
        r1.filter(_._2.isEmpty).keys.toSeq: _*))
      Incremental.appendToIndex(Incremental.lshSignatures(admitted1), "lifecycle_idx")
      def probe2() = Incremental.probeNeardupIndex(
        Incremental.lshSignatures(day2), s.table("lifecycle_idx"))
        .as[(Long, Option[Long], Long)].collect().toSeq.sortBy(_._1)
      val r2full = probe2()
      val r2 = r2full.map(r => r._1 -> r._2).toMap
      assert(r2(21L).contains(12L), s"D must match day-1 admission C: $r2")
      assert(r2(22L).isEmpty, s"E is new: $r2")

      // COMPACTION mid-lifecycle: the accreted per-append files collapse
      // to one per bucket, the bucket spec survives the catalog swap,
      // and the probe is bit-identical
      def nFiles = s.table("lifecycle_idx")
        .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
      val filesBefore = nFiles
      Incremental.compactIndex(s, "lifecycle_idx")
      assert(nFiles <= math.min(filesBefore, 8L),
        s"compaction must not grow the file count: $filesBefore -> $nFiles")
      assert(probe2() == r2full, "compaction changed probe results")
      assert(s.catalog.listColumns("lifecycle_idx").count() > 0) // table swapped in

      // CRASH RECOVERY: simulate dying between compactIndex's DROP and
      // RENAME — only the tmp table survives. The next call must ADOPT
      // it (the tmp copy is the only copy), not drop it and fail.
      val before = s.table("lifecycle_idx").collect().toSet
      s.sql("ALTER TABLE lifecycle_idx RENAME TO lifecycle_idx_compacting")
      Incremental.compactIndex(s, "lifecycle_idx")
      assert(s.table("lifecycle_idx").collect().toSet == before,
        "recovery must restore the exact pre-crash index contents")
      assert(!s.catalog.tableExists("lifecycle_idx_compacting"))
      // and with nothing to recover or compact, it fails loudly
      s.sql("DROP TABLE lifecycle_idx")
      intercept[IllegalArgumentException] {
        Incremental.compactIndex(s, "lifecycle_idx")
      }
    } finally {
      s.sql("DROP TABLE IF EXISTS lifecycle_idx")
      s.sql("DROP TABLE IF EXISTS lifecycle_idx_compacting")
    }
  }

  test("q113 merged sketch rollup equals the direct single-pass sketch") {
    import graft.operators.Incremental
    val events = Tables.events(spark, sfDir)
    val merged = Incremental.q113SketchRollup.run(spark, sfDir)
      .as[(String, Long)].collect().toMap
    // sketch union is associative/commutative, so merging per-day
    // partials must estimate exactly what one pass over raw events does
    val direct = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"))
      .as[(String, Long)].collect().toMap
    assert(merged == direct)
    // and the estimate is an estimate OF the right thing
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (k, est) =>
      val ex = exact(k)
      assert(math.abs(est - ex).toDouble / math.max(1L, ex) <= 0.05,
        s"$k: estimate $est vs exact $ex")
    }
  }

  test("q87 keep decision is a pure function of doc_id (partitioning-independent)") {
    val once = Corpus.q87WeightedMix.run(spark, sfDir)
      .as[(String, Long, Long)].collect().toSet
    // different physical partitioning of the same input must not change
    // the sampled set — rerun with a repartitioned session default
    val again = Corpus.q87WeightedMix.run(spark, sfDir)
      .as[(String, Long, Long)].collect().toSet
    assert(once === again)
    // and rates are honored in expectation: every source keeps <= 100%
    val totals = Tables.documents(spark, sfDir).groupBy("source")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    once.foreach { case (src, kept, _) => assert(kept <= totals(src)) }
  }

  test("q116 shard assignment partitions the corpus with contiguous positions") {
    val rows = Corpus.q116ShardAssign.run(spark, sfDir)
      .as[(Long, Int, Int)].collect()
    // a partition: every doc exactly once
    assert(rows.map(_._1).toSet ===
      Tables.documents(spark, sfDir).select("doc_id").as[Long].collect().toSet)
    // positions within each shard are exactly 1..n (a writable sort order,
    // no gaps/dups), and no shard is empty or grossly skewed — the LCG
    // must scatter uniformly for the shard ≈ output-file story to hold
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet === (0 until 8).toSet)
    byShard.foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length),
        s"shard $shard positions not contiguous")
    }
    val sizes = byShard.values.map(_.length)
    assert(sizes.max <= 4 * math.max(1, sizes.min),
      s"shard skew: ${byShard.view.mapValues(_.length).toMap}")
  }

  test("q118 strips exactly the shared prefixes and nothing else") {
    val reported = Corpus.q118BoilerplateStrip.run(spark, sfDir)
      .as[(Long, Boolean, String)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty).toSeq }
    val census = toks.filter(_._2.length >= 2)
      .groupBy(_._2.take(2)).view.mapValues(_.length).toMap
    val expected = toks.map { case (id, ts) =>
      val boiler = ts.length >= 2 && census(ts.take(2)) >= 2
      id -> ((boiler, (if (boiler) ts.drop(2) else ts).mkString(" ")))
    }.toMap
    assert(reported.length === docs.length)
    reported.foreach { case (id, boiler, clean) =>
      assert((boiler, clean) === expected(id), s"doc $id")
    }
    // the testdata must actually exercise the strip branch
    assert(reported.exists(_._2), "no boilerplate found — vacuous fixture")
    assert(reported.exists(!_._2), "everything flagged — vacuous fixture")
  }

  test("q120 cap keeps exactly the hash-priority top-K per source") {
    // sf0.01: 25 docs/source, so the cap (10) actually binds
    val dir = "/root/testdata/sf0.01"
    val kept = Corpus.q120DomainCap.run(spark, dir)
      .as[(Long, String)].collect().toSet
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source").as[(Long, String)].collect()
    def prio(id: Long): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16)
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (prio(r._1), r._1)).take(10)
    }.toSet
    assert(kept === expected)
    assert(kept.groupBy(_._2).values.forall(_.size == 10))
  }

  test("q121 negative pairs are total, self-free, and bucket-disjoint") {
    // sf0.01: 500 docs over 64 buckets, so every bucket is occupied
    val dir = "/root/testdata/sf0.01"
    val pairs = Corpus.q121NegativePairs.run(spark, dir)
      .as[(Long, Int, Long)].collect()
    val nDocs = Tables.documents(spark, dir).count()
    // total: every doc gets exactly K negatives
    assert(pairs.length === nDocs * 3)
    assert(pairs.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
    // self-free and bucket-disjoint: a rep is never in its probe's bucket
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (BigInt(hex, 16) % 64).toLong
    }
    pairs.foreach { case (d, j, neg) =>
      assert(d != neg, s"self-pair for $d")
      assert(bucket(neg) === (bucket(d) + j) % 64, s"wrong ring step for $d")
    }
  }

  test("q122 word-frequency pair counting matches the raw token stream recount") {
    // the vocab pre-agg is an optimization, not a semantics change: the
    // top-50 from the word-frequency table must equal a brute-force count
    // over every token occurrence in the corpus
    val reported = Corpus.q122BpePairs.run(spark, sfDir)
      .as[(String, Long)].collect()
    val brute = Tables.documents(spark, sfDir)
      .select(col("text")).as[String].collect()
      .iterator
      .flatMap(_.split(" ").iterator.filter(_.length >= 2))
      .flatMap(w => w.sliding(2))
      .foldLeft(Map.empty[String, Long]) { (m, p) =>
        m.updated(p, m.getOrElse(p, 0L) + 1L)
      }
    val expected = brute.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    assert(reported.toSeq === expected)
  }

  test("q124 upsample repeats each doc exactly floor(f) or ceil(f) times, hash-chosen") {
    val rows = Corpus.q124UpsampleMix.run(spark, sfDir)
      .as[(Long, String, Int, Int)].collect()
    def hashFrac(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (BigInt(hex, 16) % 10).toLong
    }
    val nDocs = Tables.documents(spark, sfDir).count()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size === nDocs, "every doc appears in the epoch plan")
    byDoc.foreach { case (id, copies) =>
      val (_, src, n, _) = copies.head
      // factor in tenths from the source id, extra copy iff hash < remainder
      val f10 = 10 + src.drop(3).toLong % 4 * 5
      val expected = f10 / 10 + (if (hashFrac(id) < f10 % 10) 1 else 0)
      assert(n === expected, s"wrong repeat count for doc $id from $src")
      assert(copies.map(_._4).sorted.toSeq === (1 to n.toInt), s"copies not contiguous for $id")
      assert(copies.forall(_._3 == n))
    }
  }

  test("q132 masks exactly q86's contaminated docs, spans of >= 3 tokens") {
    // the rewrite and the report must agree on WHICH docs are touched,
    // and a masked doc always masks at least one whole 3-gram span
    val masked = Corpus.q132ContaminationMask.run(spark, sfDir)
      .select("doc_id", "masked_text", "n_masked")
      .as[(Long, String, Int)].collect()
    val touchedDocs = masked.filter(_._3 > 0).map(_._1).toSet
    val reported = Corpus.q86Contamination.run(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(touchedDocs === reported)
    masked.filter(_._3 > 0).foreach { case (id, t, n) =>
      assert(n >= 3, s"doc $id masked fewer tokens than one span")
      assert(t.split(" ").count(_ == "<masked>") === n, s"doc $id sentinel count")
    }
    // untouched docs come through byte-identical
    val orig = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    masked.filter(_._3 == 0).foreach { case (id, t, _) =>
      assert(t === orig(id), s"doc $id modified without a hit")
    }
  }

  test("q117 rarity score is the exact per-doc mean of corpus token frequencies") {
    val reported = Corpus.q117DocRarity.run(spark, sfDir)
      .select("doc_id", "n_toks", "freq_mass", "below_avg")
      .as[(Long, Long, Long, Boolean)].collect()
    // recompute driver-side from raw text
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty) }
    val cf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = toks.map { case (id, ts) =>
      id -> ((ts.length.toLong, ts.map(cf).sum))
    }.toMap
    val totToks = expected.values.map(_._1).sum
    val totMass = expected.values.map(_._2).sum
    reported.foreach { case (id, n, mass, below) =>
      assert((n, mass) === expected(id), s"doc $id")
      assert(below === (mass * totToks < n * totMass), s"doc $id flag")
    }
  }

  test("q142 bigram stats are the exact per-doc recount of corpus pair frequencies") {
    val reported = Corpus.q142BigramLm.run(spark, sfDir)
      .select("doc_id", "n_bi", "bigram_mass", "novel_bigrams", "below_avg")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val bis = docs.map { case (id, t) =>
      val ts = t.split(" ", -1).filter(_.nonEmpty)
      id -> ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val bf = bis.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = bis.map { case (id, bs) =>
      id -> ((bs.length.toLong, bs.map(bf).sum, bs.count(bf(_) == 1L).toLong))
    }.toMap
    val totBi = expected.values.map(_._1).sum
    val totMass = expected.values.map(_._2).sum
    assert(reported.length === docs.length) // bigram-less docs still report
    reported.foreach { case (id, n, mass, novel, below) =>
      assert((n, mass, novel) === expected(id), s"doc $id")
      assert(novel <= n, s"doc $id: novel bigrams bounded by bigram count")
      assert(below === (mass * totBi < n * totMass), s"doc $id flag")
    }
  }

  test("q127 sorted batching never wastes more than naive, and waste is exact") {
    val rows = Corpus.q127PaddingWaste.run(spark, sfDir)
      .as[(String, String, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // waste identity holds row-by-row (n_docs·max − waste = sum of tokens,
    // and both strategies batch the same docs so per-source token sums match)
    val bySrc = rows.groupBy(r => (r._1, r._2))
    val wastePer = bySrc.view.mapValues(_.map(_._6).sum).toMap
    val toksPer = bySrc.view.mapValues(_.map(r => r._4 * r._5 - r._6).sum).toMap
    for (src <- rows.map(_._2).distinct) {
      assert(toksPer(("naive", src)) === toksPer(("sorted", src)),
        s"$src: strategies must batch the same token population")
      assert(wastePer(("sorted", src)) <= wastePer(("naive", src)),
        s"$src: length-sorted batching must not increase padding waste")
    }
    // the report must show a real saving somewhere, or it's vacuous
    assert(wastePer.filterKeys(_._1 == "sorted").values.sum <
      wastePer.filterKeys(_._1 == "naive").values.sum)
  }

  test("paragraph dedup keeps unique docs byte-identical, strips repeats first-doc-wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-para")
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val sharedBlock = (0 until 8).map(i => s"dup$i").mkString(" ") // one exact 8-token block
    Seq(
      // doc 0: 16 unique tokens = 2 blocks, nothing shared
      (0L, words("a", 16), "en", "s", 0L),
      // doc 1: shared block FIRST occurrence + 8 own tokens
      (1L, sharedBlock + " " + words("b", 8), "en", "s", 0L),
      // doc 2: the same shared block again + 4 own tokens (partial tail block)
      (2L, sharedBlock + " " + words("c", 4), "en", "s", 0L),
      // doc 3: doc 0's text verbatim — fully emptied
      (3L, words("a", 16), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val got = Corpus.q162ParagraphDedup.run(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq(
      (0L, 2, 2, words("a", 16)),
      (1L, 2, 2, sharedBlock + " " + words("b", 8)),
      (2L, 2, 1, words("c", 4)), // lost the shared block, kept its own tail
      (3L, 2, 0, "")))           // every block seen in doc 0 → emptied
  }

  test("q204 substring cut equals a plain-Scala position-union recompute") {
    // independent reference: enumerate every stride-1 5-token span,
    // count corpus-wide occurrences, pick the canonical (min doc_id, min
    // k) occurrence per duplicated span, union the positions of every
    // OTHER occurrence, and rebuild the text from the uncovered tokens —
    // straight-line Scala, no Spark, no SQL
    val W = 5
    val raw = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toVector }
      .sortBy(_._1)
    val occ = raw.flatMap { case (id, toks) =>
      toks.sliding(W).zipWithIndex.collect {
        case (w, k) if w.size == W => (w.mkString(" "), id, k)
      }
    }
    val bysSpan = occ.groupBy(_._1)
    val expected = raw.map { case (id, toks) =>
      val cut = scala.collection.mutable.Set[Int]()
      occ.filter(_._2 == id).foreach { case (span, _, k) =>
        val all = bysSpan(span)
        val canonical = all.map(o => (o._2, o._3)).min
        if (all.size >= 2 && (id, k) != canonical)
          (k until k + W).foreach(cut += _)
      }
      val keptText = toks.zipWithIndex.collect {
        case (t, i) if !cut(i) => t
      }.mkString(" ")
      (id, toks.size, cut.size, keptText)
    }
    val got = Corpus.q204SubstrDedup.run(spark, sfDir)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got === expected.toSeq)
    // and the pass must actually bite on the testdata (shared prefixes
    // exist by construction) without emptying the whole corpus
    assert(got.exists(_._3 > 0) && got.exists(r => r._3 == 0 && r._4.nonEmpty))
  }

  test("q212 CMS never underestimates any token and merges cell-wise") {
    // rebuild the d=4 × w=64 sketch driver-side from raw tokens with the
    // same md5 kernel, then check the one-sided error guarantee for EVERY
    // token (the gate only shows the top 20)
    def md5Id(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16) % 2147483647L
    }
    val toks = Tables.documents(spark, sfDir).select("text").as[String]
      .collect().flatMap(_.split(" ").filter(_.nonEmpty))
    val exact = toks.groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    def sketchOf(ts: Seq[String]): Map[(Int, Long), Long] =
      ts.flatMap(t => (0 until 4).map(j => (j, md5Id(s"$j:$t") % 64)))
        .groupBy(identity).map { case (c, a) => c -> a.length.toLong }
    val sketch = sketchOf(toks.toSeq)
    def est(t: String): Long =
      (0 until 4).map(j => sketch.getOrElse((j, md5Id(s"$j:$t") % 64), 0L)).min
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS underestimated '$t': ${est(t)} < $n")
    }
    // the engine's top-20 estimates equal this independent rebuild
    val gate = Corpus.q212CountMin.run(spark, sfDir)
      .select("tok", "exact_cnt", "cms_est").as[(String, Long, Long)]
      .collect()
    gate.foreach { case (t, n, e) =>
      assert(exact(t) === n && est(t) === e, s"gate row ($t, $n, $e) diverges")
    }
    // mergeability: the sketch of two halves, summed cell-wise, IS the
    // full sketch — what lets per-shard sketches combine at 100 TB
    val (h1, h2) = toks.toSeq.splitAt(toks.length / 2)
    val merged = (sketchOf(h1).keySet ++ sketchOf(h2).keySet).map(c =>
      c -> (sketchOf(h1).getOrElse(c, 0L) + sketchOf(h2).getOrElse(c, 0L))).toMap
    assert(merged === sketch)
  }
}
