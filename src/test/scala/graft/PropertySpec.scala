package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, TextOps}

/** Property-based invariants (SURVEY §5.3): generated inputs are batched
  * into ONE DataFrame per property so each property is a single Spark
  * job over hundreds of cases, not hundreds of jobs.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }

  private val weirdChars =
    Gen.oneOf[Char]('a', 'Z', '9', 'ł', 'ó', 'ż', '€', '–', '•', ' ', ' ',
      '\t', '.', ',', '(', ')', '-', '/', 'ä', '@', '#', '"', '\\')
  private val weirdString: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, weirdChars).map(_.mkString))
  private def sample(n: Int, g: Gen[String]): Seq[String] =
    Gen.listOfN(n, g).sample.get

  private val salaryish: Gen[String] = for {
    a <- Gen.chooseNum(0, 99999)
    b <- Gen.chooseNum(0, 99999)
    sep <- Gen.oneOf("–", "-", " do ")
    cur <- Gen.oneOf("zł", "PLN", "EUR", "USD", "CHF", "GBP", "")
    per <- Gen.oneOf("/ mies.", "/ godz.", "/ rok", "", "/ h")
    dec <- Gen.oneOf("", ",50", ",25")
  } yield s"$a$dec $sep $b $cur brutto $per"

  test("graft_nfc composes decomposed sequences, is idempotent, fast-paths clean text (generated)") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    // combining acute / diaeresis / cedilla
    val combining = Gen.oneOf[Char]('\u0301', '\u0308', '\u0327')
    val mixed: Gen[String] = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(6 -> weirdChars, 2 -> Gen.alphaChar, 2 -> combining))
        .map(_.mkString))
    val inputs = sample(300, mixed) ++
      Seq("e\u0301", "\u00e9", "", "abc", "o\u0308\u0301")
    val rows = inputs.toDF("s")
      .select(col("s"), GraftFunctions.nfc(col("s")).as("n1"))
      .select(col("s"), col("n1"), GraftFunctions.nfc(col("n1")).as("n2"))
      .as[(String, String, String)].collect()
    rows.foreach { case (s, n1, n2) =>
      assert(n1 == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      assert(n2 == n1, s"not idempotent on ${s.codePoints().toArray.toSeq}")
      assert(n1.codePointCount(0, n1.length) <= s.codePointCount(0, s.length))
    }
    // the canonical dedup collision: decomposed and precomposed agree
    val pair = Seq("e\u0301", "\u00e9").toDF("s")
      .select(GraftFunctions.nfc(col("s"))).as[String].collect()
    assert(pair(0) == pair(1) && pair(0) == "\u00e9")
  }

  test("BPE kernel matches a recursive reference on generated words and merge tables (generated)") {
    import graft.functions.BpeKernel
    val word: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    // merge tables over the tiny alphabet, including multi-char symbols
    // built from earlier merges — overlap cases like "aaaa" under
    // ("a","a") then ("aa","aa") are the classic greedy-order traps
    val tables: Seq[Seq[(String, String)]] = Seq(
      Seq(("a", "a")),
      Seq(("a", "a"), ("aa", "aa")),
      Seq(("a", "b"), ("ab", "c"), ("b", "a")),
      Seq(("b", "b"), ("a", "bb"), ("abb", "c"), ("c", "a")),
      Seq(("c", "c"), ("b", "c"), ("a", "b")))
    def refEncode(w: String, rank: Map[(String, String), Int]): List[String] = {
      def step(toks: List[String]): List[String] = {
        val cands = toks.zip(toks.drop(1)).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        if (cands.isEmpty) toks
        else {
          val (_, i) = cands.minBy(identity)
          step(toks.take(i) ::: (toks(i) + toks(i + 1)) :: toks.drop(i + 2))
        }
      }
      step(w.map(_.toString).toList)
    }
    val words = sample(200, word) ++ Seq("aaaa", "aaaaa", "abab", "abcabc", "")
    tables.foreach { merges =>
      val ranks = BpeKernel.ranksOf(merges)
      val rank = merges.zipWithIndex.toMap
      words.foreach { w =>
        val got = BpeKernel.encodeWord(w, ranks).toList
        assert(got == refEncode(w, rank),
          s"kernel/reference divergence on '$w' with $merges")
        assert(got.mkString == w, s"reconstruction broke on '$w'")
      }
    }
  }

  test("X2 cleanText is idempotent, space-collapsing, NBSP-free (generated)") {
    import spark.implicits._
    val inputs = sample(300, weirdString)
    val rows = inputs.toDF("s")
      .select(TextOps.cleanText(col("s")).as("c1"))
      .select(col("c1"), TextOps.cleanText(col("c1")).as("c2"))
      .as[(String, String)].collect()
    rows.foreach { case (c1, c2) =>
      assert(c1 == c2, s"cleanText not idempotent on ${c1.toList}")
      assert(!c1.contains("  "), s"double space survived: ${c1.toList}")
      assert(!c1.contains(' '), "NBSP survived")
      assert(c1 == c1.trim, "untrimmed output")
    }
  }

  test("X1 cleanPosition is idempotent and emits only allowed chars (generated)") {
    import spark.implicits._
    // the reference keeps ascii OR unicode-alnum OR ' .,()-'
    // (transform_data.py:38-44) — '/' and '@' survive because they are
    // ascii; '€'/'–'/emoji drop, Polish letters survive as unicode-alnum
    val rows = sample(300, weirdString).toDF("s")
      .select(TextOps.cleanPosition(col("s")).as("c1"))
      .select(col("c1"), TextOps.cleanPosition(col("c1")).as("c2"))
      .as[(String, String)].collect()
    rows.foreach { case (c1, c2) =>
      assert(c1 == c2, s"cleanPosition not idempotent on ${c1.toList}")
      c1.foreach { ch =>
        assert(ch < 128 || ch.isLetterOrDigit,
          s"disallowed char ${ch.toInt} in ${c1.toList}")
      }
      assert(!c1.contains("  "), s"double space survived: ${c1.toList}")
    }
  }

  test("X3–X6 parseSalary invariants on ordered ranges (generated)") {
    import spark.implicits._
    // X6 (transform_data.py:167-173) fans out (first, second) WITHOUT
    // sorting — a preserved reference quirk — so min<=max is only an
    // invariant when the input range is ordered, as real postings are.
    val ordered = salaryish.map { s =>
      // reorder the two leading numbers so a <= b
      val nums = "\\d+(?:,\\d+)?".r.findAllIn(s).toSeq
      if (nums.length >= 2) {
        val Seq(a, b) = nums.take(2).map(x => BigDecimal(x.replace(',', '.')))
        if (a > b) {
          val i = s.indexOf(nums(0)); val j = s.indexOf(nums(1), i + nums(0).length)
          s.substring(0, i) + nums(1) + s.substring(i + nums(0).length, j) +
            nums(0) + s.substring(j + nums(1).length)
        } else s
      } else s
    }
    val parsed = TextOps.parseSalary(col("s"))
    val rows = sample(300, ordered).toDF("s")
      .select(parsed.getField("minimum").as("mn"), parsed.getField("maximum").as("mx"),
        parsed.getField("currency").as("cur"))
      .as[(String, String, String)].collect()
    rows.foreach { case (mn, mx, cur) =>
      if (mn.nonEmpty && mx.nonEmpty)
        assert(BigDecimal(mn) <= BigDecimal(mx), s"min $mn > max $mx")
      // single-number inputs must collapse to min == max (X6 arm 2)
      assert(mn.isEmpty == mx.isEmpty, s"one-sided range: '$mn'..'$mx'")
      assert(Set("PLN", "EUR", "USD", "CHF", "GBP", "")(cur), s"currency $cur")
    }
  }

  test("native md5Id matches the relational conv(md5) id (generated)") {
    import spark.implicits._
    val rows = sample(300, weirdString).filter(_.nonEmpty).toDF("s")
      .select(
        (conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long") % 2147483647L).as("relational"),
        col("s"))
      .as[(Long, String)].collect()
    rows.foreach { case (relational, s) =>
      val native = graft.functions.Sketches.md5Id(s.getBytes("UTF-8"))
      assert(native == relational, s"md5Id mismatch on ${s.toList}")
    }
  }

  test("chunk windows match brute force and cover every token (generated)") {
    import spark.implicits._
    val win = 64; val stride = 32
    // doc i has i tokens "t1..ti" — covers every boundary case from a
    // 1-token doc through several full windows plus ragged tails
    val docs = (1 to 200).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
    val got = graft.operators.Corpus.chunkWindows(docs.toDF("doc_id", "text"))
      .select("doc_id", "chunk_id", "start_tok", "chunk_toks")
      .as[(Long, Long, Long, Long)].collect().toSet
    // the spec, in ten lines of plain Scala
    val expected = docs.flatMap { case (id, text) =>
      val n = text.split(" ").length
      (1 to n by stride).flatMap { s =>
        val len = math.min(win, n - s + 1)
        if (s == 1 || len * 2 >= win)
          Some((id, ((s - 1) / stride).toLong, s.toLong, len.toLong))
        else None
      }
    }.toSet
    assert(got == expected)
    // coverage: with stride = win/2, dropping sub-half-window tails never
    // orphans a token — every token index sits inside some kept chunk
    expected.groupBy(_._1).foreach { case (id, chunks) =>
      val n = id.toInt
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4))
      assert((1 to n).forall(t => covered.contains(t.toLong)),
        s"doc $id: uncovered tokens")
    }
  }

  test("snapshot render/parse round-trip is write-after-read identity (generated)") {
    import graft.sources.Offers
    // adversarial field text: raw structural chars, pre-escaped entities,
    // tag-looking fragments, whitespace runs — everything the escape +
    // innerText pair must survive
    val htmlish = Gen.oneOf[String]("a", "B", "ł", "€", "&", "<", ">", "&amp;",
      "&lt;", "&nbsp;", " ", "  ", "\n", "zł", "<b>", "</b>", "\"", "'",
      "data-test=\"default-offer\"", "</a>", "</li>")
    val rawText: Gen[String] =
      Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, htmlish).map(_.mkString))
    val ppl: Gen[Offers.PplRaw] = for {
      p <- rawText; c <- rawText; s <- rawText
    } yield Offers.PplRaw(p, c, s)
    val jjit: Gen[Offers.JjitRaw] = for {
      p <- rawText; c <- rawText
      n <- Gen.chooseNum(0, 3); sp <- Gen.listOfN(n, rawText)
    } yield Offers.JjitRaw(p, c, sp)

    val pplRows = Gen.listOfN(120, ppl).sample.get
    val jjitRows = Gen.listOfN(120, jjit).sample.get

    // One doc per batch of rows: count must agree with input, and
    // parse∘render must be idempotent from the FIRST parse on (the
    // first pass normalizes; after that, write-after-read is identity).
    val pplDoc = Offers.renderPracujSnapshot(pplRows.iterator)
    assert(Offers.countOffers("pracujplit", pplDoc) == pplRows.size.toLong)
    val once = Offers.parsePracujDoc(pplDoc).toVector
    assert(once.size == pplRows.size)
    val twice = Offers.parsePracujDoc(
      Offers.renderPracujSnapshot(once.iterator)).toVector
    assert(twice == once, "ppl render/parse is not write-after-read stable")

    val jjitDoc = Offers.renderJjitSnapshot(jjitRows.iterator)
    assert(Offers.countOffers("justjoinit", jjitDoc) == jjitRows.size.toLong)
    val jonce = Offers.parseJjitDoc(jjitDoc).toVector
    assert(jonce.size == jjitRows.size)
    val jtwice = Offers.parseJjitDoc(
      Offers.renderJjitSnapshot(jonce.iterator)).toVector
    assert(jtwice == jonce, "jjit render/parse is not write-after-read stable")
  }

  test("range-join rewrite ≡ brute force over generated signed timestamps (generated)") {
    import spark.implicits._
    graft.plans.RangeJoin.install(spark)
    val tGen = Gen.chooseNum(-5000L, 5000L)
    // six window shapes: symmetric abs (both strictness spellings) and
    // asymmetric/degenerate BETWEEN windows — each trial is one Spark job
    val windows: Seq[(Long, Long, String)] = Seq(
      (-1L, 1L, "abs<=1"), (-6L, 6L, "abs<7"), (-128L, 128L, "abs<=128"),
      (0L, 40L, "between0..40"), (-500L, 13L, "between-500..13"),
      (5L, 5L, "offset=5"))
    windows.foreach { case (lo, hi, label) =>
      val as = Gen.listOfN(150, tGen).sample.get
      val bs = Gen.listOfN(150, tGen).sample.get
      val adf = as.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("ida", "ta")
      val bdf = bs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("idb", "tb")
      val cond = label match {
        case "abs<7" => abs(col("ta") - col("tb")) < lit(7L)
        case l if l.startsWith("abs") => abs(col("ta") - col("tb")) <= lit(hi)
        case _ => (col("ta") - col("tb")).between(lit(lo), lit(hi))
      }
      val joined = adf.join(bdf, cond).select("ida", "idb")
      assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        s"$label still plans a nested loop")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (ta, i) <- as.zipWithIndex
        (tb, j) <- bs.zipWithIndex
        d = ta - tb
        if d >= lo && d <= hi
      } yield (i.toLong, j.toLong)).sorted
      assert(got == want, s"$label diverged from brute force")
    }
  }

  test("2-D range-join rewrite ≡ brute force over generated points (generated)") {
    import spark.implicits._
    graft.plans.RangeJoin.install(spark)
    val cGen = Gen.chooseNum(-300L, 300L)
    // asymmetric per-dimension windows, incl. a degenerate one
    val boxes: Seq[(Long, Long, Long, Long)] = Seq(
      (-5L, 5L, -5L, 5L), (-40L, 3L, 0L, 17L), (2L, 2L, -9L, 9L))
    boxes.foreach { case (lx, hx, ly, hy) =>
      val ps = Gen.listOfN(120, Gen.zip(cGen, cGen)).sample.get
      val qs = Gen.listOfN(120, Gen.zip(cGen, cGen)).sample.get
      val adf = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("ida", "xa", "ya")
      val bdf = qs.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("idb", "xb", "yb")
      val joined = adf.join(bdf,
        (col("xa") - col("xb")).between(lit(lx), lit(hx)) &&
          (col("ya") - col("yb")).between(lit(ly), lit(hy)))
        .select("ida", "idb")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"box ($lx,$hx)x($ly,$hy) still plans a nested loop")
      assert(plan.contains("graft_cell0") && plan.contains("graft_cell1"),
        s"2-D rewrite missing a dimension:\n$plan")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        ((xa, ya), i) <- ps.zipWithIndex
        ((xb, yb), j) <- qs.zipWithIndex
        if xa - xb >= lx && xa - xb <= hx && ya - yb >= ly && ya - yb <= hy
      } yield (i.toLong, j.toLong)).sorted
      assert(got == want, s"box ($lx,$hx)x($ly,$hy) diverged from brute force")
    }
  }

  test("simhash16 is invariant under token duplication (generated)") {
    import spark.implicits._
    val tokens = Gen.listOfN(8, Gen.oneOf("spark", "join", "window", "agg", "x1", "ł9"))
    val docs = Gen.listOfN(100, tokens).sample.get.map(_.mkString(" "))
    val rows = docs.map(d => (d, d + " " + d)).toDF("once", "twice")
      .select(
        GraftFunctions.simhash16(split(col("once"), " ")).as("h1"),
        GraftFunctions.simhash16(split(col("twice"), " ")).as("h2"))
      .as[(Long, Long)].collect()
    rows.foreach { case (h1, h2) => assert(h1 == h2, "duplication changed simhash") }
  }
}
