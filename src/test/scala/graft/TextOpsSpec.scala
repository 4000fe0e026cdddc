package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps

/** Golden-fixture tests for the X1–X7 string operators — one fixture per
  * branch of the reference's salary parsers (FIXTURES.md §2) — plus
  * property-style invariants over a seeded random corpus.
  */
class TextOpsSpec extends AnyFunSuite {

  /** Seeded random strings over a salary-ish alphabet (deterministic). */
  private def corpus(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "0123456789 ,.–/złEURmiesgodz. abcXYZ🚀\t"
    Seq.fill(n)(Seq.fill(rnd.nextInt(30))(
      alphabet(rnd.nextInt(alphabet.length))).mkString)
  }
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parseOne(s: String): (String, String, String, String) = {
    val r = Seq(s).toDF("t")
      .select(TextOps.parseSalary(col("t")).as("p"))
      .selectExpr("p.minimum", "p.maximum", "p.currency", "p.pay_period")
      .as[(String, String, String, String)].head()
    r
  }

  // transform_data.py:129-180 branch corpus (FIXTURES.md §2a)
  test("salary: range with zł and mies.") {
    assert(parseOne("11 000–12 000 zł brutto / mies.") ==
      (("11000", "12000", "PLN", "month")))
  }
  test("salary: single value duplicates to min and max") {
    assert(parseOne("8 000 zł brutto / mies.") == (("8000", "8000", "PLN", "month")))
  }
  test("salary: comma decimal and godz. mapping") {
    assert(parseOne("31,25 zł netto / godz.") == (("31.25", "31.25", "PLN", "h")))
  }
  test("salary: unmapped period passes through") {
    assert(parseOne("5 000 EUR / rok") == (("5000", "5000", "EUR", "rok")))
  }
  test("salary: no numbers yields empty strings") {
    assert(parseOne("Competitive salary") == (("", "", "", "")))
  }
  test("salary: empty input yields empty strings") {
    assert(parseOne("") == (("", "", "", "")))
  }
  test("salary: NBSP thousands separators normalize") {
    assert(parseOne("11 000 zł brutto / mies.") ==
      (("11000", "11000", "PLN", "month")))
  }

  private def parseSpans(s: Seq[String]): (String, String, String, String) =
    Seq(Tuple1(s)).toDF("spans")
      .select(TextOps.parseSalarySpans(col("spans")).as("p"))
      .selectExpr("p.minimum", "p.maximum", "p.currency", "p.pay_period")
      .as[(String, String, String, String)].head()

  // transform_data.py:46-84 span-count branches (FIXTURES.md §2b)
  test("spans: three spans split currency/period") {
    assert(parseSpans(Seq("20 000", "26 000", "PLN/month")) ==
      (("20000", "26000", "PLN", "month")))
  }
  test("spans: two spans duplicate minimum") {
    assert(parseSpans(Seq("15 000", "PLN/month")) ==
      (("15000", "15000", "PLN", "month")))
  }
  test("spans: no slash keeps whole token as currency") {
    assert(parseSpans(Seq("15 000", "PLN")) == (("15000", "15000", "PLN", "")))
  }
  test("spans: jjit does NOT normalize zł (per-source quirk)") {
    assert(parseSpans(Seq("9 000", "zł/mies.")) ==
      (("9000", "9000", "zł", "mies.")))
  }
  test("spans: double slash keeps whole token (tuple-unpack semantics)") {
    assert(parseSpans(Seq("1", "2", "A/B/C")) == (("1", "2", "A/B/C", "")))
  }
  test("spans: one span yields all empty") {
    assert(parseSpans(Seq("solo")) == (("", "", "", "")))
  }
  test("spans: no spans yields all empty") {
    assert(parseSpans(Seq.empty[String]) == (("", "", "", "")))
  }

  test("X1 cleanPosition drops non-ascii non-alnum, keeps unicode letters") {
    val r = Seq("Senior ML Engineer 🚀 – NLP (łódź)")
      .toDF("t").select(TextOps.cleanPosition(col("t"))).as[String].head()
    assert(r == "Senior ML Engineer NLP (łódź)")
  }

  test("X2 cleanText normalizes NBSP and collapses whitespace") {
    val r = Seq(" Junior  Data\t\tEngineer ").toDF("t")
      .select(TextOps.cleanText(col("t"))).as[String].head()
    assert(r == "Junior Data Engineer")
  }

  // X8 header-count fixtures (extract_data.py:53-62 ppl, :168-174 jjit) —
  // the per-site first-vs-last-match quirk, NBSP-tolerant on jjit.
  private def countPpl(s: String): Option[Long] =
    Seq(s).toDF("t").select(TextOps.offerCountPpl(col("t")))
      .as[Option[Long]].head()
  private def countJjit(s: String): Option[Long] =
    Seq(s).toDF("t").select(TextOps.offerCountJjit(col("t")))
      .as[Option[Long]].head()

  test("X8 ppl: first plain digit run wins") {
    assert(countPpl("4022 ofert pracy") == Some(4022L))
  }
  test("X8 ppl: grouped header parses as the FIRST run (reference quirk)") {
    // re.findall(r"\d+", "4 022")[0] == "4" — the reference's exact
    // behavior on a thousands-grouped header, preserved not fixed
    assert(countPpl("4 022 ofert") == Some(4L))
  }
  test("X8 ppl: no digits yields null") {
    assert(countPpl("brak ofert") == None)
  }
  test("X8 jjit: LAST grouped run wins, spaces stripped") {
    assert(countJjit("Praca IT: 10 of 3 029 offers") == Some(3029L))
  }
  test("X8 jjit: NBSP thousands separators normalize") {
    assert(countJjit("3 029 offers") == Some(3029L))
  }
  test("X8 jjit: no digits yields null") {
    assert(countJjit("no offers") == None)
  }
  test("X8 site dispatch branches per site on the same header") {
    val header = "showing 10 of 2 500 offers"
    val r = Seq(("pracujplit", header), ("justjoinit", header))
      .toDF("site", "t")
      .select(TextOps.offerCount(col("site"), col("t")))
      .as[Option[Long]].collect().toSeq
    assert(r == Seq(Some(10L), Some(2500L)))
  }

  test("property: cleaners are idempotent over a random corpus") {
    val in = corpus(200)
    val once = in.toDF("t")
      .select(TextOps.cleanText(col("t")).as("ct"), TextOps.cleanPosition(col("t")).as("cp"))
      .as[(String, String)].collect()
    val again = once.toSeq.toDF("ct", "cp")
      .select(TextOps.cleanText(col("ct")), TextOps.cleanPosition(col("cp")))
      .as[(String, String)].collect()
    assert(once.toSeq == again.toSeq)
  }

  test("property: minimum and maximum are empty together over a random corpus") {
    val rows = corpus(200).toDF("t")
      .select(TextOps.parseSalary(col("t")).as("p"))
      .selectExpr("p.minimum", "p.maximum")
      .as[(String, String)].collect()
    rows.foreach { case (mn, mx) => assert((mn == "") == (mx == "")) }
  }
}
