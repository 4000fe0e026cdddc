package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Offers

/** Golden-fixture tests for the HTML offer extractors (FIXTURES.md §2),
  * end-to-end through the Dataset pipeline (generator + normalization).
  */
class OffersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pplHtml =
    """<html><body>
      |<div data-test="default-offer">
      |  <a data-test="link-offer-title"> Junior   Data Engineer </a>
      |  <h3 data-test="text-company-name">ACME Sp. z o.o.</h3>
      |  <span data-test="offer-salary">11 000–12 000 zł brutto / mies.</span>
      |</div>
      |<div data-test="default-offer">
      |  <a data-test="link-offer-title">Backend Dev</a>
      |  <h3 data-test="text-company-name">Beta</h3>
      |</div>
      |</body></html>""".stripMargin

  test("graft_parse_offers Generator matches the flatMap source (SQL surface)") {
    graft.functions.GraftFunctions.register(spark)
    Seq(pplHtml).toDF("value").createOrReplaceTempView("snapshots")
    val viaSql = spark.sql(
      """SELECT o.position_raw, o.company_raw, o.salary_raw
        |FROM snapshots
        |LATERAL VIEW graft_parse_offers('pracujplit', value) o
        |""".stripMargin)
      .as[(String, String, String)].collect().toSeq
    val viaFlatMap = Offers.parsePracujRaw(Seq(pplHtml).toDS())
      .as[(String, String, String)].collect().toSeq
    assert(viaSql == viaFlatMap && viaSql.nonEmpty)
  }

  test("graft_parse_offers routes justjoin.it rows with span arrays") {
    graft.functions.GraftFunctions.register(spark)
    Seq(jjitHtml).toDF("value").createOrReplaceTempView("snapshots_jjit")
    val viaSql = spark.sql(
      """SELECT o.position_raw, o.spans
        |FROM snapshots_jjit
        |LATERAL VIEW graft_parse_offers('justjoinit', value) o
        |""".stripMargin)
      .as[(String, Seq[String])].collect().toSeq
    val viaFlatMap = Offers.parseJjitRaw(Seq(jjitHtml).toDS())
      .as[Offers.JjitRaw].collect().toSeq.map(r => (r.position_raw, r.spans))
    assert(viaSql == viaFlatMap && viaSql.nonEmpty)
  }

  test("pracuj.pl fixture parses to the 6-column offer schema") {
    val rows = Offers.offers("pracujplit", Seq(pplHtml).toDS())
      .as[(String, String, String, String, String, String)].collect().toSeq
    assert(rows == Seq(
      ("Junior Data Engineer", "ACME Sp. z o.o.", "11000", "12000", "PLN", "month"),
      ("Backend Dev", "Beta", "", "", "", "")))
  }

  private val jjitHtml =
    """<html><ul>
      |<li data-index="1">
      |  <h3>Senior ML Engineer 🚀 – NLP</h3>
      |  <h6><span>20 000</span><span>26 000</span><span>PLN/month</span></h6>
      |  <a><div><div><div><div><div><div><p>DataCorp</p></div></div></div></div></div></div></a>
      |</li>
      |<li data-index="0">
      |  <h3>QA</h3>
      |  <a><div><p>QualityHouse</p></div></a>
      |</li>
      |</ul></html>""".stripMargin

  test("justjoin.it fixture parses index-ordered with span salary") {
    val rows = Offers.offers("justjoinit", Seq(jjitHtml).toDS())
      .as[(String, String, String, String, String, String)].collect().toSeq
    assert(rows == Seq(
      ("QA", "QualityHouse", "", "", "", ""),
      ("Senior ML Engineer NLP", "DataCorp", "20000", "26000", "PLN", "month")))
  }

  test("empty document yields no offers") {
    assert(Offers.offers("pracujplit", Seq("<html></html>").toDS()).count() == 0)
    assert(Offers.offers("justjoinit", Seq("<html></html>").toDS()).count() == 0)
  }

  test("unknown site is rejected") {
    intercept[IllegalArgumentException] {
      Offers.offers("unknown", Seq("<html></html>").toDS())
    }
  }

  test("X8 scraped-vs-reported cross-check (extract_data.py:122-126)") {
    // the reference logs header-reported total vs scraped count after a
    // scrape round; here the header parse (TextOps.offerCount) must agree
    // with the count of offers the generator actually extracts
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.TextOps
    val header = "2 ofert pracy" // ppl header for the 2-offer fixture
    val reported = Seq(header).toDF("h")
      .select(TextOps.offerCount(lit("pracujplit"), col("h")))
      .as[Long].head()
    val scraped = Offers.offers("pracujplit", Seq(pplHtml).toDS()).count()
    assert(reported == scraped)
  }

  test("end-to-end: snapshot file -> parse -> headered CSV (main.py pipeline)") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft-snap")
    Files.writeString(inDir.resolve("21082026.html"), pplHtml)
    val outDir = Files.createTempDirectory("graft-staging").toString + "/out"

    val snapshots = Offers.readSnapshots(spark, inDir.toString)
    graft.sources.Lake.writeCsv(Offers.offers("pracujplit", snapshots), outDir)

    val back = spark.read.option("header", "true").csv(outDir)
    assert(back.columns.toSeq == Seq("position", "company_name", "minimum",
      "maximum", "currency", "pay_period"))
    assert(back.count() == 2)
  }
}
