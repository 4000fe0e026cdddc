package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Lake, OffersV2}

/** The reference's whole main.py pipeline as ONE integration flow
  * (`/root/reference/main.py:7-27`): scrape rounds land HTML snapshots
  * in the lake (S4/S8) → the graft-offers DSv2 source reads them back
  * with pushdown (S3/S5/P1–P3) → expression-layer normalization
  * (X1–X7) → partitioned parquet lake with snapshot dates (S8) →
  * latest-snapshot resolution (S7) → headered staging CSV + schema-
  * pinned read-back (S6). Every stage is the engine's real surface; the
  * assertions pin the final staging rows.
  */
class MainPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pplHtml(company: String, salary: String) =
    s"""<div data-test="default-offer">
       |  <a data-test="link-offer-title"> Senior   Data Engineer </a>
       |  <h3 data-test="text-company-name">$company</h3>
       |  <span data-test="offer-salary">$salary</span>
       |</div>""".stripMargin

  test("scrape -> lake -> DSv2 read -> normalize -> latest snapshot -> staging CSV") {
    // --- extract: two scrape rounds write HTML snapshots into the lake
    val htmlLake = Files.createTempDirectory("graft-main-html")
    val leaf = htmlLake.resolve("site=pracujplit/region=waw/experience=senior")
    Files.createDirectories(leaf)
    Files.writeString(leaf.resolve("r1.html"),
      pplHtml("OldCorp", "9 000 zł / mies."))
    Files.writeString(leaf.resolve("r2.html"),
      pplHtml("NewCorp", "12 000–14 000 zł brutto / mies."))

    // --- transform: DSv2 read with the F1 site filter + X-layer normalize
    val offers = OffersV2.offers(
      OffersV2.readRaw(spark, htmlLake.toString)
        .filter(col("site") === "pracujplit"))

    // --- load: snapshot-dated parquet lake; each HTML round becomes a
    // dated snapshot (two dates so S7 has something to resolve)
    val pqLake = Files.createTempDirectory("graft-main-lake").toString + "/lake"
    Lake.writeSnapshot(offers.filter(col("company_name") === "OldCorp")
      .withColumn("snapshot_date", lit(java.sql.Date.valueOf("2026-08-12"))), pqLake)
    Lake.writeSnapshot(offers.filter(col("company_name") === "NewCorp")
      .withColumn("snapshot_date", lit(java.sql.Date.valueOf("2026-08-13"))), pqLake)

    // --- latest-snapshot resolution (S7): only the newest date survives
    val latest = Lake.latestSnapshot(
      Lake.read(spark, pqLake), "pracujplit", "waw", "senior")

    // --- staging CSV with header + schema-pinned read-back (S6)
    val staging = Files.createTempDirectory("graft-main-staging").toString + "/out"
    Lake.writeCsv(latest.select(
      "position", "company_name", "minimum", "maximum", "currency", "pay_period"),
      staging)
    val back = Lake.readCsv(spark, staging)
      .as[(String, String, String, String, String, String)].collect().toSeq

    assert(back == Seq(
      ("Senior Data Engineer", "NewCorp", "12000", "14000", "PLN", "month")))
  }
}
