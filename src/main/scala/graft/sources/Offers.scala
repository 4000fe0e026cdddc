package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.TextOps

/** HTML job-offer extraction (reference P1/P2,
  * `/root/reference/DataTransform/transform_data.py:86-115` and `:182-210`)
  * as a Spark source: `Dataset[String]` of merged HTML snapshots →
  * structured offer rows.
  *
  * Architecture split (Generator + expressions): the typed `flatMap` below
  * only *locates* the per-offer fragments with attribute-anchored regexes
  * (the selectors the reference relies on are `data-test` attributes,
  * which are stable markup contracts). All field *normalization* — X1–X7
  * cleaning and salary parsing — happens afterwards in the expression
  * layer ([[graft.functions.TextOps]]), so it stays codegen'd, and the
  * generator stays a thin, testable row-splitter. No DOM library exists in
  * the offline dependency set; regex-over-fragment is the deliberate
  * design, fixture-tested against the selector contracts in FIXTURES.md.
  *
  * Scale shape: one HTML snapshot (one file) → one input row →
  * `flatMap` → N offer rows; embarrassingly parallel per file, no
  * shuffle until the caller aggregates.
  */
object Offers {

  /** The reference's 6-column offer schema (transform_data.py:36,122):
    * all strings, empty-string for missing — the reference's convention.
    */
  final case class Offer(
      position: String, company_name: String, minimum: String,
      maximum: String, currency: String, pay_period: String)

  /** Raw pracuj.pl fragments: (position_raw, company_raw, salary_raw). */
  final case class PplRaw(position_raw: String, company_raw: String, salary_raw: String)

  /** Raw justjoin.it fragments: position + salary `<span>` texts + company. */
  final case class JjitRaw(position_raw: String, company_raw: String, spans: Seq[String])

  /** Inner text of an element: drop tags, decode the few entities the
    * fixtures use, collapse whitespace (bs4 `get_text(strip=True)` analog).
    */
  private[sources] def innerText(fragment: String): String =
    fragment.replaceAll("<[^>]*>", " ")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&nbsp;", " ")
      .replace("&amp;", "&") // ampersand LAST, or "&amp;lt;" double-decodes
      .replaceAll("\\s+", " ").trim

  private def firstMatch(block: String, re: scala.util.matching.Regex): String =
    re.findFirstMatchIn(block).map(m => innerText(m.group(1))).getOrElse("")

  // Attribute-anchored selector contracts (transform_data.py:188-200).
  private val PplTitle = """(?s)<a[^>]*data-test="link-offer-title"[^>]*>(.*?)</a>""".r
  private val PplCompany = """(?s)<h3[^>]*data-test="text-company-name"[^>]*>(.*?)</h3>""".r
  private val PplSalary = """(?s)<span[^>]*data-test="offer-salary"[^>]*>(.*?)</span>""".r
  private val JjitLi = """(?s)<li[^>]*data-index="(\d+)"[^>]*>(.*?)</li>""".r
  private val JjitH3 = """(?s)<h3[^>]*>(.*?)</h3>""".r
  private val JjitH6 = """(?s)<h6[^>]*>(.*?)</h6>""".r
  private val JjitSpan = """(?s)<span[^>]*>(.*?)</span>""".r
  private val JjitCompanyP = """(?s)<a[^>]*>.*?<p[^>]*>(.*?)</p>""".r

  /** Pure per-document P2 parse (shared by the typed flatMap source and
    * the [[graft.functions.ParseOffers]] SQL Generator).
    */
  private[graft] def parsePracujDoc(doc: String): Iterator[PplRaw] =
    doc.split("""<div[^>]*data-test="default-offer"""").iterator.drop(1).map { block =>
      PplRaw(
        firstMatch(block, PplTitle),
        firstMatch(block, PplCompany),
        firstMatch(block, PplSalary))
    }

  /** Pure per-document P1 parse, ordered by numeric `data-index`
    * (extract_data.py:245 emits offers index-sorted).
    */
  private[graft] def parseJjitDoc(doc: String): Iterator[JjitRaw] =
    JjitLi.findAllMatchIn(doc).toSeq
      .sortBy(m => m.group(1).toLong)
      .iterator.map { m =>
        val block = m.group(2)
        val spans = JjitH6.findFirstMatchIn(block).map(_.group(1)) match {
          case Some(h6) => JjitSpan.findAllMatchIn(h6).map(s => innerText(s.group(1))).toSeq
          case None => Seq.empty[String]
        }
        JjitRaw(
          firstMatch(block, JjitH3),
          firstMatch(block, JjitCompanyP),
          spans)
      }

  /** Offer count per snapshot WITHOUT building row fragments — the
    * kernel behind COUNT(*) pushdown in the DSv2 source. Must agree
    * exactly with the corresponding parser's row count, so each arm
    * reuses its parser's own row-delimiting primitive: ppl counts the
    * SAME `split` the parser iterates (Java's split drops trailing
    * empty pieces, so a snapshot that ENDS with an offer marker yields
    * no row — a raw marker-match count would overcount it), jjit counts
    * the `li[data-index]` matches (the parser's sort cannot change the
    * count). Pinned by a generated-input spec including the
    * trailing-marker edge.
    */
  private[graft] def countOffers(site: String, doc: String): Long = site match {
    case "pracujplit" =>
      math.max(0, doc.split("""<div[^>]*data-test="default-offer"""").length - 1).toLong
    case "justjoinit" => JjitLi.findAllMatchIn(doc).size.toLong
    case other =>
      throw new IllegalArgumentException(s"unsupported job site dir: site=$other")
  }

  /** P2: pracuj.pl HTML → raw offer fragments. Each offer lives in a
    * `<div data-test="default-offer">`; splitting on the marker mirrors
    * `soup.find_all("div", {"data-test": "default-offer"})`.
    */
  def parsePracujRaw(html: Dataset[String]): Dataset[PplRaw] = {
    import html.sparkSession.implicits._
    html.flatMap(parsePracujDoc)
  }

  /** P1: justjoin.it HTML → raw offer fragments. */
  def parseJjitRaw(html: Dataset[String]): Dataset[JjitRaw] = {
    import html.sparkSession.implicits._
    html.flatMap(parseJjitDoc)
  }

  /** Keyed variant of [[parsePracujRaw]] for inputs that carry a join key
    * alongside the HTML (one fragment per row): the generator stays a
    * row-splitter, the key rides along for downstream joins/verification.
    */
  def parsePracujRawKeyed(keyed: Dataset[(Long, String)]): DataFrame = {
    import keyed.sparkSession.implicits._
    keyed.flatMap { case (key, doc) =>
      doc.split("""<div[^>]*data-test="default-offer"""").iterator.drop(1).map { block =>
        (key,
          firstMatch(block, PplTitle),
          firstMatch(block, PplCompany),
          firstMatch(block, PplSalary))
      }
    }.toDF("key", "position_raw", "company_raw", "salary_raw")
  }

  /** P2 + X2–X6: full pracuj.pl pipeline to the 6-column offer schema.
    * Normalization is pure expression trees over the raw fragments.
    */
  def pracujOffers(html: Dataset[String]): DataFrame = {
    val parsed = TextOps.parseSalary(col("salary_raw"))
    parsePracujRaw(html).toDF()
      .select(
        TextOps.cleanText(col("position_raw")).as("position"),
        TextOps.cleanText(col("company_raw")).as("company_name"),
        parsed.getField("minimum").as("minimum"),
        parsed.getField("maximum").as("maximum"),
        parsed.getField("currency").as("currency"),
        parsed.getField("pay_period").as("pay_period"))
  }

  /** P1 + X1/X7: full justjoin.it pipeline (per-source quirks: X1 position
    * clean, span-based salary, NO `zł` normalization).
    */
  def jjitOffers(html: Dataset[String]): DataFrame = {
    val parsed = TextOps.parseSalarySpans(col("spans"))
    parseJjitRaw(html).toDF()
      .select(
        TextOps.cleanPosition(col("position_raw")).as("position"),
        col("company_raw").as("company_name"),
        parsed.getField("minimum").as("minimum"),
        parsed.getField("maximum").as("maximum"),
        parsed.getField("currency").as("currency"),
        parsed.getField("pay_period").as("pay_period"))
  }

  /** S3/P3 source-dispatch registry (extract_data.py:266-269,
    * transform_data.py:223-226): route by site format string.
    */
  def offers(site: String, html: Dataset[String]): DataFrame = site match {
    case "pracujplit" => pracujOffers(html)
    case "justjoinit" => jjitOffers(html)
    case other => throw new IllegalArgumentException(s"unsupported job site: $other")
  }

  /** S5 HTML snapshot source: one whole file = one snapshot string. */
  def readSnapshots(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).select("value").as[String]
  }

  // ---------------------------------------------------------------------
  // Snapshot RENDERING — the exact inverse of the parsers above, used by
  // the DSv2 write path (graft-offers as a sink). Renderer and parser
  // live in one file so the selector contracts can never drift apart:
  // every rendered element carries precisely the attribute its parser
  // regex anchors on.
  //
  // Round-trip contract: parse(render(rows)) == rows for rows whose text
  // fields are innerText-NORMALIZED (entity-decoded, single-spaced,
  // trimmed — which every parser output already is, so write-after-read
  // is always the identity). Arbitrary text survives because [[escape]]
  // protects the three structural characters and [[innerText]] decodes
  // them back ("&amp;" is decoded LAST there, so escaped entities do not
  // double-decode).
  // ---------------------------------------------------------------------

  private[graft] def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def opt(s: String): Option[String] = Option(s).filter(_.nonEmpty)

  /** One pracuj.pl offer `<div>` — inverse of [[parsePracujDoc]]. Null or
    * empty fragments omit their element, which the parser reads back as
    * "" (the F2 element-presence convention).
    */
  private[graft] def renderPracujOffer(r: PplRaw): String = {
    val b = new StringBuilder("""<div data-test="default-offer">""")
    opt(r.position_raw).foreach(p =>
      b ++= s"""<a data-test="link-offer-title">${escape(p)}</a>""")
    opt(r.company_raw).foreach(c =>
      b ++= s"""<h3 data-test="text-company-name">${escape(c)}</h3>""")
    opt(r.salary_raw).foreach(sal =>
      b ++= s"""<span data-test="offer-salary">${escape(sal)}</span>""")
    b ++= "</div>"
    b.result()
  }

  /** One justjoin.it offer `<li>` — inverse of [[parseJjitDoc]]. The
    * caller assigns `idx` in emission order; the parser re-sorts by it,
    * so rendered order IS read-back order. An empty span list omits the
    * `<h6>` (parsed back as no spans).
    */
  private[graft] def renderJjitOffer(r: JjitRaw, idx: Long): String = {
    val b = new StringBuilder(s"""<li data-index="$idx">""")
    opt(r.position_raw).foreach(p => b ++= s"<h3>${escape(p)}</h3>")
    opt(r.company_raw).foreach(c => b ++= s"""<a href="#"><p>${escape(c)}</p></a>""")
    if (r.spans != null && r.spans.nonEmpty)
      b ++= r.spans.map(sp => s"<span>${escape(sp)}</span>")
        .mkString("<h6>", "", "</h6>")
    b ++= "</li>"
    b.result()
  }

  /** A whole pracuj.pl snapshot document: offers in input order, wrapped
    * in the minimal page scaffold. `countOffers` agrees with the
    * rendered count by construction (one marker per offer, none
    * trailing).
    */
  private[graft] def renderPracujSnapshot(rows: Iterator[PplRaw]): String =
    rows.map(renderPracujOffer).mkString("<html><body>", "", "</body></html>")

  /** A whole justjoin.it snapshot document: `data-index` assigned in
    * input order, so rendered order is read-back order.
    */
  private[graft] def renderJjitSnapshot(rows: Iterator[JjitRaw]): String =
    rows.zipWithIndex.map { case (r, i) => renderJjitOffer(r, i.toLong) }
      .mkString("<html><body><ul>", "", "</ul></body></html>")
}
