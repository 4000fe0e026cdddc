package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Offers

/** `graft_parse_offers(site, html)` — the HTML→rows extraction (reference
  * P1/P2) as a proper Catalyst `Generator`, SQL-callable:
  *
  * {{{
  *   SELECT o.* FROM snapshots
  *   LATERAL VIEW graft_parse_offers('pracujplit', value) o
  * }}}
  *
  * This is the table-function form of [[graft.sources.Offers]]'s typed
  * flatMap — same pure per-document parse, same row-splitter role (field
  * normalization stays in the codegen'd TextOps expression layer). A
  * Generator (rather than flatMap) makes the source composable from SQL
  * and lets Catalyst prune/push around the `Generate` node; column
  * pruning drops `spans` or `salary_raw` when a site-specific caller
  * doesn't reference them.
  *
  * Unified element schema across the two sites: pracuj.pl rows carry
  * `salary_raw` (spans = null); justjoin.it rows carry `spans`
  * (salary_raw = null) — the per-source downstream parsers (X4 vs X7)
  * are intentionally distinct in the reference.
  */
case class ParseOffers(site: Expression, html: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(site, html)

  override def checkInputDataTypes(): TypeCheckResult =
    if (site.dataType == StringType && html.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_parse_offers requires (string, string), got " +
        s"(${site.dataType.simpleString}, ${html.dataType.simpleString})")

  override def elementSchema: StructType = StructType(Seq(
    StructField("position_raw", StringType),
    StructField("company_raw", StringType),
    StructField("salary_raw", StringType),
    StructField("spans", ArrayType(StringType))))

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val siteVal = site.eval(input)
    val htmlVal = html.eval(input)
    if (siteVal == null || htmlVal == null) return Iterator.empty
    val doc = htmlVal.asInstanceOf[UTF8String].toString
    siteVal.asInstanceOf[UTF8String].toString match {
      case "pracujplit" =>
        Offers.parsePracujDoc(doc).map { r =>
          InternalRow(utf8(r.position_raw), utf8(r.company_raw), utf8(r.salary_raw), null)
        }
      case "justjoinit" =>
        Offers.parseJjitDoc(doc).map { r =>
          InternalRow(utf8(r.position_raw), utf8(r.company_raw), null,
            new GenericArrayData(r.spans.map(utf8)))
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported job site: $other")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseOffers =
    copy(site = newChildren(0), html = newChildren(1))
}
