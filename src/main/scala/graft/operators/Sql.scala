package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}

/** The SQL surface: the engine's tables exposed as temp views and queried
  * through `spark.sql(...)` — same Catalyst plans as the DataFrame API,
  * but exercising the parser, the subquery machinery, and decorrelation.
  */
object Sql {

  /** Register the engine tables for `dir` as session temp views (cheap —
    * a view is a parsed plan, no data movement).
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
  }

  // q64 — correlated EXISTS + scalar subquery through the SQL API.
  // Catalyst decorrelates the EXISTS into a left-semi join and runs the
  // scalar MAX subquery once (exact — MAX, unlike AVG over doubles, is
  // accumulation-order-independent, which keeps the predicate boundary
  // bit-stable cross-engine).
  val q64Subqueries: QueryDef = QueryDef.sql(
    "q64_subqueries",
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |  AND o.o_totalprice > 0.5 * (SELECT MAX(o2.o_totalprice) FROM orders o2)
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    registerViews(s, d)
    s.sql(
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |  AND o.o_totalprice > 0.5 * (SELECT MAX(o2.o_totalprice) FROM orders o2)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  // q178 — null-aware NOT IN anti-join: `NOT IN (subquery)` over a
  // NULLABLE expression — the SQL-semantics trap a plain left_anti
  // gets WRONG (three-valued logic: one NULL in the subquery empties
  // the whole result; a row matches nothing only if it differs from
  // every non-null value AND the subquery has no NULL). The CASE makes
  // the subquery column nullable, so Catalyst cannot reduce this to a
  // regular anti-join: it plans the dedicated single-column
  // null-aware anti-join (BroadcastHashJoin LeftAnti, isNullAware) —
  // buildside-bounded, no nested loop. Finds parts never sold at a
  // deep discount.
  val q178NotInNullAware: QueryDef = QueryDef.sql(
    "q178_notin_nullaware",
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_partkey NOT IN (
      |  SELECT CASE WHEN l_quantity > 100 THEN NULL ELSE l_partkey END
      |  FROM lineitem WHERE l_discount >= 0.09)
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    registerParts(s, d)
    s.sql(
      """SELECT p_partkey, p_brand FROM part
        |WHERE p_partkey NOT IN (
        |  SELECT CASE WHEN l_quantity > 100 THEN NULL ELSE l_partkey END
        |  FROM lineitem WHERE l_discount >= 0.09)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Register the part-side tables for the NOT IN query. */
  private def registerParts(s: SparkSession, d: String): Unit = {
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
  }

  val all: Seq[QueryDef] = Seq(q64Subqueries, q178NotInNullAware)
}
