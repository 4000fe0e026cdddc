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

  val all: Seq[QueryDef] = Seq(q64Subqueries)
}
