package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (where the
  * semantics are SQL-expressible) a DuckDB oracle over the same parquet
  * tables. The driver hash-compares the Spark result with the oracle
  * result column-by-column after sorting columns by name, so:
  *   - every computed column is aliased identically on both sides;
  *   - aggregates are computed over decimals (exact, order-insensitive),
  *     never raw doubles (order-sensitive rounding);
  *   - every query ends in a deterministic total order.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
