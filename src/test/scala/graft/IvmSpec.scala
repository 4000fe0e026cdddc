package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** q215's incremental-view identity at ROW grain (the gate only hashes
  * the aggregate): J ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB must be the exact row
  * MULTISET of the full join — a missed term under-counts, an
  * overlapping term double-counts, and neither may hide in a sum.
  */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("the four IVM terms partition the full join exactly, row for row") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val a = orders.filter(col("o_orderkey") % 4 =!= 0)
    val da = orders.filter(col("o_orderkey") % 4 === 0)
    val b = li.filter(col("l_linenumber") <= 3)
    val db = li.filter(col("l_linenumber") > 3)
    val cond = col("o_orderkey") === col("l_orderkey")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("o_orderkey", "l_linenumber", "o_orderpriority", "l_extendedprice")
      .as[(Long, Int, String, Double)].collect().toSeq
    val terms = Seq(a.join(b, cond), da.join(b, cond), a.join(db, cond), da.join(db, cond))
    val incremental = terms.flatMap(rows)
    val full = rows(orders.join(li, cond))
    // multiset equality: same rows with same multiplicities
    def ms(s: Seq[(Long, Int, String, Double)]) =
      s.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(ms(incremental) === ms(full))
    // and the terms are pairwise disjoint (each pair lands in exactly one)
    assert(incremental.size === terms.map(rows(_).size).sum)
    assert(terms.forall(t => rows(t).nonEmpty), "a slice is empty — the spec lost its teeth")
  }
}
