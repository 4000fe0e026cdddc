package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sql4

/** Semantics pins for the Spark 4 SQL-surface queries (q231–q234) and the
  * XML lake helpers behind q235 — the behaviors the gate queries rely on
  * but whose edge cases the testdata may not exercise at a given SF.
  */
class Sql4Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("recursive spine zero-fills months with no orders") {
    // Three orders spanning Jan→Apr with February and March empty: the
    // recursion must still enumerate them and the left join must emit
    // explicit zero rows — the whole point of a spine over a raw GROUP BY.
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 20.0),
      (3L, java.sql.Timestamp.valueOf("2024-04-02 00:00:00"), 40.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .createOrReplaceTempView("orders")
    val rows = spark.sql(Sql4.recursiveSpineSql).collect()
    assert(rows.map(_.get(0).toString.take(10)).toSeq ==
      Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(30.0, 0.0, 0.0, 40.0))
  }

  test("variant_get vs try_variant_get on missing paths and bad casts") {
    val df = spark.sql(
      """SELECT try_variant_get(parse_json('{"a":"xyz","n":7}'), '$.missing', 'int') AS miss,
        |       try_variant_get(parse_json('{"a":"xyz","n":7}'), '$.a', 'int') AS badcast,
        |       variant_get(parse_json('{"a":"xyz","n":7}'), '$.n', 'int') AS good""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0), "missing path must be NULL under try_variant_get")
    assert(r.isNullAt(1), "uncastable value must be NULL under try_variant_get")
    assert(r.getInt(2) == 7)
    // the non-try form THROWS on an uncastable value — the semantics
    // difference that makes try_ the right call in a curation pipeline
    intercept[Exception] {
      spark.sql("""SELECT variant_get(parse_json('{"a":"xyz"}'), '$.a', 'int')""")
        .collect()
    }
  }

  test("UTF8_LCASE collation merges case forms that stay binary-distinct") {
    val df = Seq("Berlin", "BERLIN", "berlin", "Paris", "paris")
      .toDF("city")
      .agg(
        countDistinct(collate(col("city"), "UTF8_LCASE")).as("n_ci"),
        countDistinct(col("city")).as("n_bin"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 2, "collated distinct: {berlin, paris}")
    assert(r.getLong(1) == 5, "binary distinct: all five forms")
  }

  test("SQL UDFs are inlined into the plan — no ScalaUDF wall") {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION spec_band(p DOUBLE) RETURNS STRING
        |RETURN CASE WHEN p < 10 THEN 'low' ELSE 'high' END""".stripMargin)
    Seq(1.0, 5.0, 50.0).toDF("p").createOrReplaceTempView("spec_prices")
    val df = spark.sql(
      "SELECT spec_band(p) AS band, count(*) AS n FROM spec_prices GROUP BY 1 ORDER BY 1")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      "a SQL UDF must inline at analysis, not become an opaque ScalaUDF")
    // Over this local relation the inlined CASE constant-folds all the way
    // into the LocalTableScan — the strongest possible inlining evidence
    // (an opaque UDF could never fold). The parquet-backed codegen span is
    // pinned by q234's plan golden instead.
    assert(!plan.contains("spec_band("),
      "no residual function call may survive analysis")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("high", 1L), ("low", 2L)))
  }

  test("XML round-trip preserves escapes, padding, newlines, and nulls") {
    val dir = graft.engine.Staging.scratch("graft-sql4-spec", "xml").getAbsolutePath
    val docs = Seq(
      (1L, "plain text"),
      (2L, "angle <brackets> & amp \"quotes\" 'single'"),
      (3L, "  leading and trailing  "),
      (4L, "line1\nline2\ttabbed"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    graft.sources.Lake.writeXml(docs, s"$dir/out", rowTag = "doc", shards = 2)
    val back = graft.sources.Lake
      .readXml(spark, s"$dir/out", rowTag = "doc", docs.schema)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    val want = docs.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(back.toSeq == want.toSeq)
  }

  test("pipe syntax desugars to the classical form's optimized plan") {
    // `|>` is a parser surface, not a new execution path: the q272
    // pipeline and its classical WHERE/JOIN/GROUP BY/HAVING spelling
    // must optimize to the SAME logical plan (so pushdown, join
    // strategy, and partial aggregation are identical — zero cost for
    // the readable form)
    val d = "/root/testdata/sf0.001"
    graft.engine.Tables.lineitem(spark, d).createOrReplaceTempView("lineitem")
    graft.engine.Tables.orders(spark, d).createOrReplaceTempView("orders")
    val pipe = graft.operators.Sql4.q272SqlPipe.run(spark, d)
    val classical = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_lines,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity >= 10 AND o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |HAVING count(*) > 10
        |ORDER BY o_orderpriority""".stripMargin)
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#_") // normalize expr ids
    assert(shape(pipe) == shape(classical),
      s"pipe and classical forms diverged:\n${shape(pipe)}\nvs\n${shape(classical)}")
  }
}
