package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{QueryDef, Tables}

/** Declarative data-quality constraint verification (the Deequ-style
  * audit a production ingest gate runs before publishing a table):
  * range, domain, temporal, referential-integrity, and key-uniqueness
  * rules evaluated together and reported per rule.
  *
  * Scale shape — the whole rule set costs TWO passes, independent of
  * rule count: every row-local rule (range/domain/temporal) plus the FK
  * probe folds into ONE conditional aggregation over one scan (the FK
  * dimension is a broadcast of the key column only), and key uniqueness
  * — the one rule that is irreducibly keyed — is a single partial-
  * aggregated groupBy. The naive audit (one query per rule) scans N
  * times; this shape is why rules-as-data matters at 100 TB.
  */
object Quality {

  import org.apache.spark.sql.Column

  /** Row-local rules as (name, violation predicate) — ONE definition
    * shared by the batch audit (q104) and the streaming audit
    * ([[graft.streaming.EventStream.qualityAuditStream]]), so batch and
    * stream agree by construction (the q92/corpusIngestStream pattern).
    * Referential integrity and key uniqueness are not row-local and are
    * handled by each consumer (broadcast probe / keyed agg).
    */
  val rowRules: Seq[(String, Column)] = Seq(
    "discount_le_8pct" -> (col("l_discount") > 0.08),
    "quantity_in_range" -> (col("l_quantity") < 1 || col("l_quantity") > 50),
    "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
    "shipdate_before_1999" ->
      (col("l_shipdate") >= lit("1999-01-01").cast(TimestampType)),
    "tax_in_range" -> (col("l_tax") < 0 || col("l_tax") > 0.08))

  /** The FK violation predicate AFTER the left broadcast probe against
    * the order-key dimension. */
  val fkViolation: Column = col("o_orderkey").isNull

  // q104 — one-pass quality audit over lineitem with a deliberate mix of
  // passing and failing rules (the synthetic data carries real duplicate
  // (orderkey, linenumber) pairs and shipdates past 1998).
  val q104QualityAudit: QueryDef = QueryDef.sql(
    "q104_quality_audit",
    """WITH fk AS (SELECT l.*, o.o_orderkey AS fk_ok
      |            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |base AS (SELECT COUNT(*) AS n_rows,
      |  SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_quantity,
      |  SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS v_discount,
      |  SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS v_tax,
      |  SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS v_flag,
      |  SUM(CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS v_ship,
      |  SUM(CASE WHEN fk_ok IS NULL THEN 1 ELSE 0 END) AS v_fk
      |  FROM fk),
      |pk AS (SELECT (SELECT COUNT(*) FROM lineitem)
      |              - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
      |                                       FROM lineitem)) AS v_pk),
      |rules AS (
      |  SELECT 'discount_le_8pct' AS rule, n_rows, v_discount AS v FROM base
      |  UNION ALL SELECT 'orderkey_fk_exists', n_rows, v_fk FROM base
      |  UNION ALL SELECT 'pk_unique', (SELECT n_rows FROM base), v_pk FROM pk
      |  UNION ALL SELECT 'quantity_in_range', n_rows, v_quantity FROM base
      |  UNION ALL SELECT 'returnflag_domain', n_rows, v_flag FROM base
      |  UNION ALL SELECT 'shipdate_before_1999', n_rows, v_ship FROM base
      |  UNION ALL SELECT 'tax_in_range', n_rows, v_tax FROM base)
      |SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(v AS BIGINT) AS n_violations,
      |       CAST(v AS DOUBLE) / CAST(n_rows AS DOUBLE) AS violation_rate,
      |       v = 0 AS passed
      |FROM rules
      |ORDER BY rule""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val ok = Tables.orders(s, d).select(col("o_orderkey"))
    val ruleSums =
      (rowRules :+ ("orderkey_fk_exists" -> fkViolation)).map { case (name, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"v_$name")
      }
    val viol = li.join(broadcast(ok), li("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_rows"), ruleSums: _*)
    // uniqueness is the one irreducibly keyed rule: extras per key,
    // summed — equals n_rows minus distinct keys, without an Expand
    val pk = li.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("v_pk"))
    val wide = viol.crossJoin(pk)
    val stacked = (rowRules.map(_._1) ++ Seq("orderkey_fk_exists"))
      .map(n => s"'$n', v_$n") :+ "'pk_unique', v_pk"
    wide.select(col("n_rows"), expr(
        s"stack(${stacked.size}, ${stacked.mkString(", ")}) AS (rule, n_violations)"))
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations").cast(DoubleType) / col("n_rows").cast(DoubleType))
          .as("violation_rate"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy("rule")
  }

  val all: Seq[QueryDef] = Seq(q104QualityAudit)
}
