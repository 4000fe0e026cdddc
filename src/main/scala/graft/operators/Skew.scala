// (see companion spec SkewSpec for the AQE skew-join plan assertion)
package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

import graft.engine.{QueryDef, Tables}

/** Skew handling: two-stage salted aggregation. When a group-by key has a
  * few hot values (here: `events.event_type`, 5 values over the whole
  * table), a plain hash aggregate funnels each hot key through one
  * reducer. Salting spreads each key over `salts` sub-keys for the first
  * (heavy) aggregation, then combines the partials in a second, tiny
  * aggregation — classic hot-key mitigation when AQE's skew handling
  * can't apply (it only splits join partitions, not aggregation groups).
  *
  * Only algebraic aggregates can be salted this way (sum/count/min/max —
  * partials combine losslessly). The salt is derived deterministically
  * from a high-cardinality column; any uniform assignment yields the same
  * final result because the aggregates are commutative and decimal sums
  * are exact.
  */
object Skew {

  // q259 — JOIN-SKEW DIAGNOSIS (the report you run BEFORE choosing a
  // cure — q40/q82 APPLY salting, SkewSpec pins when AQE suffices; this
  // measures whether either is needed): per join key of the
  // fact-to-fact pair (orders ⋈ lineitem on orderkey is uniform;
  // lineitem's partkey side is the interesting one), the fanout
  // distribution — top-10 hottest keys with exact counts and corpus
  // share in basis points, plus the headline skew statistics every
  // salting decision reads: max/mean fanout ratio (×1000) and the share
  // of rows carried by the top-10 (bp). Exact integers end-to-end (the
  // mean arrives as total div keys — integer, like the rest of the
  // suite's ratio discipline). One keyed count + one top-k
  // (TakeOrderedAndProject) + 1-row broadcast totals — the report costs
  // one shuffle of key-count pairs, never a data rescan.
  val q259SkewDiag: QueryDef = QueryDef.sql(
    "q259_skew_diag",
    """WITH f AS (SELECT l_partkey AS k, count(*) AS fanout
      |           FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(fanout) AS BIGINT) AS total,
      |               CAST(count(*) AS BIGINT) AS n_keys,
      |               CAST(max(fanout) AS BIGINT) AS max_f FROM f),
      |top AS (SELECT k, fanout FROM f
      |        ORDER BY fanout DESC, k LIMIT 10)
      |SELECT CAST(row_number() OVER (ORDER BY t.fanout DESC, t.k) AS BIGINT)
      |         AS rank,
      |       CAST(t.k AS BIGINT) AS k, CAST(t.fanout AS BIGINT) AS fanout,
      |       CAST(t.fanout * 10000 // o.total AS BIGINT) AS share_bp,
      |       CAST(o.max_f * 1000 * o.n_keys // o.total AS BIGINT)
      |         AS skew_ratio_x1000,
      |       CAST((SELECT sum(fanout) FROM top) * 10000 // o.total AS BIGINT)
      |         AS top10_share_bp
      |FROM top t CROSS JOIN tot o
      |ORDER BY rank""".stripMargin) { (s, d) =>
    val f = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("fanout"))
    val tot = f.agg(sum("fanout").cast("long").as("total"),
      count(lit(1)).as("n_keys"), max("fanout").as("max_f"))
    val top = f.orderBy(col("fanout").desc, col("k")).limit(10)
    val topSum = top.agg(sum("fanout").cast("long").as("top_sum"))
    import org.apache.spark.sql.expressions.Window
    top.crossJoin(broadcast(tot)).crossJoin(broadcast(topSum))
      .select(
        row_number().over(Window.orderBy(col("fanout").desc, col("k")))
          .cast("long").as("rank"),
        col("k").cast("long").as("k"), col("fanout").cast("long").as("fanout"),
        expr("fanout * 10000 div total").as("share_bp"),
        expr("max_f * 1000 * n_keys div total").as("skew_ratio_x1000"),
        expr("top_sum * 10000 div total").as("top10_share_bp"))
      .orderBy("rank")
  }

  /** Two-stage salted sum + count over a decimal value column. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltSource: Column, salts: Int): DataFrame =
    df.select(key.as("__key"), value.as("__v"),
      pmod(xxhash64(saltSource), lit(salts)).as("__salt"))
      .groupBy("__key", "__salt")
      .agg(sum(col("__v")).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy("__key")
      .agg(sum(col("__psum")).as("__sum"), sum(col("__pn")).as("__n"))

  // q40 — salted aggregation over the genuinely skewed events.event_type
  // (5 hot keys). Results are exact (decimal partials), so the oracle is
  // the plain single-stage aggregation.
  val q40SaltedAgg: QueryDef = QueryDef.sql(
    "q40_salted_agg",
    """SELECT event_type,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |       COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    saltedSumCount(ev,
      key = col("event_type"),
      value = col("value").cast(DecimalType(18, 2)),
      saltSource = col("event_id"),
      salts = 8)
      .select(col("__key").as("event_type"),
        col("__sum").cast(DoubleType).as("sum_value"),
        col("__n").as("n"))
      .orderBy("event_type")
  }

  /** Salt-replicated join: replicate each dim row across `salts`
    * sub-keys, route each fact row to one sub-key, and join on
    * (key, salt). Every fact row still meets its dim row exactly once
    * (the dim copy with its salt), so results equal the plain join —
    * but a hot key's fact rows now spread over `salts` reducers instead
    * of one. This is the manual form of AQE's skew-join split for the
    * cases AQE can't handle (skew detected by the user, not by runtime
    * partition sizes; or a non-shuffle downstream that pins partitioning).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast(IntegerType))
      .hint("shuffle_hash") // both sides big at scale — never broadcast
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  // q82 — salted join of the skewed fact (events) against a per-type cost
  // dim. Exact decimal arithmetic, so the oracle is the plain unsalted
  // join. The shuffle_hash hint keeps the plan a shuffled join even at
  // test scale, where the replicated dim would otherwise broadcast and
  // hide the salt from the physical plan (SkewSpec asserts the shape).
  private val eventCosts: Seq[(String, String)] = Seq(
    ("click", "0.05"), ("error", "0.00"), ("purchase", "4.00"),
    ("signup", "1.50"), ("view", "0.01"))

  val q82SaltedJoin: QueryDef = QueryDef.sql(
    "q82_salted_join",
    s"""WITH costs(event_type, unit_cost) AS (VALUES
       |${eventCosts.map { case (t, c) => s"  ('$t', $c)" }.mkString(",\n")})
       |SELECT e.event_type,
       |       CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * CAST(c.unit_cost AS DECIMAL(6,2))) AS DOUBLE) AS total_cost,
       |       COUNT(*) AS n
       |FROM events e JOIN costs c ON e.event_type = c.event_type
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    val dim = eventCosts.toDF("event_type", "unit_cost")
      .select(col("event_type"), col("unit_cost").cast(DecimalType(6, 2)).as("unit_cost"))
    val fact = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        col("value").cast(DecimalType(18, 2)).as("value"))
    saltedJoin(fact, dim, "event_type", saltSource = col("event_id"), salts = 8)
      .groupBy("event_type")
      .agg(sum(col("value") * col("unit_cost")).cast(DoubleType).as("total_cost"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  val all: Seq[QueryDef] = Seq(q40SaltedAgg, q82SaltedJoin, q259SkewDiag)
}
