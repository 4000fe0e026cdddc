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

  val all: Seq[QueryDef] = Seq(q40SaltedAgg, q82SaltedJoin)
}
