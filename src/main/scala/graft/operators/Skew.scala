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

  val all: Seq[QueryDef] = Seq(q40SaltedAgg)
}
