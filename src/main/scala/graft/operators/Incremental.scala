package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

import graft.engine.{QueryDef, Tables}

/** Incremental aggregation [EXT, north star]: the partial-aggregate
  * merge pattern. At 100 TB no pipeline re-reads history to refresh a
  * rollup — it stores algebraic PARTIALS per ingestion unit (here: per
  * day) and merges them. Correctness requires every aggregate to be
  * decomposable (sum of sums, sum of counts, min of mins, max of maxes)
  * and exact under reordering, which is why the partial sums are decimal:
  * double partials would make the merged total depend on merge order and
  * silently drift from the full recompute.
  *
  * The same shape is what a Structured Streaming aggregation state store
  * holds per key — this is its batch, re-runnable form.
  */
object Incremental {

  /** Per-(key, unit) algebraic partials over a decimal value column. */
  def dailyPartials(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).as("psum"), count(lit(1)).as("pn"),
        min(col("v")).as("pmin"), max(col("v")).as("pmax"))

  /** Merge partials up to the key level — the refresh step, touching
    * only |keys|×|days| rows, never the event log.
    */
  def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy("event_type")
      .agg(sum(col("psum")).as("sum_v"), sum(col("pn")).as("n"),
        min(col("pmin")).as("min_v"), max(col("pmax")).as("max_v"))

  // q83 — the merged rollup must equal the direct single-pass aggregate
  // bit-for-bit; the oracle IS that direct aggregate. (COUNT pinned to
  // BIGINT: DuckDB's SUM over the partial counts would be HUGEINT.)
  val q83IncrementalAgg: QueryDef = QueryDef.sql(
    "q83_incremental_agg",
    """SELECT event_type,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      |       COUNT(*) AS n,
      |       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
      |       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    mergePartials(dailyPartials(Tables.events(s, d)))
      .select(col("event_type"),
        col("sum_v").cast(DoubleType).as("sum_v"),
        col("n"),
        col("min_v").cast(DoubleType).as("min_v"),
        col("max_v").cast(DoubleType).as("max_v"))
      .orderBy("event_type")
  }

  val all: Seq[QueryDef] = Seq(q83IncrementalAgg)
}
