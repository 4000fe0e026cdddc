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

  // q93 — SCD2 history build: compress a per-user event stream into
  // validity intervals (state, valid_from, valid_to, is_current) — the
  // slowly-changing-dimension form every lake keeps for "what was this
  // user's state at time T". Two windows over the SAME partitioning
  // (user_id): lag() detects state changes, lead() closes each interval
  // at the next change — Spark plans one Exchange + one Sort shared by
  // both, so the whole history build is a single shuffle of the event
  // log. Ties on ts break by event_id everywhere, so zero-length
  // intervals are deterministic, not partition-order noise.
  //
  // 100 TB notes: this never materializes per-user arrays (no
  // collect_list) — state is O(1) per row in the window frame; with the
  // event log bucketed by user_id even the one shuffle disappears.
  val q93Scd2: QueryDef = QueryDef.sql(
    "q93_scd2",
    """WITH s AS (
      |  SELECT user_id, event_type AS state, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |chg AS (SELECT user_id, state, ts, event_id FROM s
      |        WHERE prev IS NULL OR prev <> state),
      |iv AS (
      |  SELECT user_id, state, ts AS valid_from,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM chg)
      |SELECT user_id, state, valid_from, valid_to, (valid_to IS NULL) AS is_current
      |FROM iv
      |ORDER BY user_id, valid_from, state""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val chg = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("state"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("state"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
    chg
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "state")
  }

  val all: Seq[QueryDef] = Seq(q83IncrementalAgg, q93Scd2)
}
