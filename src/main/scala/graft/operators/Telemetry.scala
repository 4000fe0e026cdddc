package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

import graft.engine.{QueryDef, Tables}

/** Event-telemetry analytics [EXT, north star]: the query family a
  * training-data pipeline runs over its ingestion event log — snapshot
  * diffing, ordered funnels, cohort retention, inter-arrival statistics.
  * All are single- or two-shuffle shapes keyed on `user_id`, so at 100 TB
  * they co-partition: one `repartition(user_id)` (or a bucketed event
  * table) serves every window below without further exchanges.
  */
object Telemetry {

  /** Latest-per-user state at a time cut: the q08 latest-snapshot shape
    * with a predicate that prunes the scan to `ts < cut`.
    */
  private def stateAt(events: org.apache.spark.sql.DataFrame, cut: String) = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events.filter(col("ts") < lit(cut).cast(TimestampNTZType))
      .select(col("user_id"), col("value"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  // q78 — snapshot diff (the batch MERGE/SCD shape): latest per-user state
  // at two time cuts, full-outer joined and classified. The event log is
  // append-only so 'removed' cannot occur; 'added' = first seen between
  // the cuts. At scale both snapshot windows partition on user_id, so the
  // final join is co-partitioned with them (one shuffle total under
  // exchange reuse).
  val q78SnapshotDiff: QueryDef = QueryDef.sql(
    "q78_snapshot_diff",
    """WITH old AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value,
      |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
      |new AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value,
      |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-23 00:00:00') WHERE rn = 1)
      |SELECT COALESCE(new.user_id, old.user_id) AS user_id,
      |       CASE WHEN old.user_id IS NULL THEN 'added'
      |            WHEN new.value <> old.value THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |       old.value AS old_value, new.value AS new_value
      |FROM new FULL OUTER JOIN old ON new.user_id = old.user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val old = stateAt(ev, "2024-01-15 00:00:00").toDF("user_id", "old_value")
    val neu = stateAt(ev, "2024-01-23 00:00:00").toDF("nuser_id", "new_value")
    neu.join(old, col("nuser_id") === col("user_id"), "full_outer")
      .select(
        coalesce(col("nuser_id"), col("user_id")).as("user_id"),
        when(col("user_id").isNull, "added")
          .when(col("new_value") =!= col("old_value"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_value"), col("new_value"))
      .orderBy("user_id")
  }

  // q79 — strictly-ordered funnel: signup → first click AFTER the signup
  // → first purchase AFTER that click, per user. Each stage is a
  // groupBy(user_id) min over a predicate that references the previous
  // stage's timestamp — the standard three-join funnel plan; every join
  // and aggregation keys on user_id, so the whole funnel is one
  // co-partitioned pipeline at scale.
  val q79Funnel: QueryDef = QueryDef.sql(
    "q79_funnel",
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT stage, n_users FROM (
      |  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_click', COUNT(*) FROM s2
      |  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3)
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(s1, "1_signup")
      .unionAll(stage(s2, "2_click"))
      .unionAll(stage(s3, "3_purchase"))
      .orderBy("stage")
  }

  // q84 — the SAME funnel as q79 in ONE scan: three unbounded window
  // aggregates over partitionBy(user_id), each conditioned on the
  // previous stage's timestamp (t2 = min click ts with ts > t1; a user
  // without the prior stage has a NULL bound, so the predicate is false
  // for every row). All three windows share one partitioning, so the
  // plan is 1 events scan + 1 user_id exchange, vs q79's three scans /
  // three join-agg stages — at 100 TB this is the difference between one
  // pass over the event log and three. The oracle is q79's three-join
  // form: the two plans must agree row-for-row.
  val q84FunnelOnepass: QueryDef = QueryDef.sql(
    "q84_funnel_onepass",
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT stage, n_users FROM (
      |  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_click', COUNT(*) FROM s2
      |  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3)
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val wu = Window.partitionBy("user_id")
    val perUser = Tables.events(s, d).select("user_id", "event_type", "ts")
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(wu))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(wu))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(wu))
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
    perUser
      .agg(count("t1").as("c1"), count("t2").as("c2"), count("t3").as("c3"))
      .select(expr(
        "stack(3, '1_signup', c1, '2_click', c2, '3_purchase', c3) AS (stage, n_users)"))
      .orderBy("stage")
  }

  // q80 — weekly cohort retention: cohort = week of a user's first event;
  // one row per (cohort_week, week_offset) counting users active that
  // week. The activity set is distinct (user, week) BEFORE the cohort
  // join — at 100 TB that distinct collapses the event log (billions) to
  // |users|×|weeks| and is the only heavy shuffle in the plan. The
  // testdata's log is dense (every user active every week), which the
  // oracle reproduces; sparsity does not change the plan.
  val q80Retention: QueryDef = QueryDef.sql(
    "q80_retention",
    """WITH cohort AS (
      |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      |  FROM events GROUP BY 1),
      |activity AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week FROM events)
      |SELECT c.cohort_week,
      |       CAST(date_diff('day', c.cohort_week, a.act_week) // 7 AS INTEGER) AS week_offset,
      |       COUNT(*) AS n_users
      |FROM activity a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select("user_id", "ts")
    val cohort = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).cast(TimestampNTZType).as("cohort_week"))
    val activity = ev
      .select(col("user_id"), date_trunc("week", col("ts")).cast(TimestampNTZType).as("act_week"))
      .distinct()
    activity.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")) / 7).cast(IntegerType)
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  // q81 — inter-arrival gaps: lag over (user_id, ts-order), grouped by
  // the arriving event's type. Exact µs arithmetic on both engines
  // (timestampdiff/date_diff are integral); the sum is pinned to BIGINT
  // because DuckDB's SUM(BIGINT) returns HUGEINT. Deterministic under ts
  // ties via the event_id tie-break.
  val q81Interarrival: QueryDef = QueryDef.sql(
    "q81_interarrival",
    """WITH g AS (
      |  SELECT event_type, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events)
      |SELECT event_type,
      |       COUNT(prev_ts) AS n_gaps,
      |       CAST(SUM(date_diff('microsecond', prev_ts, ts)) AS BIGINT) AS sum_gap_us,
      |       CAST(MAX(date_diff('microsecond', prev_ts, ts)) AS BIGINT) AS max_gap_us
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("ts"), lag("ts", 1).over(w).as("prev_ts"))
      .withColumn("gap_us", expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
      .groupBy("event_type")
      .agg(count(col("prev_ts")).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy("event_type")
  }

  // q119 — per-user temporal train/test split: the time-respecting split
  // for sequential data (q100 splits by hash, q108 by dedup cluster; a
  // model trained on a user's FUTURE and tested on their past leaks).
  // Each user's first 80% of events by time goes to train, the rest to
  // test; the 80% cut is exact integer arithmetic (rank·5 <= n·4), never
  // a float fraction, so both engines agree on every boundary row.
  //
  // Scale shape: ONE exchange keyed on user_id serves both the ordering
  // window and the per-user count — the ordered and unordered frames
  // plan as two Window operators but share the same partitioning, so no
  // second shuffle (PLANS.md: 1 scan, 2 exchanges incl. the final sort).
  // Per-user event streams are bounded, so partitions stay small; a
  // power-user tail is AQE-skew territory, not a plan change.
  val q119TemporalSplit: QueryDef = QueryDef.sql(
    "q119_temporal_split",
    """WITH r AS (
      |  SELECT event_id, user_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT event_id, user_id,
      |       CASE WHEN rnk * 5 <= n * 4 THEN 'train' ELSE 'test' END AS split
      |FROM r
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id")
    val w = byUser.orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        row_number().over(w).as("rnk"),
        count(lit(1)).over(byUser).as("n"))
      .select(col("event_id"), col("user_id"),
        when(col("rnk") * 5 <= col("n") * 4, "train").otherwise("test").as("split"))
      .orderBy("event_id")
  }

  // q129 — keyless RANGE JOIN via cell bucketization: every (click,
  // purchase) pair within ±60 s, with NO join key beyond time itself —
  // the shape Spark has no native optimization for (a raw
  // `ON abs(ta-tb) <= δ` theta-join plans as BroadcastNestedLoopJoin:
  // O(|A|·|B|) compares and a broadcast that dies when neither side is
  // small). The scale form: quantize time into cells of width W = 2δ;
  // the build side registers in its one cell, the probe side probes the
  // cells of [ta−δ, ta+δ] — at W = 2δ that's at most TWO distinct
  // cells, and since the build row sits in exactly one cell a matching
  // pair meets exactly once (no dedup pass). The join becomes a keyed
  // equi-join on cell + an in-cell |ta−tb| ≤ δ filter.
  //
  // 100 TB notes: both sides shuffle ONCE on cell (probe side ≤2×
  // itself via the explode); cost scales with true pair density per
  // cell, not |A|·|B|. Time skew (hot cells) is AQE skew-join
  // territory, same as any keyed join. The BNLJ form survives as the
  // DuckDB oracle. Timestamps compare in µs on both engines
  // (epoch_ns // 1000 ≡ the engine's `ts div 1000` ingest).
  val q129RangeJoin: QueryDef = QueryDef.sql(
    "q129_range_join",
    """WITH e AS (SELECT event_id, event_type, epoch_ns(ts) // 1000 AS t FROM events),
      |a AS (SELECT event_id AS click_id, t AS ta FROM e WHERE event_type = 'click'),
      |b AS (SELECT event_id AS purchase_id, t AS tb FROM e WHERE event_type = 'purchase')
      |SELECT click_id, purchase_id, CAST(tb - ta AS BIGINT) AS dt_us
      |FROM a JOIN b ON abs(ta - tb) <= 60000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    // ts is TIMESTAMP_NTZ; the UTC-pinned session makes the cast exact
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast(TimestampType)).as("t"))
    rangeJoinPairs(
      ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("t").as("ta")),
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("t").as("tb")),
      60000000L)
      .select(col("click_id"), col("purchase_id"), (col("tb") - col("ta")).as("dt_us"))
      .orderBy("click_id", "purchase_id")
  }

  /** q129's kernel, standalone: all (a, b) row pairs with
    * |ta − tb| ≤ deltaUs, as a keyed equi-join on time cells of width
    * 2·delta — the probe side explodes to its interval's ≤2 distinct
    * cells, the build side registers in exactly one, so each matching
    * pair meets exactly once (no dedup pass) and no nested-loop node
    * ever appears. `a` must carry a `ta` column, `b` a `tb` column
    * (µs longs); all other columns pass through.
    */
  def rangeJoinPairs(a: DataFrame, b: DataFrame, deltaUs: Long): DataFrame = {
    val w = 2 * deltaUs
    val ae = a.select(col("*"), explode(array_distinct(array(
      expr(s"(ta - $deltaUs) div $w"), expr(s"(ta + $deltaUs) div $w")))).as("cell"))
    val be = b.withColumn("cell", expr(s"tb div $w"))
    ae.join(be, "cell")
      .filter(abs(col("ta") - col("tb")) <= deltaUs)
      .drop("cell")
  }

  // q157 — q129's semantics through the OPTIMIZER instead of a
  // hand-applied kernel: the query is written as the naive declarative
  // theta-join (`abs(ta − tb) ≤ δ` — exactly what a user types), and
  // [[graft.plans.RangeJoinRule]] rewrites the logical plan into the
  // cell-bucketed equi-join automatically (ExtensionsSpec pins both the
  // no-nested-loop plan shape and rule-on ≡ rule-off results; the
  // oracle is the same all-pairs SQL as q129, so the driver
  // hash-verifies the rewrite's semantics every round).
  val q157RangeJoinAuto: QueryDef = QueryDef.sql(
    "q157_range_join_auto",
    """WITH e AS (SELECT event_id, event_type, epoch_ns(ts) // 1000 AS t FROM events),
      |a AS (SELECT event_id AS click_id, t AS ta FROM e WHERE event_type = 'click'),
      |b AS (SELECT event_id AS purchase_id, t AS tb FROM e WHERE event_type = 'purchase')
      |SELECT click_id, purchase_id, CAST(tb - ta AS BIGINT) AS dt_us
      |FROM a JOIN b ON abs(ta - tb) <= 60000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    graft.plans.RangeJoin.install(s)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast(TimestampType)).as("t"))
    ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("t").as("ta"))
      .join(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("t").as("tb")),
        abs(col("ta") - col("tb")) <= lit(60000000L))
      .select(col("click_id"), col("purchase_id"), (col("tb") - col("ta")).as("dt_us"))
      .orderBy("click_id", "purchase_id")
  }

  // q161 — DIRECTIONAL attribution through the generalized optimizer
  // rule: purchases within 5 min AFTER a click (the one-sided window
  // real attribution uses — q129/q157's |Δt| is the symmetric
  // diagnostic), written as the naive declarative BETWEEN and rewritten
  // by [[graft.plans.RangeJoinRule]]'s asymmetric-window path
  // (tb − ta ∈ [0, δ] ⇒ W = δ cells, probe explodes to its two
  // endpoint cells, build registers once). No abs() anywhere — this is
  // the conjunct-normalization form (`>= .. AND <= .. + δ`), the
  // spelling a user actually types; same all-pairs oracle discipline
  // as q129.
  val q161ClickAttribution: QueryDef = QueryDef.sql(
    "q161_click_attribution",
    """WITH e AS (SELECT event_id, event_type, epoch_ns(ts) // 1000 AS t FROM events),
      |a AS (SELECT event_id AS click_id, t AS ta FROM e WHERE event_type = 'click'),
      |b AS (SELECT event_id AS purchase_id, t AS tb FROM e WHERE event_type = 'purchase')
      |SELECT click_id, purchase_id, CAST(tb - ta AS BIGINT) AS dt_us
      |FROM a JOIN b ON tb - ta BETWEEN 0 AND 300000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    graft.plans.RangeJoin.install(s)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast(TimestampType)).as("t"))
    ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("t").as("ta"))
      .join(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("t").as("tb")),
        (col("tb") - col("ta")).between(lit(0L), lit(300000000L)))
      .select(col("click_id"), col("purchase_id"), (col("tb") - col("ta")).as("dt_us"))
      .orderBy("click_id", "purchase_id")
  }

  // q254 — YEAR-OVER-YEAR growth via a SELF-JOIN of one aggregate (the
  // TPC-DS Q11 shape reduced to its planning essence): per-customer
  // yearly revenue joined against ITSELF on (customer, year+1 = year) —
  // every consecutive-year pair, growth in integer basis points, then a
  // per-year cohort report. The plan point is EXCHANGE REUSE: both join
  // inputs are the IDENTICAL aggregate subtree (no single-side filter
  // for the optimizer to push down and break the symmetry), so Spark
  // computes scan + shuffle + aggregate ONCE and wires the second input
  // as a ReusedExchange — at 100 TB the difference between one pass
  // over the fact table and two (PlanSpec pins the node; the golden's
  // exchange count already nets reuse out). Cents-integer revenue keeps
  // growth_bp exact; the oracle re-derives both sides in DuckDB.
  val q254YoyGrowth: QueryDef = QueryDef.sql(
    "q254_yoy_growth",
    """WITH rev AS (SELECT o_custkey, year(o_orderdate) AS yr,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT CAST(b.yr AS BIGINT) AS yr,
      |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |       CAST(COUNT(*) FILTER (b.cents > a.cents) AS BIGINT) AS n_grew,
      |       CAST(SUM(b.cents * 10000 // a.cents) AS BIGINT) AS sum_growth_bp
      |FROM rev a JOIN rev b
      |  ON a.o_custkey = b.o_custkey AND a.yr + 1 = b.yr
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val rev = Tables.orders(s, d)
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long").as("cents"))
    // disjoint column names per side — self-join column resolution by
    // DataFrame reference is the ambiguity trap
    val a = rev.toDF("custkey_a", "yr_a", "cents_a")
    val b = rev.toDF("custkey_b", "yr_b", "cents_b")
    a.join(b, col("custkey_a") === col("custkey_b") &&
      col("yr_a") + 1 === col("yr_b"))
      .groupBy(col("yr_b").cast("long").as("yr"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("cents_b") > col("cents_a"), 1)).as("n_grew"),
        sum(expr("cents_b * 10000 div cents_a")).cast("long")
          .as("sum_growth_bp"))
      .orderBy("yr")
  }

  // q261 — TIME-WEIGHTED AVERAGE over an irregular event stream (the
  // metric that makes sparse telemetry honest: a value that held for an
  // hour must outweigh one that held for a second — the arithmetic mean
  // q81's inter-arrival stats warn about, fixed): each value is weighted
  // by how long it REMAINED CURRENT (lead(ts) − ts within the type; the
  // last observation carries no interval and drops out — the standard
  // right-open convention), all integer: µs→seconds via div, value in
  // cents, twap ×100 = Σ(cents·dt) div Σdt. One window (the q93 shared
  // partitioning) + one agg; the plain mean is emitted beside it so the
  // report SHOWS the gap weighting closes. DuckDB replays with epoch()
  // arithmetic.
  val q261Twap: QueryDef = QueryDef.sql(
    "q261_twap",
    """WITH e AS (SELECT event_type, ts,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |iv AS (SELECT event_type, cents,
      |         lead(sec) OVER (PARTITION BY event_type ORDER BY ts, cents)
      |           - sec AS dt
      |       FROM e)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(dt) AS BIGINT) AS total_sec,
      |  CAST(sum(cents * dt) // sum(dt) AS BIGINT) AS twap_x100,
      |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_x100
      |FROM iv WHERE dt IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("ts", "cents")
    Tables.events(s, d)
      .select(col("event_type"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("dt",
        (unix_timestamp(lead(col("ts"), 1).over(w))
          - unix_timestamp(col("ts"))).cast("long"))
      .filter(col("dt").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dt").cast("long").as("total_sec"),
        expr("sum(cents * dt) div sum(dt)").as("twap_x100"),
        expr("sum(cents) div count(*)").as("mean_x100"))
      .orderBy("event_type")
  }

  val all: Seq[QueryDef] = Seq(q78SnapshotDiff, q79Funnel, q80Retention,
    q81Interarrival, q84FunnelOnepass, q119TemporalSplit, q129RangeJoin,
    q157RangeJoinAuto, q161ClickAttribution, q254YoyGrowth, q261Twap)
}
