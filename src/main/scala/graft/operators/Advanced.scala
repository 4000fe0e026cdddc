package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Remaining [EXT] relational surface from SURVEY.md §2.2: multi-level
  * aggregation (rollup/grouping sets), set operations, semi/anti joins,
  * distinct counting (exact + HLL sketch), and window frames
  * (lag/lead/running aggregates).
  */
object Advanced {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  // q32 — ROLLUP: subtotals + grand total in one pass (partial aggregation
  // still applies; Spark expands grouping sets before the shuffle). Group
  // keys are coalesced to a sentinel so NULL-ordering differences between
  // engines can't bite.
  val q32Rollup: QueryDef = QueryDef.sql(
    "q32_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"), 18, 2)).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().cast(IntegerType).as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy("gid", "returnflag", "linestatus")
  }

  // q33 — INTERSECT / EXCEPT (set semantics, the reference's U1/U2 family
  // completed): users who both signed up and errored, and users who signed
  // up but never purchased.
  val q33SetOps: QueryDef = QueryDef.sql(
    "q33_set_ops",
    """SELECT 'both' AS tag, user_id FROM
      |  (SELECT user_id FROM events WHERE event_type = 'signup'
      |   INTERSECT
      |   SELECT user_id FROM events WHERE event_type = 'error')
      |UNION ALL
      |SELECT 'never_purchased' AS tag, user_id FROM
      |  (SELECT user_id FROM events WHERE event_type = 'signup'
      |   EXCEPT
      |   SELECT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY tag, user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    def ids(t: String) = ev.filter(col("event_type") === t).select("user_id")
    val both = ids("signup").intersect(ids("error"))
      .select(lit("both").as("tag"), col("user_id"))
    val never = ids("signup").except(ids("purchase"))
      .select(lit("never_purchased").as("tag"), col("user_id"))
    both.unionAll(never).orderBy("tag", "user_id")
  }

  // q34 — left-semi (EXISTS) and left-anti (NOT EXISTS) joins: customers
  // with vs without orders. The semi/anti forms never materialize the
  // right side's columns — at scale that halves the shuffle.
  val q34SemiAnti: QueryDef = QueryDef.sql(
    "q34_semi_anti",
    """SELECT 'active' AS tag, c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'dormant' AS tag, c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY tag, c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d).select("o_custkey")
    val active = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("active").as("tag"), col("c_custkey"))
    val dormant = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("dormant").as("tag"), col("c_custkey"))
    active.unionAll(dormant).orderBy("tag", "c_custkey")
  }

  // q35 — distinct counting: exact per group (oracle-checked); the HLL
  // sketch variant lives in q38 (rows-only — sketch internals differ
  // across engines by construction).
  val q35DistinctCount: QueryDef = QueryDef.sql(
    "q35_distinct_count",
    """SELECT p_brand,
      |       COUNT(DISTINCT p_type) AS n_types,
      |       COUNT(DISTINCT p_size) AS n_sizes,
      |       COUNT(*) AS n_parts
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .groupBy("p_brand")
      .agg(
        countDistinct(col("p_type")).as("n_types"),
        countDistinct(col("p_size")).as("n_sizes"),
        count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }

  // q36 — window frames: lag/lead navigation and a running (cumulative)
  // sum per user ordered by time. The running sum accumulates decimals in
  // frame order — deterministic and engine-portable.
  val q36WindowFrames: QueryDef = QueryDef.sql(
    "q36_window_frames",
    """SELECT event_id, user_id, value,
      |       lag(value) OVER w AS prev_value,
      |       lead(value) OVER w AS next_value,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        sum(dec(col("value"), 18, 2))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  // q38 — HLL sketch distinct (approx_count_distinct): rows-only by
  // construction (sketches are engine-specific), paired with the exact
  // q35 so accuracy is inspectable. At 100 TB the sketch is the only
  // viable form — it's a bounded-memory partial aggregate, no shuffle of
  // distinct values.
  val q38ApproxDistinct: QueryDef = QueryDef.rowsOnly("q38_approx_distinct") { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_custs"),
        countDistinct(col("o_custkey")).as("exact_custs"))
      .orderBy("o_orderpriority")
  }

  // q37 — typed-Aggregator centroid per embedding cluster label (rows-only:
  // the aggregator accumulates doubles in partition order, which is not
  // cross-engine reproducible by design; CentroidSpec cross-checks it
  // against an exact decimal formulation).
  val q37Centroid: QueryDef = QueryDef.rowsOnly("q37_centroid") { (s, d) =>
    import graft.functions.{VectorAggregators, VectorOps}
    val centroid = udaf(new VectorAggregators.Centroid(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())
    Tables.embeddings(s, d)
      .select(col("label"), VectorOps.toDouble(col("embedding")).as("e"))
      .groupBy("label")
      .agg(centroid(col("e")).as("centroid"), count(lit(1)).as("n"))
      .select(col("label"), col("n"),
        round(element_at(col("centroid"), 1), 6).as("c0"),
        round(element_at(col("centroid"), 2), 6).as("c1"))
      .orderBy("label")
  }

  // q39 — the HTML offer generator (P1/P2) on the verified path: synthetic
  // pracuj.pl fragments built from `part` columns, parsed by the real
  // flatMap generator + TextOps normalization, verified against the
  // equivalent direct SQL over the same columns.
  val q39HtmlOffers: QueryDef = QueryDef.sql(
    "q39_html_offers",
    """SELECT p_partkey AS key,
      |  trim(regexp_replace(p_name, '\s+', ' ', 'g')) AS position,
      |  concat('Brand ', p_brand) AS company_name,
      |  CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS minimum,
      |  CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS maximum,
      |  'PLN' AS currency,
      |  'month' AS pay_period
      |FROM part
      |ORDER BY key""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.functions.TextOps
    import graft.sources.Offers
    val html = Tables.widen(Tables.part(s, d)).selectExpr(
      "p_partkey",
      """concat('<div data-test="default-offer">',
        |  '<a data-test="link-offer-title">', p_name, '</a>',
        |  '<h3 data-test="text-company-name">Brand ', p_brand, '</h3>',
        |  '<span data-test="offer-salary">',
        |  CAST(floor(p_retailprice) AS BIGINT), ' zł / mies.</span>',
        |  '</div>')""".stripMargin.replaceAll("\n\\s*", "")
        + " AS html")
      .as[(Long, String)]
    val parsed = Offers.parsePracujRawKeyed(html)
    val sal = TextOps.parseSalary(col("salary_raw"))
    parsed.select(
      col("key"),
      TextOps.cleanText(col("position_raw")).as("position"),
      TextOps.cleanText(col("company_raw")).as("company_name"),
      sal.getField("minimum").as("minimum"),
      sal.getField("maximum").as("maximum"),
      sal.getField("currency").as("currency"),
      sal.getField("pay_period").as("pay_period"))
      .orderBy("key")
  }

  // q41 — as-of join, Spark-native form (SURVEY.md §7 stretch): for each
  // event, the most recent order of the same user at-or-before the event
  // time. No inequality join: union both sides tagged, one window pass per
  // key carries the latest order id forward (`last(..., ignoreNulls)`),
  // keep the event rows. One shuffle on the key, state O(1) per row — the
  // formulation that survives 100 TB, unlike a range join that explodes
  // into a filtered cross product per key.
  val q41AsofJoin: QueryDef = QueryDef.sql(
    "q41_asof_join",
    """WITH u AS (
      |  SELECT o_custkey AS user_id, o_orderdate AS t, 0 AS src, o_orderkey AS id FROM orders
      |  UNION ALL
      |  SELECT user_id, ts, 1, event_id FROM events
      |),
      |w AS (SELECT *, last_value(CASE WHEN src = 0 THEN id END IGNORE NULLS)
      |        OVER (PARTITION BY user_id ORDER BY t, src, id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey FROM u)
      |SELECT id AS event_id, user_id, t AS ts, COALESCE(asof_orderkey, -1) AS asof_orderkey
      |FROM w WHERE src = 1
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").cast(TimestampNTZType).as("t"),
      lit(0).as("src"),
      col("o_orderkey").as("id"))
    val events = Tables.events(s, d).select(
      col("user_id"),
      col("ts").as("t"),
      lit(1).as("src"),
      col("event_id").as("id"))
    val w = Window.partitionBy("user_id").orderBy("t", "src", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionAll(events)
      .withColumn("asof_orderkey",
        last(when(col("src") === 0, col("id")), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(col("id").as("event_id"), col("user_id"), col("t").as("ts"),
        coalesce(col("asof_orderkey"), lit(-1L)).as("asof_orderkey"))
      .orderBy("event_id")
  }

  // q69 — as-of join with a tolerance window: same union+carry-forward
  // plan as q41 (one shuffle, O(1) state), but the match is void when the
  // carried order is older than 7 days — the "nearest within tolerance"
  // semantics of time-series as-of joins. Both the id and its timestamp
  // ride the same window (one physical Window op), and the gap check is
  // whole-day arithmetic (datediff), exact in both engines.
  val q69AsofTolerance: QueryDef = QueryDef.sql(
    "q69_asof_tolerance",
    """WITH u AS (
      |  SELECT o_custkey AS user_id, o_orderdate AS t, 0 AS src, o_orderkey AS id FROM orders
      |  UNION ALL
      |  SELECT user_id, ts, 1, event_id FROM events
      |),
      |w AS (SELECT *,
      |        last_value(CASE WHEN src = 0 THEN id END IGNORE NULLS)
      |          OVER (PARTITION BY user_id ORDER BY t, src, id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id,
      |        last_value(CASE WHEN src = 0 THEN t END IGNORE NULLS)
      |          OVER (PARTITION BY user_id ORDER BY t, src, id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_t
      |      FROM u)
      |SELECT id AS event_id, user_id, t AS ts,
      |       CASE WHEN asof_id IS NOT NULL
      |                 AND datediff('day', CAST(asof_t AS DATE), CAST(t AS DATE)) <= 7
      |            THEN asof_id ELSE -1 END AS asof_orderkey
      |FROM w WHERE src = 1
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").cast(TimestampNTZType).as("t"),
      lit(0).as("src"),
      col("o_orderkey").as("id"))
    val events = Tables.events(s, d).select(
      col("user_id"), col("ts").as("t"), lit(1).as("src"), col("event_id").as("id"))
    val w = Window.partitionBy("user_id").orderBy("t", "src", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionAll(events)
      // both carried values in ONE select over the same window spec →
      // CollapseWindow keeps it a single physical Window op
      .select(col("*"),
        last(when(col("src") === 0, col("id")), ignoreNulls = true).over(w).as("asof_id"),
        last(when(col("src") === 0, col("t")), ignoreNulls = true).over(w).as("asof_t"))
      .filter(col("src") === 1)
      .select(col("id").as("event_id"), col("user_id"), col("t").as("ts"),
        when(col("asof_id").isNotNull &&
          datediff(col("t").cast("date"), col("asof_t").cast("date")) <= 7,
          col("asof_id")).otherwise(lit(-1L)).as("asof_orderkey"))
      .orderBy("event_id")
  }

  // q42 — CUBE: all 2^k grouping-set combinations in one pass.
  val q42Cube: QueryDef = QueryDef.sql(
    "q42_cube",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
      |       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
      |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, orderstatus, orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        sum(dec(col("o_totalprice"), 18, 2)).cast(DoubleType).as("sum_price"),
        count(lit(1)).as("n"),
        grouping_id().cast(IntegerType).as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("gid"), col("sum_price"), col("n"))
      .orderBy("gid", "orderstatus", "orderpriority")
  }

  // q43 — date + math scalar family: extraction, truncation, day
  // arithmetic, rounding (both engines round halves away from zero for
  // positive doubles; sqrt is IEEE correctly-rounded everywhere — the
  // transcendentals exp/log are NOT cross-engine stable and stay out of
  // verified queries).
  val q43DateMath: QueryDef = QueryDef.sql(
    "q43_date_math",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS y,
      |  CAST(month(o_orderdate) AS INTEGER) AS m,
      |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
      |  date_trunc('day', o_orderdate) AS day_ts,
      |  CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
      |  round(o_totalprice) AS rounded_price,
      |  CAST(floor(o_totalprice / 1000) * 1000 AS BIGINT) AS price_bucket,
      |  sqrt(o_totalprice) AS sqrt_price,
      |  abs(o_totalprice - 100000.0) AS dist_from_100k
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast(IntegerType).as("y"),
        month(col("o_orderdate")).cast(IntegerType).as("m"),
        dayofmonth(col("o_orderdate")).cast(IntegerType).as("dom"),
        date_trunc("day", col("o_orderdate")).cast(TimestampNTZType).as("day_ts"),
        datediff(col("o_orderdate").cast(DateType),
          lit(java.sql.Date.valueOf("2024-01-01"))).cast(IntegerType).as("days_since"),
        round(col("o_totalprice")).as("rounded_price"),
        (floor(col("o_totalprice") / 1000) * 1000).as("price_bucket"),
        sqrt(col("o_totalprice")).as("sqrt_price"),
        abs(col("o_totalprice") - 100000.0).as("dist_from_100k"))
      .orderBy("o_orderkey")
  }

  // q44 — array scalar family over tokenized documents: size, indexing,
  // sorted access, membership, slicing.
  val q44ArrayOps: QueryDef = QueryDef.sql(
    "q44_array_ops",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS INTEGER) AS n_toks,
      |  toks[1] AS first_tok,
      |  list_sort(toks)[1] AS min_tok,
      |  list_contains(toks, 'the') AS has_the,
      |  array_to_string(toks[1:5], ' ') AS head5
      |FROM t
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(IntegerType).as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(sort_array(col("toks")), 1).as("min_tok"),
        array_contains(col("toks"), "the").as("has_the"),
        array_join(slice(col("toks"), 1, 5), " ").as("head5"))
      .orderBy("doc_id")
  }

  // q46 — session windows in batch (`session_window`, the one-shot form of
  // the streaming sessionization in graft.streaming.EventStream): a
  // session groups a user's events separated by gaps < 30 minutes. The
  // oracle is the classic gaps-and-islands formulation (lag + cumulative
  // session counter), which is also what the Spark plan lowers to.
  val q46SessionWindow: QueryDef = QueryDef.sql(
    "q46_session_window",
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |      FROM x)
      |SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events
      |FROM y
      |GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast(TimestampNTZType).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  // q262 — NEAREST-IN-TIME alignment (bidirectional as-of — the
  // sensor-fusion/root-cause semantics q41's backward-only as-of can't
  // express: for every error, the temporally CLOSEST click by the same
  // user, whichever side it falls on): the q41 union+window pattern run
  // in both directions over one shared (user, time) sort — last
  // preceding click and first following click per error, then the
  // smaller |gap| wins with ties to the PRECEDING side (the causal
  // preference, pinned). All µs arithmetic on BIGINT (unix_micros /
  // epoch_us), so gaps hash-verify exactly; errors with no click at all
  // emit the explicit none row. One shuffle on user_id, O(1) window
  // state — the same 100 TB contract as q41, paid once for both
  // directions.
  val q262NearestEvent: QueryDef = QueryDef.sql(
    "q262_nearest_event",
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS src,
      |         event_id AS id
      |  FROM events WHERE event_type IN ('click', 'error')),
      |w AS (SELECT *,
      |  last_value(CASE WHEN src = 0 THEN us END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY us, src, id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
      |  last_value(CASE WHEN src = 0 THEN id END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY us, src, id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
      |  first_value(CASE WHEN src = 0 THEN us END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY us, src, id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us,
      |  first_value(CASE WHEN src = 0 THEN id END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY us, src, id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id
      |  FROM u)
      |SELECT id AS error_id, user_id,
      |  CASE WHEN prev_us IS NULL AND next_us IS NULL THEN 'none'
      |       WHEN next_us IS NULL THEN 'prev'
      |       WHEN prev_us IS NULL THEN 'next'
      |       WHEN us - prev_us <= next_us - us THEN 'prev'
      |       ELSE 'next' END AS side,
      |  CAST(COALESCE(CASE
      |       WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
      |       WHEN next_us IS NULL THEN prev_id
      |       WHEN prev_us IS NULL THEN next_id
      |       WHEN us - prev_us <= next_us - us THEN prev_id
      |       ELSE next_id END, -1) AS BIGINT) AS click_id,
      |  CAST(COALESCE(CASE
      |       WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
      |       WHEN next_us IS NULL THEN us - prev_us
      |       WHEN prev_us IS NULL THEN next_us - us
      |       WHEN us - prev_us <= next_us - us THEN us - prev_us
      |       ELSE next_us - us END, -1) AS BIGINT) AS gap_us
      |FROM w WHERE src = 1
      |ORDER BY error_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val u = Tables.events(s, d)
      .filter(col("event_type").isin("click", "error"))
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        when(col("event_type") === "click", 0).otherwise(1).as("src"),
        col("event_id").as("id"))
    val order = Window.partitionBy("user_id").orderBy("us", "src", "id")
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val clickUs = when(col("src") === 0, col("us"))
    val clickId = when(col("src") === 0, col("id"))
    val w = u
      .withColumn("prev_us", last(clickUs, ignoreNulls = true).over(back))
      .withColumn("prev_id", last(clickId, ignoreNulls = true).over(back))
      .withColumn("next_us", first(clickUs, ignoreNulls = true).over(fwd))
      .withColumn("next_id", first(clickId, ignoreNulls = true).over(fwd))
      .filter(col("src") === 1)
    val gapPrev = col("us") - col("prev_us")
    val gapNext = col("next_us") - col("us")
    val side = when(col("prev_us").isNull && col("next_us").isNull, "none")
      .when(col("next_us").isNull, "prev")
      .when(col("prev_us").isNull, "next")
      .when(gapPrev <= gapNext, "prev")
      .otherwise("next")
    w.select(col("id").as("error_id"), col("user_id"),
      side.as("side"),
      coalesce(when(side === "prev", col("prev_id"))
        .when(side === "next", col("next_id")), lit(-1L)).as("click_id"),
      coalesce(when(side === "prev", gapPrev)
        .when(side === "next", gapNext), lit(-1L)).as("gap_us"))
      .orderBy("error_id")
  }

  val all: Seq[QueryDef] = Seq(
    q32Rollup, q33SetOps, q34SemiAnti, q35DistinctCount, q36WindowFrames,
    q37Centroid, q38ApproxDistinct, q39HtmlOffers, q41AsofJoin, q42Cube,
    q43DateMath, q44ArrayOps, q46SessionWindow, q69AsofTolerance,
    q262NearestEvent)
}
