package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Relational operator set (SURVEY.md §2.3 q01–q02, q06–q15, q17).
  *
  * Re-expresses the reference's scan/filter/dedup/union/sort/latest-snapshot
  * semantics (`/root/reference/DataExtract/extract_data.py`,
  * `/root/reference/config.py:81-99`) over the deterministic testdata, plus
  * the [EXT] joins/aggregations/windows the reference lacks.
  *
  * Oracle-parity rules (see QueryDef): per-row arithmetic stays in double
  * (bit-identical across engines), aggregation happens over decimals (exact,
  * order-insensitive), final types are pinned with explicit casts, and every
  * query ends in a deterministic total order.
  *
  * 100 TB notes: every aggregation here is a hash aggregate with map-side
  * partial aggregation; joins against `nation`/`region` are broadcast (tiny
  * dims); `orders ⋈ lineitem` is a shuffle join on the join key only after
  * column pruning; windows partition by a key with bounded group size
  * (user_id, custkey) so no single partition explodes.
  */
object Relational {

  /** Cast to a pinned decimal type — the exact-aggregation workhorse. */
  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Exact decimal sum emitted as double: summing decimals is exact and
    * order-insensitive (unlike double summation, which varies with partial-
    * aggregation order), and the final decimal→double conversion is
    * correctly rounded in both Spark and DuckDB, so the output is
    * bit-identical across engines while keeping a pandas/arrow-friendly
    * float64 schema.
    */
  private def dsum(c: Column): Column = sum(c).cast(DoubleType)

  // q01 — scan + projection (ref P4: parsers emit exactly the declared
  // fields, transform_data.py:36). Column pruning reaches the parquet scan.
  val q01ScanProject: QueryDef = QueryDef.sql(
    "q01_scan_project",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      |       l_extendedprice, l_returnflag
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        "l_extendedprice", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // q02 — predicate pushdown (ref F1: filters encoded into the fetch URL,
  // extract_data.py:47-51). Both predicates reach the parquet scan.
  val q02Filter: QueryDef = QueryDef.sql(
    "q02_filter",
    """SELECT event_id, user_id, value
      |FROM events
      |WHERE event_type = 'signup' AND value > 100
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_type") === "signup" && col("value") > 100)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  // q06 — dictionary lookup with fallback (ref D1, config.py:47-53): the
  // reference's only join-like op. Tiny dims ⇒ broadcast hash join, no
  // shuffle of the probe side.
  val q06DictLookup: QueryDef = QueryDef.sql(
    "q06_dict_lookup",
    """SELECT c_custkey,
      |       COALESCE(n_name, substring(c_name, 1, 3)) AS nation_name,
      |       COALESCE(r_name, 'all') AS region_name
      |FROM customer
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("n_name"), substring(col("c_name"), 1, 3)).as("nation_name"),
        coalesce(col("r_name"), lit("all")).as("region_name"))
      .orderBy("c_custkey")
  }

  // q07 — first-seen-wins dedup (ref U1, extract_data.py:194-197). Explicit
  // row_number (not dropDuplicates) for determinism; tie-broken by event_id.
  val q07Dedup: QueryDef = QueryDef.sql(
    "q07_dedup",
    """SELECT user_id, event_type, event_id, ts, value FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts", "value")
      .orderBy("user_id", "event_type")
  }

  // q08 — latest-snapshot resolution (ref S7/O3, config.py:81-99): newest
  // row per key. Models the *intent* (latest by time) with a real ordering
  // column, fixing the reference's ddmmyyyy lexicographic-sort bug.
  val q08LatestSnapshot: QueryDef = QueryDef.sql(
    "q08_latest_snapshot",
    """SELECT user_id, event_id, ts, event_type, value FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
  }

  // q09 — union/append across pages (ref U2, extract_data.py:136): UNION ALL
  // of two slices, stable re-sort.
  val q09Union: QueryDef = QueryDef.sql(
    "q09_union",
    """SELECT event_id, event_type, value
      |FROM (SELECT event_id, event_type, value FROM events WHERE event_type = 'signup'
      |      UNION ALL
      |      SELECT event_id, event_type, value FROM events WHERE value > 190)
      |ORDER BY event_id, event_type, value""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select("event_id", "event_type", "value")
    ev.filter(col("event_type") === "signup")
      .unionAll(ev.filter(col("value") > 190))
      .orderBy("event_id", "event_type", "value")
  }

  // q10 — order + bounded fetch (ref O1/O4, extract_data.py:245,130): top-k
  // by totalprice. Spark plans this as TakeOrderedAndProject — a per-
  // partition top-k then a k-sized driver merge, no full sort at scale.
  val q10SortLimit: QueryDef = QueryDef.sql(
    "q10_sort_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  // q11 — grouped count (ref A1/X8: running counts + the header-count
  // cross-check, extract_data.py:53-62).
  val q11Count: QueryDef = QueryDef.sql(
    "q11_count",
    """SELECT event_type, COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  // q12 — TPC-H Q1-shape hash aggregate [EXT]. Map-side partial agg + final
  // agg; decimals keep sums exact and order-insensitive.
  val q12GroupbyAgg: QueryDef = QueryDef.sql(
    "q12_groupby_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    // Decimal arithmetic end-to-end: casting COMPUTED doubles to decimal is
    // not portable (Java rounds the shortest decimal repr, DuckDB rounds the
    // exact binary value — they disagree when the shortest repr ends in a
    // trailing 5), but base columns hold exact 2-decimal values where both
    // agree, and decimal × decimal is exact in both engines.
    val qty = dec(col("l_quantity"), 18, 2)
    val one = lit(1).cast(DecimalType(3, 2))
    val discPrice = dec(col("l_extendedprice"), 12, 2) * (one - dec(col("l_discount"), 4, 2))
    val charge = discPrice * (one + dec(col("l_tax"), 4, 2))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(qty).as("sum_qty"),
        dsum(dec(col("l_extendedprice"), 18, 2)).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(charge).as("sum_charge"),
        (dsum(qty) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // q13 — fact-fact join + aggregate [EXT]. Both sides pruned to the join
  // key + needed columns before the shuffle; at scale this is a shuffle
  // hash/sort-merge join on l_orderkey = o_orderkey.
  val q13JoinAgg: QueryDef = QueryDef.sql(
    "q13_join_agg",
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    val one = lit(1).cast(DecimalType(3, 2))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        (dec(col("l_extendedprice"), 12, 2) * (one - dec(col("l_discount"), 4, 2))).as("rev"))
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        dsum(col("rev")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  // q14 — ranking window [EXT; ref anchor O3 latest-snapshot]: top-3 orders
  // per customer by totalprice.
  val q14Window: QueryDef = QueryDef.sql(
    "q14_window",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice, rank() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3
      |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  // q15 — JSON extraction [EXT] over events.props (`{"k": 87}`).
  // from_json with an explicit schema, not get_json_object: one schema-driven
  // Jackson parse per row (~7µs) vs path evaluation (~100µs+) — at 100 TB the
  // difference is the whole job.
  val q15JsonExtract: QueryDef = QueryDef.sql(
    "q15_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin) { (s, d) =>
    Tables.widen(Tables.events(s, d))
      .select(
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"),
        col("value"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n"),
        dsum(dec(col("value"), 18, 2)).as("sum_value"))
      .orderBy("k")
  }

  // q17 — tumbling time window [EXT], the batch analog of the reference's
  // stale-round watermark loop (extract_data.py:232-237). The streaming twin
  // lives in graft.streaming.EventStream.
  val q17TimeWindow: QueryDef = QueryDef.sql(
    "q17_time_window",
    """SELECT date_trunc('hour', ts) AS hour_ts,
      |       COUNT(*) AS n_events,
      |       COUNT(DISTINCT user_id) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY hour_ts""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast(TimestampNTZType).as("hour_ts"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(dec(col("value"), 18, 2)).as("sum_value"))
      .orderBy("hour_ts")
  }

  // q114 — multi-way STAR join (TPC-H Q5 shape): region → nation →
  // customer → orders → lineitem → supplier (local-supplier condition
  // s_nationkey = c_nationkey), revenue per nation for one region and a
  // date window. The engine's join-planning showcase: three dimension
  // joins broadcast (region/nation tiny, customer small after the
  // region semi-filter cascades), the two fact joins shuffle on their
  // keys, and the date predicate pushes into the orders scan. Revenue is
  // exact decimal arithmetic over BASE columns (q13's rule: never cast a
  // computed double), emitted as double.
  val q114StarJoin: QueryDef = QueryDef.sql(
    "q114_star_join",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    val one = lit(1).cast(DecimalType(3, 2))
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (dec(col("l_extendedprice"), 12, 2) * (one - dec(col("l_discount"), 4, 2))).as("rev"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    broadcast(r)
      .join(n, col("n_regionkey") === col("r_regionkey"))
      .join(c, col("c_nationkey") === col("n_nationkey"))
      .join(o, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("s_suppkey") === col("l_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  // q134 — correlated per-group average filter (TPC-H Q17's shape):
  // lines with quantity below a fifth of their PART's average quantity,
  // revenue per brand. The textbook correlated scalar subquery — and the
  // showcase for DECORRELATION: the oracle keeps the correlated form
  // (per-part aggregate joined back, which is what an engine without
  // decorrelation must execute); the engine runs ONE window over
  // l_partkey instead — same single shuffle computes the aggregate AND
  // keeps the row context, no join-back, no second lineitem pass.
  //
  // Exactness: quantities are integral doubles → BIGINT; the threshold
  // qty < 0.2·avg is cross-multiplied to qty·cnt·5 < sum_qty (pure
  // integer compare, no float division crosses engines); revenue sums
  // in DECIMAL and converts to double once.
  //
  // 100 TB notes: one lineitem shuffle on l_partkey (with a bucketed
  // lineitem table, zero), part broadcasts, final agg is |brands|-tiny.
  val q134AvgQtyFilter: QueryDef = QueryDef.sql(
    "q134_avgqty_filter",
    """WITH q AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
      |         CAST(l_extendedprice AS DECIMAL(14,2)) AS price
      |  FROM lineitem),
      |s AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
      |             COUNT(*) AS cnt
      |      FROM q GROUP BY 1),
      |j AS (SELECT p.p_brand, q.price
      |      FROM q JOIN s USING (l_partkey)
      |      JOIN part p ON p.p_partkey = q.l_partkey
      |      WHERE q.qty * cnt * 5 < sum_qty)
      |SELECT p_brand, COUNT(*) AS n_lines,
      |       CAST(CAST(SUM(price) AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM j GROUP BY 1
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    val byPart = Window.partitionBy("l_partkey")
    val part = Tables.part(s, d)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"),
        col("l_quantity").cast(LongType).as("qty"),
        col("l_extendedprice").cast(DecimalType(14, 2)).as("price"))
      .withColumn("sum_qty", sum("qty").over(byPart))
      .withColumn("cnt", count(lit(1)).over(byPart))
      .filter(col("qty") * col("cnt") * 5 < col("sum_qty"))
      .join(broadcast(part), "l_partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum("price").cast(DecimalType(18, 2)).cast(DoubleType).as("sum_price"))
      .select(col("p_brand"), col("n_lines"),
        (col("sum_price") / 7.0).as("avg_yearly"))
      .orderBy("p_brand")
  }

  // q147 — TPC-H Q5 shape: six-table local-supplier revenue per nation —
  // the canonical join-PLANNING workload (snowflake chain region→nation
  // fanning into BOTH customer and supplier, the fact tables joined on
  // two independent keys plus the c_nationkey = s_nationkey locality
  // constraint). What the plan must do at 100 TB, and does here (PLANS
  // row): region/nation/customer/supplier broadcast down the chain in
  // size order — Catalyst's own choice once post-filter sizes are known
  // — so the ONLY repartition exchange in the whole query is
  // orders⋈lineitem on orderkey; the date filter lands in PushedFilters
  // on the orders scan, pruning before the join. Revenue follows the q12
  // decimal discipline (exact, order-insensitive; double only at emit).
  val q147TpchQ5: QueryDef = QueryDef.sql(
    "q147_tpch_q5",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |       AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    val one = lit(1).cast(DecimalType(3, 2))
    val revenue =
      dec(col("l_extendedprice"), 12, 2) * (one - dec(col("l_discount"), 4, 2))
    Tables.region(s, d).filter(col("r_name") === "ASIA")
      .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.customer(s, d), col("c_nationkey") === col("s_nationkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-01-01").cast(TimestampType)),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name")
      .agg(dsum(revenue).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // q163 — TPC-H Q21 shape (sole-late-supplier analysis), the classic
  // EXISTS / NOT EXISTS decorrelation stress: suppliers who shipped the
  // ONLY late line of a finished multi-supplier order. The oracle runs
  // the textbook correlated form (two self-joins of the order lines —
  // three passes over lineitem); the engine computes the same answer in
  // ONE pass over the (orderkey, suppkey) grain: per-supplier any_late
  // is a keyed agg, both correlated counts (distinct suppliers in the
  // order, distinct LATE suppliers) come from one orderkey window over
  // those per-supplier rows, and a supplier qualifies iff it is late,
  // shares the order (n_supp ≥ 2), and is the only late one
  // (n_late = 1 — it is itself that one, so "no OTHER late supplier"
  // needs no anti-join). The agg and the window share the orderkey
  // partitioning family; the final per-supplier count is tiny and ends
  // in TakeOrderedAndProject. "Late" = shipped > 60 days after the
  // order date — timestamp + day-time interval, exact in both engines.
  val q163TpchQ21: QueryDef = QueryDef.sql(
    "q163_tpch_q21",
    """WITH l AS (SELECT l_orderkey, l_suppkey,
      |             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |                  THEN 1 ELSE 0 END AS late
      |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |           WHERE o_orderstatus = 'F')
      |SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
      |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey AS s_suppkey
      |  FROM l l1
      |  WHERE l1.late = 1
      |    AND EXISTS (SELECT 1 FROM l l2
      |                WHERE l2.l_orderkey = l1.l_orderkey
      |                  AND l2.l_suppkey <> l1.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM l l3
      |                    WHERE l3.l_orderkey = l1.l_orderkey
      |                      AND l3.l_suppkey <> l1.l_suppkey
      |                      AND l3.late = 1)
      |) GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
          .otherwise(0).as("late"))
    val perSupp = l.groupBy("l_orderkey", "l_suppkey")
      .agg(max("late").as("any_late"))
    val wo = Window.partitionBy("l_orderkey")
    perSupp
      .withColumn("n_supp", count(lit(1)).over(wo))
      .withColumn("n_late", sum("any_late").over(wo))
      .filter(col("any_late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  // q168 — TPC-H Q8 shape (national market share): one nation's revenue
  // share of a region's STANDARD-part market by order year — the
  // double-dimension-chain planning workload (customer side resolves
  // region membership, supplier side resolves the share nation; the
  // SAME nation table joins twice under different roles). Dimensions
  // broadcast down both chains; the fact joins shuffle on their keys;
  // the share is ONE double division of two exact decimal sums per year
  // (q12's money discipline — the numerator is a conditional sum inside
  // the same aggregation, so both sums ride one shuffle).
  val q168TpchQ8: QueryDef = QueryDef.sql(
    "q168_tpch_q8",
    """WITH rev AS (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |         CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
      |         n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region   ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN part     ON p_partkey = l_partkey
      |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
      |SELECT o_year,
      |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
      |                     ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
      |         / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
      |       CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    def dec(c: Column, p: Int, sc: Int): Column = c.cast(DecimalType(p, sc))
    val one = lit(1).cast(DecimalType(3, 2))
    val rev = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d).select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.nation(s, d)
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("n2_key"))
      .join(Tables.part(s, d).filter(col("p_type") === "STANDARD"),
        col("p_partkey") === col("l_partkey"))
      .select(year(col("o_orderdate")).cast("int").as("o_year"),
        (dec(col("l_extendedprice"), 12, 2) * (one - dec(col("l_discount"), 4, 2)))
          .as("volume"),
        col("supp_nation"))
    rev.groupBy("o_year")
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0).cast(DecimalType(3, 2)))).cast("double")
          / sum(col("volume")).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_year")
  }

  val all: Seq[QueryDef] = Seq(
    q01ScanProject, q02Filter, q06DictLookup, q07Dedup, q08LatestSnapshot,
    q09Union, q10SortLimit, q11Count, q12GroupbyAgg, q13JoinAgg, q14Window,
    q15JsonExtract, q17TimeWindow, q114StarJoin, q134AvgQtyFilter, q147TpchQ5,
    q163TpchQ21, q168TpchQ8)
}
