package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}
import graft.functions.TextOps

/** User-facing surface of the `graft-offers` DataSourceV2
  * ([[graft.sources.v2.OffersDataSource]]): raw read + the per-site
  * normalization to the reference's 6-column offer schema, as pure
  * expression trees over the unified raw schema — the X1–X7 dispatch
  * (transform_data.py:223-226) driven by the `site` COLUMN, so one
  * codegen'd projection serves every site in the lake.
  */
object OffersV2 {

  /** `spark.read.format("graft-offers")` — the S3 registry mapping. */
  def readRaw(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.format("graft-offers").load(baseDir)

  /** [[readRaw]] with reader options — `spj -> true` opts the scan into
    * storage-partitioned execution ([[graft.sources.v2.OffersScan
    * .outputPartitioning]]): leaf-keyed joins/aggregations then plan
    * with no Exchange (requires `spark.sql.sources.v2.bucketing.enabled`,
    * an engine session default via `SparkEntry.tune`).
    */
  def readRaw(spark: SparkSession, baseDir: String,
      options: Map[String, String]): DataFrame =
    spark.read.format("graft-offers").options(options).load(baseDir)

  /** `spark.readStream.format("graft-offers")` — the S1/S2 scroll loop
    * continuously: each snapshot file that lands in the lake becomes the
    * next micro-batch ([[graft.sources.v2.OffersMicroBatchStream]]).
    * Compose with [[offers]] for the normalized 6-column stream; F1
    * site/region filters prune the discovery walk every trigger.
    */
  def readRawStream(spark: SparkSession, baseDir: String): DataFrame =
    spark.readStream.format("graft-offers").load(baseDir)

  /** The normalized 6-column offer stream: [[readRawStream]] composed
    * with the [[offers]] projection — the whole reference transform
    * running continuously; the normalization is stateless, so the
    * stream needs no watermark and emits in append mode.
    */
  def offersStream(spark: SparkSession, baseDir: String): DataFrame =
    offers(readRawStream(spark, baseDir))

  /** S4 at the connector layer: render raw offer rows back into one HTML
    * snapshot file per lake leaf (clustered write + staged commit — see
    * [[graft.sources.v2.OffersWriteBuilder]]). Append-only by design;
    * the written lake reads back via [[readRaw]] with the same rows
    * (innerText-normalized text fields round-trip bit-exactly).
    */
  def writeRaw(raw: DataFrame, baseDir: String): Unit =
    raw.write.format("graft-offers").mode("append").save(baseDir)

  /** The S2 loop closed as a SINK: subscribe to one lake (or any raw
    * offer stream) and continuously publish snapshot files into another
    * — lake replication/continuous ETL with per-epoch exactly-once
    * publish ([[graft.sources.v2.OffersStreamingWrite]]: deterministic
    * epoch file names + commit markers survive replays and restarts).
    * Returns the started query; callers own trigger/termination.
    */
  def writeRawStream(raw: DataFrame, baseDir: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    raw.writeStream.format("graft-offers")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start(baseDir)

  /** Normalize raw fragments to (site, region, experience) + the
    * 6-column offer schema. Per-site quirks preserved: pracuj.pl cleans
    * text and normalizes zł→PLN via [[TextOps.parseSalary]]; justjoin.it
    * cleans the position only and keeps zł via [[TextOps.parseSalarySpans]].
    */
  def offers(raw: DataFrame): DataFrame = {
    val isPpl = col("site") === "pracujplit"
    val ppl = TextOps.parseSalary(col("salary_raw"))
    val jj = TextOps.parseSalarySpans(col("spans"))
    def pick(field: String) =
      when(isPpl, ppl.getField(field)).otherwise(jj.getField(field)).as(field)
    raw.select(
      col("site"), col("region"), col("experience"),
      when(isPpl, TextOps.cleanText(col("position_raw")))
        .otherwise(TextOps.cleanPosition(col("position_raw"))).as("position"),
      when(isPpl, TextOps.cleanText(col("company_raw")))
        .otherwise(col("company_raw")).as("company_name"),
      pick("minimum"), pick("maximum"), pick("currency"), pick("pay_period"))
  }

  /** Deterministic HTML snapshot lake derived from `part` (the q39
    * generator pattern, laid out as `site=/region=/experience=` leaves):
    * two pracuj.pl leaves split by p_partkey parity plus one
    * justjoin.it leaf over the same rows — the leaf a site filter must
    * prune without reading.
    */
  private[graft] def buildLake(s: SparkSession, d: String): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_offers_v2_${Integer.toHexString(d.hashCode)}").toString
    val part = Tables.part(s, d)
    val pplFrag =
      """concat('<div data-test="default-offer">',
        |  '<a data-test="link-offer-title">', p_name, '</a>',
        |  '<h3 data-test="text-company-name">C', p_partkey, '</h3>',
        |  '<span data-test="offer-salary">',
        |  CAST(floor(p_retailprice) AS BIGINT), ' zł / mies.</span>',
        |  '</div>')""".stripMargin.replaceAll("\n\\s*", "")
    val jjitFrag =
      """concat('<li data-index="', p_partkey, '">',
        |  '<h3>', p_name, '</h3>',
        |  '<h6><span>', CAST(floor(p_retailprice) AS BIGINT),
        |  '</span><span>PLN/month</span></h6>',
        |  '<a><div><p>C', p_partkey, '</p></div></a>',
        |  '</li>')""".stripMargin.replaceAll("\n\\s*", "")
    def write(df: DataFrame, frag: String, leaf: String): Unit =
      df.selectExpr(s"$frag AS value").coalesce(1)
        .write.mode("overwrite").text(s"$base/$leaf")
    write(part.filter(col("p_partkey") % 2 === 0), pplFrag,
      "site=pracujplit/region=waw/experience=senior")
    write(part.filter(col("p_partkey") % 2 =!= 0), pplFrag,
      "site=pracujplit/region=gd/experience=junior")
    write(part, jjitFrag, "site=justjoinit/region=waw/experience=junior")
    base
  }

  // q95 — the S3 mapping end-to-end: build the snapshot lake, read it
  // back through `format("graft-offers")` with an F1 site filter (the
  // justjoinit leaf is pruned at the DIRECTORY walk — PushedFilters in
  // the plan, PLANS.md row), normalize with the expression layer, and
  // verify against direct SQL over the generating columns. company_name
  // carries p_partkey so the result has a deterministic total order.
  val q95OffersSourceV2: QueryDef = QueryDef.sql(
    "q95_offers_source_v2",
    """WITH src AS (
      |  SELECT p_partkey, p_name, p_retailprice,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'waw' ELSE 'gd' END AS region,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'senior' ELSE 'junior' END AS experience
      |  FROM part)
      |SELECT 'pracujplit' AS site, region, experience,
      |       trim(regexp_replace(p_name, '\s+', ' ', 'g')) AS position,
      |       'C' || CAST(p_partkey AS VARCHAR) AS company_name,
      |       CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS minimum,
      |       CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS maximum,
      |       'PLN' AS currency, 'month' AS pay_period
      |FROM src
      |ORDER BY region, experience, company_name""".stripMargin) { (s, d) =>
    val base = buildLake(s, d)
    val raw = readRaw(s, base).filter(col("site") === "pracujplit")
    offers(raw).orderBy("region", "experience", "company_name")
  }

  // q137 — the COUNT(*) pushdown end-to-end: the same generated lake,
  // counted per (site, region, experience) leaf THROUGH the source's
  // aggregate pushdown — no offer row is materialized (the X8
  // reported-total read as a query op; PLANS.md shows
  // PushedAggregation on the scan). The oracle recomputes each leaf's
  // count from the generating part columns.
  val q137OffersCountPushdown: QueryDef = QueryDef.sql(
    "q137_offers_count_pushdown",
    """SELECT site, region, experience, cnt FROM (
      |  SELECT 'pracujplit' AS site,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'waw' ELSE 'gd' END AS region,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'senior' ELSE 'junior' END AS experience,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM part GROUP BY 1, 2, 3
      |  UNION ALL
      |  SELECT 'justjoinit', 'waw', 'junior', CAST(COUNT(*) AS BIGINT) FROM part)
      |ORDER BY site, region, experience""".stripMargin) { (s, d) =>
    val base = buildLake(s, d)
    readRaw(s, base)
      .groupBy("site", "region", "experience")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy("site", "region", "experience")
  }

  // q143 — the S4 DSv2 SINK end-to-end, under the oracle gate: derive
  // raw offer rows from `part` (both sites; jjit rows carry span lists,
  // ppl rows a salary fragment), WRITE them through
  // `format("graft-offers")` — inverse-parser HTML render, clustered
  // one-file-per-leaf, staged commit — then read the written lake back
  // through the same source and verify the round-trip against direct
  // SQL over the generating columns. Spans join to one string so every
  // output column hash-compares across engines. The sink dir is wiped
  // before each run (the lake is append-only; re-runs must not
  // accumulate), so Verify and Bench repetitions stay deterministic.
  //
  // Scale shape: one clustering exchange (the write's required
  // distribution), then embarrassingly parallel render; the read-back
  // is the q95 scan. Nothing here grows faster than the offer count.
  val q143OffersSink: QueryDef = QueryDef.sql(
    "q143_offers_sink",
    """WITH src AS (
      |  SELECT p_partkey, trim(regexp_replace(p_name, '\s+', ' ', 'g')) AS pos,
      |         'C' || CAST(p_partkey AS VARCHAR) AS comp,
      |         CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS sal,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'waw' ELSE 'gd' END AS region,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'senior' ELSE 'junior' END AS experience
      |  FROM part)
      |SELECT site, region, experience, position_raw, company_raw, salary_raw,
      |       spans_joined
      |FROM (
      |  SELECT 'pracujplit' AS site, region, experience, pos AS position_raw,
      |         comp AS company_raw, sal || ' zł / mies.' AS salary_raw,
      |         '' AS spans_joined
      |  FROM src
      |  UNION ALL
      |  SELECT 'justjoinit', 'waw', 'junior', pos, comp, '',
      |         sal || '|PLN/month'
      |  FROM src)
      |ORDER BY site, region, company_raw""".stripMargin) { (s, d) =>
    val sinkDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_offers_sink_${Integer.toHexString(d.hashCode)}").toString
    val fs = new org.apache.hadoop.fs.Path(sinkDir)
      .getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(sinkDir), true)
    val src = Tables.part(s, d).select(
      col("p_partkey"),
      trim(regexp_replace(col("p_name"), "\\s+", " ")).as("pos"),
      concat(lit("C"), col("p_partkey").cast("string")).as("comp"),
      floor(col("p_retailprice")).cast("long").cast("string").as("sal"),
      when(col("p_partkey") % 2 === 0, "waw").otherwise("gd").as("region"),
      when(col("p_partkey") % 2 === 0, "senior").otherwise("junior").as("experience"))
    val ppl = src.select(
      lit("pracujplit").as("site"), col("region"), col("experience"),
      col("pos").as("position_raw"), col("comp").as("company_raw"),
      concat(col("sal"), lit(" zł / mies.")).as("salary_raw"),
      lit(null).cast("array<string>").as("spans"))
    val jjit = src.select(
      lit("justjoinit").as("site"), lit("waw").as("region"),
      lit("junior").as("experience"),
      col("pos").as("position_raw"), col("comp").as("company_raw"),
      lit(null).cast("string").as("salary_raw"),
      array(col("sal"), lit("PLN/month")).as("spans"))
    writeRaw(ppl.unionAll(jjit), sinkDir)
    readRaw(s, sinkDir)
      .select(col("site"), col("region"), col("experience"),
        col("position_raw"), col("company_raw"),
        coalesce(col("salary_raw"), lit("")).as("salary_raw"),
        concat_ws("|", coalesce(col("spans"), array())).as("spans_joined"))
      .orderBy("site", "region", "company_raw")
  }

  // q236 — STORAGE-PARTITIONED JOIN through the connector [EXT, the
  // shuffle-elimination capability Iceberg/Delta bucketed tables sell]:
  // two lake GENERATIONS (yesterday/today snapshots of the same leaf
  // structure) are diffed per offer WITHOUT SHUFFLING EITHER SIDE — the
  // scans report their lake-leaf clustering (`option("spj", true)` →
  // `KeyGroupedPartitioning` over site/region/experience, every snapshot
  // file carrying its leaf key via `HasPartitionKey`), so the FULL OUTER
  // join on (leaf keys, company) plans as a key-grouped SortMergeJoin
  // with partition-local sorts and ZERO Exchange below it. At 100 TB
  // this is the difference between moving both lakes across the network
  // and joining leaf-against-leaf in place; the only rows that ever
  // shuffle are the leaf-grained aggregate partials (one per leaf per
  // task). The oracle recomputes the churn report (kept/added/removed
  // per leaf) from the generating membership predicates; q78 is the
  // same snapshot-diff semantics on parquet — this is its connector
  // form with the shuffle designed away. SpjSpec pins the plan shape
  // (no exchange under the join; the no-option negative control
  // shuffles) and result equality with the unpartitioned form.
  val q236Spj: QueryDef = QueryDef.sql(
    "q236_spj",
    """WITH src AS (SELECT p_partkey,
      |    CASE WHEN p_partkey % 4 < 2 THEN 'waw' ELSE 'gd' END AS region,
      |    CASE WHEN p_partkey % 2 = 0 THEN 'senior' ELSE 'junior' END AS experience,
      |    (p_partkey % 11 <> 3) AS in_y, (p_partkey % 7 <> 2) AS in_t
      |  FROM part),
      |offers AS (
      |  SELECT 'pracujplit' AS site, region, experience, in_y, in_t FROM src
      |  UNION ALL
      |  SELECT 'justjoinit', 'waw', 'junior', in_y, in_t FROM src)
      |SELECT site, region, experience,
      |  CAST(COUNT(*) FILTER (in_y AND in_t) AS BIGINT) AS n_kept,
      |  CAST(COUNT(*) FILTER (in_t AND NOT in_y) AS BIGINT) AS n_added,
      |  CAST(COUNT(*) FILTER (in_y AND NOT in_t) AS BIGINT) AS n_removed
      |FROM offers WHERE in_y OR in_t
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val dir = graft.engine.Staging.scratch("graft-offers-spj", "q236").getAbsolutePath
    writeRaw(spjGen(s, d, yesterday = true), s"$dir/yday")
    writeRaw(spjGen(s, d, yesterday = false), s"$dir/today")
    spjChurn(s, s"$dir/yday", s"$dir/today", spj = true)
  }

  /** One lake generation for q236: the q143 render pipeline with the
    * leaf axes DECORRELATED (region from `k%4`, experience from `k%2`)
    * so both sites together span five leaves, and a per-day membership
    * predicate so the two generations share leaf structure but differ
    * in offers (the churn the query measures).
    */
  private[graft] def spjGen(s: SparkSession, d: String,
      yesterday: Boolean): DataFrame = {
    val present =
      if (yesterday) col("p_partkey") % 11 =!= 3 else col("p_partkey") % 7 =!= 2
    val src = Tables.part(s, d).filter(present).select(
      trim(regexp_replace(col("p_name"), "\\s+", " ")).as("pos"),
      concat(lit("C"), col("p_partkey").cast("string")).as("comp"),
      floor(col("p_retailprice")).cast("long").cast("string").as("sal"),
      when(col("p_partkey") % 4 < 2, "waw").otherwise("gd").as("region"),
      when(col("p_partkey") % 2 === 0, "senior").otherwise("junior").as("experience"))
    val ppl = src.select(
      lit("pracujplit").as("site"), col("region"), col("experience"),
      col("pos").as("position_raw"), col("comp").as("company_raw"),
      concat(col("sal"), lit(" zł / mies.")).as("salary_raw"),
      lit(null).cast("array<string>").as("spans"))
    val jjit = src.select(
      lit("justjoinit").as("site"), lit("waw").as("region"),
      lit("junior").as("experience"),
      col("pos").as("position_raw"), col("comp").as("company_raw"),
      lit(null).cast("string").as("salary_raw"),
      array(col("sal"), lit("PLN/month")).as("spans"))
    ppl.unionAll(jjit)
  }

  /** The q236 churn report over two offer lakes; `spj` toggles the
    * storage-partitioned read so SpjSpec can pin plan + equality of
    * both forms.
    */
  private[graft] def spjChurn(s: SparkSession, ydayDir: String,
      todayDir: String, spj: Boolean): DataFrame = {
    val opts = if (spj) Map("spj" -> "true") else Map.empty[String, String]
    def side(dir: String, as: String) =
      readRaw(s, dir, opts)
        .select(col("site"), col("region"), col("experience"),
          col("company_raw").as(as))
    val y = side(ydayDir, "comp_y")
    val t = side(todayDir, "comp_t")
    y.join(t,
      y("site") === t("site") && y("region") === t("region") &&
        y("experience") === t("experience") && y("comp_y") === t("comp_t"),
      "full_outer")
      .select(
        coalesce(y("site"), t("site")).as("site"),
        coalesce(y("region"), t("region")).as("region"),
        coalesce(y("experience"), t("experience")).as("experience"),
        y("comp_y").isNotNull.as("in_y"), t("comp_t").isNotNull.as("in_t"))
      .groupBy("site", "region", "experience")
      .agg(count(when(col("in_y") && col("in_t"), 1)).as("n_kept"),
        count(when(!col("in_y"), 1)).as("n_added"),
        count(when(!col("in_t"), 1)).as("n_removed"))
      .orderBy("site", "region", "experience")
  }

  val all: Seq[QueryDef] = Seq(q95OffersSourceV2, q137OffersCountPushdown,
    q143OffersSink, q236Spj)
}
