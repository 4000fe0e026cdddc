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

  // q130 — DUAL-GATE agreement report: the heuristic quality score
  // (q28, thresholded at 0.28 ≈ the corpus median) vs the hashed-model
  // classifier (q123, keep = score > 0), cross-tabulated per source.
  // Before a pipeline swaps one quality gate for another (or runs both
  // and ANDs/ORs them), this is the question to answer: where do they
  // agree, and which sources do they disagree on? A gate swap that
  // silently flips 30% of one source's verdicts changes the mix (q87/
  // q109) in a way aggregate keep-rates never show.
  //
  // Scale shape: BOTH gates evaluate in ONE zero-shuffle projection
  // over one scan (each is a per-row HOF reduction of the same token
  // array — computing them together is free); the cross-tab is a
  // |sources|-bounded agg. The formulas replicate q28/q123 double-op
  // for double-op, so thresholded flags agree bit-for-bit with the
  // standalone gates (pinned by the spec's join-based recompute).
  val q130GateAgreement: QueryDef = QueryDef.sql(
    "q130_gate_agreement",
    """WITH toks AS (SELECT doc_id, tok
      |              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |              WHERE tok <> ''),
      |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |               SUM(length(tok)) AS sum_len,
      |               SUM(CASE WHEN tok IN ('the', 'a', 'of') THEN 1 ELSE 0 END) AS stop_hits,
      |               CAST(SUM((CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 1024)
      |                        * 2654435761 % 2048 - 1024) AS BIGINT) AS score_raw
      |        FROM toks GROUP BY 1),
      |g AS (SELECT doc_id,
      |             0.5 * (CAST(stop_hits AS DOUBLE) / n_tokens)
      |               + 0.3 * (CAST(sum_len AS DOUBLE) / n_tokens) / 10
      |               + 0.2 * CAST(CASE WHEN n_tokens < 100 THEN n_tokens ELSE 100 END AS DOUBLE) / 100.0
      |               >= 0.28 AS keep_h,
      |             CAST(score_raw AS DOUBLE) / (1024.0 * n_tokens) > 0 AS keep_c
      |      FROM agg),
      |j AS (SELECT d.source, g.keep_h, g.keep_c
      |      FROM documents d JOIN g ON d.doc_id = g.doc_id),
      |cm AS (SELECT source,
      |       CAST(SUM(CASE WHEN keep_h AND keep_c THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |       CAST(SUM(CASE WHEN keep_h AND NOT keep_c THEN 1 ELSE 0 END) AS BIGINT) AS n_h_only,
      |       CAST(SUM(CASE WHEN NOT keep_h AND keep_c THEN 1 ELSE 0 END) AS BIGINT) AS n_c_only,
      |       CAST(SUM(CASE WHEN NOT keep_h AND NOT keep_c THEN 1 ELSE 0 END) AS BIGINT) AS n_neither,
      |       COUNT(*) AS n_docs
      |       FROM j GROUP BY 1)
      |SELECT source, n_both, n_h_only, n_c_only, n_neither, n_docs,
      |       CAST(n_both + n_neither AS DOUBLE) / CAST(n_docs AS DOUBLE) AS agree_rate
      |FROM cm
      |ORDER BY source""".stripMargin) { (s, d) =>
    val toks = filter(split(col("text"), " "), x => x =!= "")
    def weight(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (graft.operators.Corpus.md5Bucket(t, 1024) * lit(2654435761L)) % 2048 - 1024
    val perDoc = Tables.widen(Tables.documents(s, d))
      .select(col("source"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(
        col("source"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x)).as("sum_len"),
        size(filter(col("toks"), x => x.isin("the", "a", "of")))
          .cast(LongType).as("stop_hits"),
        aggregate(transform(col("toks"), weight(_)), lit(0L), _ + _).as("score_raw"))
    val avgLen = col("sum_len").cast(DoubleType) / col("n_tokens")
    val stopRatio = col("stop_hits").cast(DoubleType) / col("n_tokens")
    val capped = when(col("n_tokens") < 100, col("n_tokens")).otherwise(lit(100))
    val flags = perDoc.select(
      col("source"),
      (lit(0.5) * stopRatio + lit(0.3) * avgLen / 10 + lit(0.2) * capped / 100.0 >= 0.28)
        .as("keep_h"),
      (col("score_raw").cast(DoubleType) / (lit(1024.0) * col("n_tokens")) > 0)
        .as("keep_c"))
    def n(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(p, 1L).otherwise(0L))
    flags.groupBy("source")
      .agg(
        n(col("keep_h") && col("keep_c")).as("n_both"),
        n(col("keep_h") && !col("keep_c")).as("n_h_only"),
        n(!col("keep_h") && col("keep_c")).as("n_c_only"),
        n(!col("keep_h") && !col("keep_c")).as("n_neither"),
        count(lit(1)).as("n_docs"))
      .withColumn("agree_rate",
        (col("n_both") + col("n_neither")).cast(DoubleType) /
          col("n_docs").cast(DoubleType))
      .orderBy("source")
  }

  // q243 — the try_ FAMILY on dirty ingest (ANSI-mode data cleaning:
  // Spark 4 runs ANSI by default, where a plain CAST/division/overflow
  // THROWS mid-job — try_cast/try_divide/try_multiply are the per-row
  // quarantine that keeps a 100 TB ingest running while COUNTING its
  // rejects, which is exactly what this report emits per dirt class).
  // The generator mixes the string classes both engines parse
  // identically: padded ints (both trim), garbage, empty, BIGINT
  // overflow, signed. Two classes are deliberately ABSENT because the
  // engines disagree — DuckDB TRY_CAST ROUNDS '12.5' to 13 and accepts
  // '1e3' where Spark's try_cast nulls both (probed; the cross-engine
  // trap this query documents). try_divide's ÷0→NULL and
  // try_multiply's overflow→NULL are replayed by the oracle with
  // NULLIF/CASE guards — DuckDB has no try_ arithmetic, it just errors.
  val q243TryCast: QueryDef = QueryDef.sql(
    "q243_try_cast",
    """WITH src AS (SELECT p_partkey AS p,
      |    CASE p_partkey % 5
      |      WHEN 0 THEN CAST(p_partkey AS VARCHAR)
      |      WHEN 1 THEN '  ' || CAST(p_partkey AS VARCHAR) || '  '
      |      WHEN 2 THEN 'N/A'
      |      WHEN 3 THEN ''
      |      ELSE '-' || CAST(p_partkey AS VARCHAR) END AS raw
      |  FROM part),
      |t AS (SELECT p, p % 5 AS dirt_class, TRY_CAST(raw AS BIGINT) AS parsed,
      |             p % 4 AS qty FROM src)
      |SELECT dirt_class, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
      |  CAST(COALESCE(SUM(parsed), 0) AS BIGINT) AS sum_parsed,
      |  CAST(COUNT(*) FILTER (parsed IS NOT NULL
      |       AND parsed // NULLIF(qty, 0) IS NULL) AS BIGINT) AS n_div_null,
      |  CAST(COUNT(*) FILTER (parsed IS NOT NULL AND abs(parsed) > 1) AS BIGINT)
      |    AS n_mul_null
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(
      """WITH src AS (SELECT p_partkey AS p,
        |    CASE p_partkey % 5
        |      WHEN 0 THEN CAST(p_partkey AS STRING)
        |      WHEN 1 THEN '  ' || CAST(p_partkey AS STRING) || '  '
        |      WHEN 2 THEN 'N/A'
        |      WHEN 3 THEN ''
        |      ELSE '-' || CAST(p_partkey AS STRING) END AS raw
        |  FROM part),
        |t AS (SELECT p, p % 5 AS dirt_class, try_cast(raw AS BIGINT) AS parsed,
        |             p % 4 AS qty FROM src)
        |SELECT dirt_class, COUNT(*) AS n,
        |  COUNT(parsed) AS n_parsed,
        |  COALESCE(SUM(parsed), 0L) AS sum_parsed,
        |  COUNT(CASE WHEN parsed IS NOT NULL
        |             AND try_divide(parsed, qty) IS NULL THEN 1 END) AS n_div_null,
        |  COUNT(CASE WHEN parsed IS NOT NULL AND
        |             try_multiply(parsed, 9223372036854775807L) IS NULL THEN 1 END)
        |    AS n_mul_null
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  // q249 — COLUMN-LEVEL ENCRYPTION AT REST (aes_encrypt/aes_decrypt —
  // the governance layer between q199's scrubbing, which destroys the
  // value, and plaintext storage, which leaks it: the sensitive column
  // lands on disk as AES-GCM ciphertext and only a keyed read recovers
  // it): the gate encrypts `p_name`, WRITES the encrypted frame to
  // parquet (at-rest state), reads it back, decrypts, and hash-verifies
  // the decrypted values against the RAW table via the md5Id checksum —
  // a single flipped byte in encrypt/serialize/deserialize/decrypt
  // cannot hash-match. GCM's random IV makes ciphertext
  // NON-deterministic (semantic security — equal names don't leak
  // equality; PiiSpec pins that, plus ECB's deterministic mode for
  // join-able pseudonyms and try_aes_decrypt's NULL on a wrong key, the
  // key-rotation signal). Scale: encrypt/decrypt are codegen'd
  // per-row kernels — partition-local, zero shuffle beyond the report.
  val q249Aes: QueryDef = QueryDef.sql(
    "q249_aes",
    s"""SELECT p_brand, COUNT(*) AS n,
       |  CAST(SUM(${graft.operators.Dedup.md5IdSql("p_name")}) AS BIGINT)
       |    AS name_checksum,
       |  CAST(SUM(len(p_name)) AS BIGINT) AS n_chars
       |FROM part GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val dir = graft.engine.Staging.scratch("graft-layout-gate", "q249_aes")
      .getAbsolutePath
    val key = "0123456789abcdef"
    Tables.part(s, d)
      .select(col("p_brand"),
        expr(s"aes_encrypt(p_name, '$key')").as("name_enc"))
      .write.mode("overwrite").parquet(s"$dir/at_rest")
    s.read.parquet(s"$dir/at_rest")
      .select(col("p_brand"),
        expr(s"CAST(aes_decrypt(name_enc, '$key') AS STRING)").as("p_name"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Dedup.md5Id(col("p_name"))).as("name_checksum"),
        sum(length(col("p_name"))).cast("long").as("n_chars"))
      .orderBy("p_brand")
  }

  val all: Seq[QueryDef] =
    Seq(q104QualityAudit, q130GateAgreement, q243TryCast, q249Aes)
}
