package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Text-analysis operators [EXT, north star]: language ID, quality
  * scoring, token counting, document fingerprinting — each a linear pass
  * (tokenize → explode → aggregate), no self-joins, so they scale as
  * embarrassingly parallel map + one keyed aggregation.
  *
  * Score formulas are pure +/×/÷ over integers-turned-doubles —
  * deliberately no transcendentals, whose libm implementations differ
  * across engines and would break bit-level verification.
  */
object TextAnalysis {

  /** Evidence word lists per language for the n-gram-style heuristic
    * classifier (drawn from the testdata vocabulary so the scorer has
    * signal to work with).
    */
  private val langEvidence: Seq[(String, String)] = Seq(
    "de" -> "der", "de" -> "die", "de" -> "und",
    "en" -> "the", "en" -> "a", "en" -> "of",
    "es" -> "data", "es" -> "query",
    "fr" -> "join", "fr" -> "merge")

  private val langEvidenceSql: String =
    langEvidence.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  private def tokensOf(s: SparkSession, d: String): DataFrame =
    Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")

  // q27 — heuristic language ID: count evidence-word hits per candidate
  // language, argmax with a deterministic tie-break, 'und' when nothing
  // matches. The evidence table is broadcast; the scan stays linear.
  val q27LangId: QueryDef = QueryDef.sql(
    "q27_lang_id",
    s"""WITH ev(lang, word) AS (VALUES $langEvidenceSql),
       |toks AS (SELECT doc_id, tok
       |         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |         WHERE tok <> ''),
       |scores AS (SELECT doc_id, ev.lang, COUNT(*) AS hits
       |           FROM toks JOIN ev ON toks.tok = ev.word GROUP BY 1, 2),
       |best AS (SELECT doc_id, lang AS pred_lang FROM (
       |           SELECT doc_id, lang,
       |                  row_number() OVER (PARTITION BY doc_id
       |                    ORDER BY hits DESC, lang) AS rn
       |           FROM scores) WHERE rn = 1)
       |SELECT d.doc_id, d.lang, COALESCE(b.pred_lang, 'und') AS pred_lang
       |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = langEvidence.toDF("lang", "word")
    val scores = tokensOf(s, d)
      .join(broadcast(ev), col("tok") === col("word"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy("doc_id").orderBy(col("hits").desc, col("lang"))
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"))
      .orderBy("doc_id")
  }

  // q28 — quality scoring: token count, mean token length, stopword ratio,
  // combined into a bounded 0..1-ish score with pure arithmetic.
  val q28QualityScore: QueryDef = QueryDef.sql(
    "q28_quality_score",
    """WITH toks AS (SELECT doc_id, tok
      |              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |              WHERE tok <> ''),
      |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |               SUM(length(tok)) AS sum_len,
      |               SUM(CASE WHEN tok IN ('the', 'a', 'of') THEN 1 ELSE 0 END) AS stop_hits
      |        FROM toks GROUP BY 1)
      |SELECT doc_id,
      |       CAST(n_tokens AS BIGINT) AS n_tokens,
      |       CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len,
      |       CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
      |       0.5 * (CAST(stop_hits AS DOUBLE) / n_tokens)
      |         + 0.3 * (CAST(sum_len AS DOUBLE) / n_tokens) / 10
      |         + 0.2 * CAST(CASE WHEN n_tokens < 100 THEN n_tokens ELSE 100 END AS DOUBLE) / 100.0 AS quality_score
      |FROM agg
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val agg = tokensOf(s, d)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).as("sum_len"),
        sum(when(col("tok").isin("the", "a", "of"), 1).otherwise(0)).as("stop_hits"))
    val avgLen = col("sum_len").cast(DoubleType) / col("n_tokens")
    val stopRatio = col("stop_hits").cast(DoubleType) / col("n_tokens")
    val capped = when(col("n_tokens") < 100, col("n_tokens")).otherwise(lit(100))
    agg.select(
      col("doc_id"),
      col("n_tokens"),
      avgLen.as("avg_token_len"),
      stopRatio.as("stop_ratio"),
      (lit(0.5) * stopRatio + lit(0.3) * avgLen / 10 + lit(0.2) * capped / 100.0)
        .as("quality_score"))
      .orderBy("doc_id")
  }

  // q29 — token counting three ways: whitespace tokens, regex tokens
  // (word runs or single non-space symbols — a BPE-ish pre-tokenizer),
  // and the bytes/4 heuristic LLM pipelines use for budget estimates.
  val q29TokenCount: QueryDef = QueryDef.sql(
    "q29_token_count",
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER) AS re_tokens,
      |  CAST((length(text) + 3) // 4 AS INTEGER) AS approx_bpe
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))).as("re_tokens"),
        ((length(col("text")) + 3) / 4).cast(IntegerType).as("approx_bpe"))
      .orderBy("doc_id")
  }

  // q30 — document fingerprint: a position-weighted rolling hash over the
  // token stream (order-sensitive, unlike the set sketches in Dedup), all
  // in exact integer arithmetic mod a 31-bit prime.
  val q30Fingerprint: QueryDef = QueryDef.sql(
    "q30_fingerprint",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |u AS (SELECT doc_id, i AS pos, toks[i] AS tok
      |      FROM t, generate_series(1, 4000) g(i) WHERE i <= len(toks) AND toks[i] <> '')
      |SELECT doc_id,
      |       CAST(SUM(((1000003 * (${Dedup.md5IdSql("tok")}) + 12345) % 2147483647) * pos) % 2147483647 AS BIGINT) AS fingerprint
      |FROM u
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val positioned = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .filter(col("tok") =!= "" && col("pos0") < 4000) // match oracle's series bound
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
    positioned
      .select(col("doc_id"),
        (((lit(1000003L) * Dedup.md5Id(col("tok")) + 12345L) % 2147483647L) * col("pos")).as("term"))
      .groupBy("doc_id")
      .agg((sum("term") % 2147483647L).as("fingerprint"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q27LangId, q28QualityScore, q29TokenCount, q30Fingerprint)
}
