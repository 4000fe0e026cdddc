package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Deduplication operator family [EXT, north star]: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — the core of any LLM-training-data
  * pipeline, re-expressed as shuffle-friendly relational plans.
  *
  * Determinism note: candidate generation needs integer shingle/token ids.
  * They come from [[md5Id]] — a cross-engine-deterministic hash both Spark
  * and DuckDB compute identically — so there is NO vocabulary dictionary,
  * no dictionary join, and no global sort anywhere in the plan. Hash ids
  * scale to 100 TB unchanged: the only shuffles left are the keyed
  * aggregations and the LSH bucket self-join.
  */
object Dedup {

  /** Deterministic 31-bit token id: first 15 hex chars of md5 as an
    * integer, reduced mod the Mersenne prime 2^31-1 so j-weighted products
    * downstream stay in 64-bit range in both engines.
    * DuckDB twin: `CAST('0x' || substr(md5(x),1,15) AS BIGINT) % 2147483647`.
    */
  private[operators] def md5Id(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long") % 2147483647L

  private[operators] def md5IdSql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT) % 2147483647"

  /** Word 3-gram shingles over an already-materialized token ARRAY COLUMN
    * (array<string>; empty when < 3 tokens). The tokens must be a bound
    * column, not an inline `split(...)`: an expression inlined into the
    * lambda re-evaluates per element (no common-subexpression elimination
    * inside higher-order lambdas), turning shingling O(len²) per document.
    */
  private def shinglesOf(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Distinct (doc_id, shingle) pairs over an arbitrary (doc_id, text)
    * frame — lets the sampled eval (q266) push its stratum filter BELOW
    * the shingle explosion.
    */
  private def docShinglesOf(docs: DataFrame): DataFrame =
    docs
      // cap at the same 4002-token bound the DuckDB oracle's constant
      // generate_series uses, so both sides see identical shingle sets
      // even if documents ever exceed it
      .select(col("doc_id"), slice(split(col("text"), " "), 1, 4002).as("toks"))
      .select(col("doc_id"), explode(shinglesOf(col("toks"))).as("s"))
      .distinct()

  private def docShingles(s: SparkSession, d: String): DataFrame =
    docShinglesOf(Tables.widen(Tables.documents(s, d)))

  /** DuckDB twin of [[docShinglesOf]]: constant-bounded generate_series
    * with a length filter (DuckDB 1.0 has no lateral column refs);
    * `src` is the (doc_id, text) relation to shingle.
    */
  private def shinglesSqlFrom(src: String): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src),
       |sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
       |       FROM t, generate_series(1, 4000) g(i) WHERE i <= len(toks) - 2)""".stripMargin

  private val shinglesSql = shinglesSqlFrom("documents")

  // q21 — exact dedup by content: hash-groupBy on the full text, first-seen
  // (min doc_id) wins, with an md5 content fingerprint. At scale the
  // groupBy key becomes the md5/xxhash of the text (shuffle 16 bytes, not
  // documents), with an equality re-check inside each tiny hash bucket.
  val q21ExactDedup: QueryDef = QueryDef.sql(
    "q21_exact_dedup",
    """SELECT MIN(doc_id) AS doc_id, md5(text) AS text_hash, COUNT(*) AS n_dups
      |FROM documents
      |GROUP BY text
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("text_hash"), col("n_dups"))
      .orderBy("doc_id")
  }

  // NOTE (round-17 negative result, kept so it is not re-tried): pinning
  // the (band, sig) bucket aggregation's parallelism with a same-key
  // repartition — the fix that wins 2× on exactJaccardPairsOf's postings
  // — was A/B-measured across the LSH family and REJECTED: the bucket
  // stages are not AQE-coalescing-bottlenecked here, and the explicit
  // wide exchange both defeats the map-side partial collect_list and
  // adds task overhead (same-session A/B: q22 1.0→1.4 s, q228 3.6→4.8 s,
  // q266 2.7→3.2 s WITH the spread).

  /** All ordered in-bucket pairs (a < b) from a sorted id ARRAY COLUMN:
    * posexplode picks `a` at 0-based position i, slice(ids, i+2, n) yields
    * every id after it. Candidate generation stays inside the bucket's
    * reducer — no self-join, so the (expensive) upstream subtree is
    * computed once instead of twice, and nothing but bucket contents ever
    * meets. Buckets are small by construction (LSH bands / shared-shingle
    * postings), so the in-reducer quadratic is bounded.
    */
  private[operators] def bucketPairs(df: DataFrame, ids: String,
      aName: String, bName: String): DataFrame =
    df.select(posexplode(col(ids)).as(Seq("i", aName)), col(ids))
      .select(col(aName),
        explode(slice(col(ids), col("i") + 2, size(col(ids)))).as(bName))

  // q22 — MinHash + LSH banding: shingle → 16 permutation-style hashes →
  // min per hash → 4 bands of 4 → candidate pairs share ≥1 band signature.
  // Shape chosen for 100 TB: the 16 minima are 16 parallel min() aggregates
  // over the shingle scan (ONE pass, map-side partials, no 16× row
  // explosion), and candidates are generated inside each (band, sig)
  // bucket's reducer (no self-join — the shingle subtree is not recomputed
  // and non-colliding docs never meet).
  /** (doc_id, band, sig) MinHash band signatures — q22's candidate layer,
    * shared with the clustering operator (q56). The whole signature is
    * ONE native-expression projection per document
    * ([[graft.functions.Sketches.minhash16]]) — zero shuffles until the
    * (band, sig) bucket aggregation, which is the only data movement LSH
    * needs. Docs with < 3 tokens have no shingles and are dropped (the
    * expression returns null), matching the relational/oracle form where
    * such docs simply produce no shingle rows.
    */
  private[operators] def lshSigs(s: SparkSession, d: String): DataFrame =
    lshSigsOf(Tables.widen(Tables.documents(s, d)))

  /** [[lshSigs]] over an arbitrary (doc_id, text) frame — lets callers
    * push a document filter BELOW the sketch projection (only the rows
    * that survive get minhashed), which is what the incremental index
    * probe (q106) needs: sketch the new batch, never the corpus.
    */
  private[operators] def lshSigsOf(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val carried = col("doc_id") +: keep.map(col)
    val mh = docs
      .select(carried :+
        graft.functions.GraftFunctions.minhash16(
          slice(split(col("text"), " "), 1, 4002)).as("mh"): _*)
      .filter(col("mh").isNotNull)
    mh.select(carried :+ explode(array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until 4).map(i =>
          element_at(col("mh"), 4 * b + i + 1).cast("string")): _*).as("sig"))
    }: _*)).as("bs"): _*)
      .select(carried :+ col("bs.band").as("band") :+ col("bs.sig").as("sig"): _*)
  }

  /** The shared DuckDB CTE chain producing the same (doc_id, band, sig),
    * parametrized by the (doc_id, text) source relation.
    */
  private def lshSigsSqlFrom(src: String): String =
    s"""${shinglesSqlFrom(src)},
       |wi AS (SELECT doc_id, ${md5IdSql("s")} AS sid FROM sh),
       |hashed AS (SELECT doc_id, j, ((j*2+1)*sid + (j*j+7)) % 2147483647 AS h
       |           FROM wi, generate_series(0, 15) g(j)),
       |mins AS (SELECT doc_id, j, MIN(h) AS mh FROM hashed GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, j // 4 AS band,
       |                string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
       |         FROM mins GROUP BY 1, 2)""".stripMargin

  /** The shared DuckDB CTE chain producing the same (doc_id, band, sig). */
  private[operators] val lshSigsSql: String = lshSigsSqlFrom("documents")

  val q22MinhashLsh: QueryDef = QueryDef.sql(
    "q22_minhash_lsh",
    s"""WITH $shinglesSql,
       |wi AS (SELECT doc_id, ${md5IdSql("s")} AS sid FROM sh),
       |hashed AS (SELECT doc_id, j, ((j*2+1)*sid + (j*j+7)) % 2147483647 AS h
       |           FROM wi, generate_series(0, 15) g(j)),
       |mins AS (SELECT doc_id, j, MIN(h) AS mh FROM hashed GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, j // 4 AS band,
       |                string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
       |         FROM mins GROUP BY 1, 2)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
       |FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val buckets = lshSigs(s, d).groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    bucketPairs(buckets, "ids", "doc_a", "doc_b")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }

  // q23 — SimHash: each distinct token votes ±1 per bit position (weighted
  // by its hash bits); the 16-bit signature is the sign vector. One
  // explode + two hash aggregates — fully linear, no self-join, the
  // cheapest near-dup sketch at scale.
  val q23Simhash: QueryDef = QueryDef.sql(
    "q23_simhash",
    s"""WITH t AS (SELECT DISTINCT doc_id, tok
      |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |           WHERE tok <> ''),
      |h AS (SELECT doc_id, (1000003 * (${md5IdSql("tok")}) + 12345) % 2147483647 AS h
      |      FROM t),
      |bits AS (SELECT doc_id, j, SUM(2 * ((h // CAST(pow(2, j) AS BIGINT)) % 2) - 1) AS c
      |         FROM h, generate_series(0, 15) g(j) GROUP BY 1, 2)
      |SELECT doc_id,
      |       CAST(SUM(CASE WHEN c > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // The whole sketch is one native-expression projection per document
    // (graft.functions.Sketches.simhash16, which dedupes tokens
    // internally — distinct is load-bearing for vote counts): no explode,
    // no shuffle at all before the final presentation sort. The trim
    // filter mirrors the relational form dropping docs with zero
    // non-empty tokens (no group ⇒ no row).
    Tables.widen(Tables.documents(s, d))
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash16(split(col("text"), " ")).as("simhash"))
      .orderBy("doc_id")
  }

  // q24 — n-gram Jaccard via an inverted index: each shingle's posting
  // list (the docs containing it) is one reducer group; intersection
  // counts come from counting in-posting pairs, union from the per-doc set
  // sizes. No self-join — the shingle subtree is computed once and pairs
  // meet only on shared shingles (never a cross join). Bounded to doc_id <
  // 1000 here; at scale the same plan runs inside LSH buckets (q22's
  // output) instead of an id cap.
  val q24NgramJaccard: QueryDef = QueryDef.sql(
    "q24_ngram_jaccard",
    s"""WITH $shinglesSql,
       |shb AS (SELECT doc_id, s FROM sh WHERE doc_id < 1000),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shb GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM shb a JOIN shb b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, i AS n_common,
       |       sa.n + sb.n - i AS n_union,
       |       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val sh = docShingles(s, d).filter(col("doc_id") < 1000)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val postings = sh.groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val inter = bucketPairs(postings, "ids", "doc_a", "doc_b")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    val jac = col("i").cast("double") / (col("na") + col("nb") - col("i"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(jac >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("i").as("n_common"),
        (col("na") + col("nb") - col("i")).as("n_union"), jac.as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // q115 — shingle CONTAINMENT [EXT]: the asymmetric near-dup measure.
  // Jaccard (q24) misses the quote/embedding case — a short document
  // wholly contained in a long one scores low union-overlap but
  // containment |A∩B|/|A| ≈ 1. Exactly the pair a curation pipeline
  // wants flagged: boilerplate-wrapped copies, quoted articles, doc
  // fragments. Same inverted-index plan as q24 (posting lists, in-bucket
  // pairs, no self-join), two extra divisions at the end; emitted when
  // EITHER direction's containment ≥ 0.8, with the direction explicit.
  val q115Containment: QueryDef = QueryDef.sql(
    "q115_containment",
    s"""WITH $shinglesSql,
       |shb AS (SELECT doc_id, s FROM sh WHERE doc_id < 1000),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shb GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM shb a JOIN shb b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, i AS n_common,
       |       CAST(i AS DOUBLE) / sa.n AS contain_a,
       |       CAST(i AS DOUBLE) / sb.n AS contain_b
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / sa.n >= 0.8 OR CAST(i AS DOUBLE) / sb.n >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val sh = docShingles(s, d).filter(col("doc_id") < 1000)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val postings = sh.groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val inter = bucketPairs(postings, "ids", "doc_a", "doc_b")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    val ca = col("i").cast("double") / col("na")
    val cb = col("i").cast("double") / col("nb")
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(ca >= 0.8 || cb >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("i").as("n_common"),
        ca.as("contain_a"), cb.as("contain_b"))
      .orderBy("doc_a", "doc_b")
  }

  // q126 — cross-SOURCE duplication overlap matrix: aggregate q22's
  // near-dup pairs up to the (source, source) level — the recipe-level
  // view a curation team actually acts on ("these two crawls/dumps are
  // 30% the same corpus; drop one, or dedup before mixing"). Diagonal
  // entries (source_a = source_b) measure within-source redundancy;
  // off-diagonal entries direct which source PAIRS need cross-dedup
  // before q87/q109's mixing runs treat them as independent.
  //
  // Scale shape: each doc's source rides INTO the (band, sig) bucket
  // alongside its id, so pair labeling needs NO join-back against the
  // corpus (two corpus-sized keyed joins saved); pairs generate
  // in-reducer as in q22, dedup to one row per doc pair is a keyed
  // distinct on the (small) pair table, and the matrix itself is a
  // |sources|² aggregate — tiny at any corpus size.
  val q126SourceOverlap: QueryDef = QueryDef.sql(
    "q126_source_overlap",
    s"""WITH $lshSigsSql,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sigs a
       |  JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |lab AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |         greatest(da.source, db.source) AS source_b
       |  FROM cand
       |  JOIN documents da ON da.doc_id = cand.doc_a
       |  JOIN documents db ON db.doc_id = cand.doc_b)
       |SELECT source_a, source_b, COUNT(*) AS n_pairs
       |FROM lab GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val sigs = lshSigsOf(Tables.widen(Tables.documents(s, d)), keep = Seq("source"))
    val buckets = sigs.groupBy("band", "sig")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("source")))).as("m"))
      .filter(size(col("m")) >= 2)
    bucketPairs(buckets, "m", "a", "b")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.source").as("sa"), col("b.source").as("sb"))
      .distinct() // a pair colliding in several bands counts once
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** Canonical URL form (q206's kernel, exposed for reuse and for the
    * spec's adversarial literals): lowercase scheme+authority, strip
    * :80/:443 and www., drop the fragment, collapse '//'+ in the path,
    * strip the non-root trailing slash, drop utm_- and fbclid-params, sort
    * the survivors. One row-local expression tree — codegen'd, no UDF.
    */
  def canonicalUrl(url: Column): Column = {
    val head0 = lower(regexp_extract(url, "^([a-zA-Z]+://[^/?#]*)", 1))
    val rest = regexp_replace(
      regexp_replace(url, "^[a-zA-Z]+://[^/?#]*", ""), "#.*$", "")
    val head = regexp_replace(regexp_replace(head0, ":(80|443)$", ""),
      "^([a-z]+://)www\\.", "$1")
    val path = regexp_replace(
      regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "//+", "/"),
      "(.)/$", "$1")
    val qs = regexp_extract(rest, "\\?(.*)$", 1)
    val keep = filter(split(qs, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid)="))
    concat(head, path,
      when(size(keep) > 0, concat(lit("?"), concat_ws("&", array_sort(keep))))
        .otherwise(""))
  }

  // q206 — URL CANONICALIZATION dedup (the CommonCrawl-family web-corpus
  // front door: the same page arrives under scheme/host case variants,
  // default ports, www. aliases, tracking parameters, permuted query
  // strings, duplicate-slash paths, trailing slashes, and fragments —
  // canonicalize FIRST or every downstream text-dedup pass re-discovers
  // the same near-identical page family the URL already names).
  // Canonical form, applied in fixed order: lowercase scheme+authority;
  // strip :80/:443; strip www.; drop #fragment; collapse '//'+ in the
  // path; strip the trailing slash (non-root); drop utm_*/fbclid
  // tracking params; sort surviving params. Messy URLs are synthesized
  // deterministically from doc_id (the q199 construction pattern —
  // testdata carries no URL column by design); the operator itself works
  // purely from the url string.
  //
  // Scale shape: canonicalization is ONE row-local codegen'd
  // regex/HOF projection (embarrassingly parallel); the dedup is ONE
  // canonical-url-keyed agg. Nothing else moves.
  val q206UrlCanon: QueryDef = QueryDef.sql(
    "q206_url_canon",
    """WITH raw AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) ||
      |    '://' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |    'Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' ||
      |    (CASE WHEN doc_id % 5 = 0
      |          THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
      |          ELSE '' END) ||
      |    (CASE WHEN doc_id % 4 = 0
      |          THEN '/p//' || CAST(doc_id % 50 AS VARCHAR) || '/'
      |          ELSE '/p/' || CAST(doc_id % 50 AS VARCHAR) END) ||
      |    (CASE WHEN doc_id % 6 < 3 THEN '?b=2&utm_source=feed&a=1'
      |          ELSE '?a=1&b=2' END) ||
      |    (CASE WHEN doc_id % 8 = 0 THEN '#sec' ELSE '' END) AS url
      |  FROM documents),
      |c1 AS (SELECT doc_id, url,
      |         lower(regexp_extract(url, '^([a-zA-Z]+://[^/?#]*)', 1)) AS head0,
      |         regexp_replace(regexp_replace(url, '^[a-zA-Z]+://[^/?#]*', ''),
      |                        '#.*$', '') AS rest
      |       FROM raw),
      |c2 AS (SELECT doc_id,
      |         regexp_replace(regexp_replace(head0, ':(80|443)$', ''),
      |                        '^([a-z]+://)www\.', '\1') AS head,
      |         regexp_replace(
      |           regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '//+', '/'),
      |           '(.)/$', '\1') AS path,
      |         regexp_extract(rest, '\?(.*)$', 1) AS qs
      |       FROM c1),
      |c3 AS (SELECT doc_id,
      |         head || path ||
      |         CASE WHEN len(keep) > 0
      |              THEN '?' || array_to_string(list_sort(keep), '&')
      |              ELSE '' END AS url_canon
      |       FROM (SELECT doc_id, head, path,
      |               list_filter(string_split(qs, '&'),
      |                 p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid)='))
      |                 AS keep
      |             FROM c2))
      |SELECT url_canon, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      |FROM c3 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val raw = Tables.documents(s, d).select(col("doc_id"),
      concat(
        when(col("doc_id") % 2 === 0, "HTTP").otherwise("https"),
        lit("://"),
        when(col("doc_id") % 3 === 0, "WWW.").otherwise(""),
        lit("Site"), (col("doc_id") % 7).cast("string"), lit(".Example.COM"),
        when(col("doc_id") % 5 === 0,
          when(col("doc_id") % 2 === 0, ":80").otherwise(":443")).otherwise(""),
        when(col("doc_id") % 4 === 0,
          concat(lit("/p//"), (col("doc_id") % 50).cast("string"), lit("/")))
          .otherwise(concat(lit("/p/"), (col("doc_id") % 50).cast("string"))),
        when(col("doc_id") % 6 < 3, "?b=2&utm_source=feed&a=1")
          .otherwise("?a=1&b=2"),
        when(col("doc_id") % 8 === 0, "#sec").otherwise("")).as("url"))
    val c3 = raw.select(col("doc_id"), canonicalUrl(col("url")).as("url_canon"))
    c3.groupBy("url_canon")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .orderBy("url_canon")
  }

  /** Shared oracle CTEs of the exact-pair machinery (q216/q228):
    * `sizes` + `inter` over the uncapped shingle postings.
    */
  private val prefixJoinOracleCte: String =
    s"""$shinglesSql,
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)""".stripMargin

  // q216 — EXACT similarity join via PREFIX FILTERING (Chaudhuri/
  // Bayardo's AllPairs-PPJoin family — the LOSSLESS scale path for
  // "every pair with Jaccard ≥ τ", contrasting q22's probabilistic LSH
  // and completing the Jaccard pair: q24 is the exact inverted-index
  // kernel BOUNDED by an id cap; this removes the cap). The trick:
  // order every doc's shingles by a GLOBAL total order (corpus
  // frequency, rarest first — ties by the shingle string), keep only
  // each doc's first |x| − ceil(τ·|x|) + 1 as its PREFIX; two docs with
  // J ≥ τ provably share a prefix shingle, so candidates come from
  // posting lists over PREFIXES ONLY — the frequent shingles that blow
  // up q24's posting lists are exactly the ones the order pushes OUT of
  // prefixes. A length filter (min ≥ τ·max) prunes further before the
  // exact verify (array_intersect over the pair's own shingle arrays —
  // pair-local, no re-shuffle of the corpus). The ORACLE is the
  // uncapped inverted-index form — a single pair lost by the filter
  // cannot hash-match, so losslessness itself sits on the gate.
  // Scale shape: frequency join keyed; prefix postings bucket-pair
  // in-reducer (no self-join); verify joins are doc-keyed with
  // doc-bounded array payloads.
  val q216PrefixJoin: QueryDef = QueryDef.sql(
    "q216_prefix_join",
    s"""WITH $prefixJoinOracleCte
       |SELECT doc_a, doc_b, i AS n_common,
       |       sa.n + sb.n - i AS n_union,
       |       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    exactJaccardPairs(s, d)
      .orderBy("doc_a", "doc_b")
  }


  /** q216's engine kernel, shared with q228's quality eval: every pair
    * with Jaccard ≥ 1/2, exactly, via the prefix-filtered AllPairs plan
    * (columns doc_a, doc_b, n_common, n_union, jaccard; unordered).
    */
  private[graft] def exactJaccardPairs(s: SparkSession, d: String): DataFrame =
    exactJaccardPairsOf(Tables.widen(Tables.documents(s, d)))

  private[graft] def exactJaccardPairsOf(docs: DataFrame): DataFrame = {
    val tau = 0.5
    val sh = docShinglesOf(docs)
    val freq = sh.groupBy("s").agg(count(lit(1)).as("f"))
    // truncate: three consumers below (prefixes + both verify sides)
    // would otherwise re-run the shingle scan, the frequency agg, and
    // the corpus-keyed join each — 17 exchanges for a 5-exchange query
    val byDoc = Clustering.truncate(sh.join(freq, Seq("s")) // keyed: shingle space is corpus-sized
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        transform(sort_array(collect_list(struct(col("f"), col("s")))),
          x => x.getField("s")).as("sorted")))
    // prefix length for τ=1/2, integer-exact: n − ceil(n/2) + 1
    // (div, not / — Column./ on integers is IEEE division)
    val p = expr("cast(n - (n + 1) div 2 + 1 as int)")
    // posexplode: each prefix entry carries its 0-based POSITION in the
    // doc's frequency-sorted shingle list (the prefix is a prefix of
    // that list, so prefix position == global position) — feeds the
    // PPJoin positional filter below
    val prefixes = byDoc.select(col("doc_id"), col("n"),
      posexplode(slice(col("sorted"), lit(1), p)).as(Seq("pos", "s")))
    // Candidate generation (postings agg → in-bucket pair explode →
    // length filter → distinct partial) is the query's CPU center while
    // its shuffle input is byte-tiny, so AQE's byte-driven coalescing
    // squeezes the whole stage onto 1-2 tasks (measured: one 6.4 s
    // 2-task stage owning ~80% of q216 even after the verify was
    // spread). A user-specified hash repartition on the SAME key the
    // groupBy needs is exempt from AQE coalescing and satisfies the
    // aggregation's required distribution, so it REPLACES the
    // coalescible exchange instead of adding one — guide §2.5/§2.4;
    // scale-adaptive via defaultParallelism, not a local[32] constant.
    val spread = 4 * docs.sparkSession.sparkContext.defaultParallelism
    val postings = prefixes.repartition(spread, col("s")).groupBy("s")
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("n"), col("pos")))).as("ms"))
      .filter(size(col("ms")) >= 2)
    val cand = bucketPairs(postings, "ms", "a", "b")
      .select(col("a.doc_id").as("doc_a"), col("a.n").as("na"),
        col("a.pos").as("pa"),
        col("b.doc_id").as("doc_b"), col("b.n").as("nb"),
        col("b.pos").as("pb"))
      // length filter: J ≥ τ forces min(|x|,|y|) ≥ τ·max(|x|,|y|)
      .filter(least(col("na"), col("nb")) * 2 >= greatest(col("na"), col("nb")))
      // POSITIONAL filter (the PPJoin refinement of AllPairs): every
      // common shingle of the pair sits AT-OR-AFTER this shared shingle
      // in the global frequency order, so the intersection is bounded by
      // the shorter remaining suffix, min(na − pa, nb − pb) (0-based
      // positions). J ≥ 1/2 needs i ≥ ceil((na + nb)/3) (3i ≥ na + nb).
      // LOSSLESS: a qualifying pair always passes at its FIRST common
      // prefix shingle (nothing common precedes it there), and the
      // distinct keeps a pair if ANY of its shared-shingle meetings
      // passes — only never-qualifying meetings are dropped, shrinking
      // the pair set the verify join must intersect.
      .filter(least(col("na") - col("pa"), col("nb") - col("pb")) >=
        expr("(na + nb + 2) div 3"))
      .select("doc_a", "doc_b").distinct()
    val setsA = byDoc.select(col("doc_id").as("doc_a"),
      col("sorted").as("sa"), col("n").as("na"))
    val setsB = byDoc.select(col("doc_id").as("doc_b"),
      col("sorted").as("sb"), col("n").as("nb"))
    val i = size(array_intersect(col("sa"), col("sb"))).cast("long")
    val jac = i.cast("double") / (col("na") + col("nb") - i)
    // The exact verify is CPU-bound (one array_intersect over two
    // ~|doc|-sized arrays PER CANDIDATE PAIR) while its shuffle input is
    // byte-tiny — the same AQE-coalescing trap as the postings stage
    // above. Catalyst pushes the jaccard filter INTO the broadcast-join
    // condition, so the verify executes in whatever stage probes the
    // join: repartition the candidate PAIRS (16 bytes each) before the
    // joins and the whole verify — both broadcast probes and the
    // intersect-bearing condition — runs on every core (a repartition
    // AFTER the join only re-spreads the few survivors; measured 3.8 s
    // on an AQE-coalesced 3-task stage vs 166 ms spread).
    cand.repartition(spread)
      .join(setsA, "doc_a").join(setsB, "doc_b")
      .filter(jac >= tau)
      .select(col("doc_a"), col("doc_b"), i.as("n_common"),
        (col("na") + col("nb") - i).as("n_union"), jac.as("jaccard"))
  }

  // q228 — DEDUP-QUALITY EVALUATION: precision/recall of the
  // PROBABILISTIC near-dup path (q22's MinHash-LSH candidates) against
  // the EXACT ground truth (q216's prefix-joined J ≥ 1/2 pairs) — the
  // "tune your banding" report an index build runs before trusting LSH
  // at corpus scale (the text twin of `Similarity.recallAtK` for ANN):
  // recall says what the bands MISS (dup mass that survives dedup),
  // precision what they over-generate (wasted verification work). Both
  // in exact integer basis points (hit·10000 div total) so the whole
  // report hash-verifies. Scale shape: both pair sets are the
  // already-bucketed plans; the comparison joins PAIR KEYS (near-dup
  // mass, not corpus), and the three counts are 1-row broadcasts.
  val q228DedupEval: QueryDef = QueryDef.sql(
    "q228_dedup_eval",
    s"""WITH $lshSigsSql,
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM sigs a JOIN sigs b
       |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |ex AS (SELECT doc_a, doc_b FROM inter
       |       JOIN sizes sa ON doc_a = sa.doc_id
       |       JOIN sizes sb ON doc_b = sb.doc_id
       |       WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       |hit AS (SELECT COUNT(*) AS n FROM ex
       |        JOIN cand ON ex.doc_a = cand.doc_a AND ex.doc_b = cand.doc_b),
       |ce AS (SELECT COUNT(*) AS n FROM ex),
       |cc AS (SELECT COUNT(*) AS n FROM cand)
       |SELECT CAST(ce.n AS BIGINT) AS n_exact,
       |       CAST(cc.n AS BIGINT) AS n_cand,
       |       CAST(hit.n AS BIGINT) AS n_hit,
       |       CAST(hit.n * 10000 // cc.n AS BIGINT) AS precision_bp,
       |       CAST(hit.n * 10000 // ce.n AS BIGINT) AS recall_bp
       |FROM hit, ce, cc""".stripMargin) { (s, d) =>
    val sigs = lshSigsOf(Tables.widen(Tables.documents(s, d)))
    val buckets = sigs.groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val cand = bucketPairs(buckets, "ids", "doc_a", "doc_b").distinct()
    val ex = exactJaccardPairs(s, d).select("doc_a", "doc_b")
    // ONE pass per arm (optimization guide §2.4 — remove duplicated
    // subtrees): hit/exact/cand counts all come off a single full-outer
    // join of the two UNIQUE pair sets — count(e)=|ex|, count(c)=|cand|,
    // count(both)=|ex ∩ cand| — instead of three aggregates that each
    // replanned (and re-executed) the heavy ex/cand pipelines. The
    // r15-best plan carried 16 exchanges; this shape halves the work.
    ex.withColumn("e", lit(1))
      .join(cand.withColumn("c", lit(1)), Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(col("e")).as("n_exact"), count(col("c")).as("n_cand"),
        count(when(col("e").isNotNull && col("c").isNotNull, 1)).as("n_hit"))
      .select(col("n_exact"), col("n_cand"), col("n_hit"),
        expr("n_hit * 10000 div n_cand").as("precision_bp"),
        expr("n_hit * 10000 div n_exact").as("recall_bp"))
  }

  // q266 — SAMPLED dedup-quality eval (q228's 100 TB form): the exact
  // ground-truth arm is the one part of q228 that cannot run on the full
  // corpus at scale (it IS q216's exact join), so the eval runs on a
  // DETERMINISTIC hash-sample stratum — q67's seedless md5-bucket
  // pattern on doc_id (reproducible across runs/engines, pushes into the
  // scan) — with the LSH arm filtered to the SAME stratum, so precision/
  // recall remain exact *within the stratum* and unbiased estimates of
  // the corpus numbers (pair inclusion is doc-id-independent of shingle
  // content). Both arms see the filter BELOW their sketch/shingle
  // projections: the stratum cut is paid before any explosion. q228
  // stays the full-corpus oracle twin; DedupSpec pins sampled P/R within
  // a stated bound of the full-corpus report at test scale.
  private val stratumSql =
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 40"
  private def stratumCol: Column =
    conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") % 100 < 40
  val q266DedupEvalSampled: QueryDef = QueryDef.sql(
    "q266_dedup_eval_sampled",
    s"""WITH docs_s AS (SELECT doc_id, text FROM documents WHERE $stratumSql),
       |${lshSigsSqlFrom("docs_s")},
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM sigs a JOIN sigs b
       |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |ex AS (SELECT doc_a, doc_b FROM inter
       |       JOIN sizes sa ON doc_a = sa.doc_id
       |       JOIN sizes sb ON doc_b = sb.doc_id
       |       WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       |hit AS (SELECT COUNT(*) AS n FROM ex
       |        JOIN cand ON ex.doc_a = cand.doc_a AND ex.doc_b = cand.doc_b),
       |ce AS (SELECT COUNT(*) AS n FROM ex),
       |cc AS (SELECT COUNT(*) AS n FROM cand),
       |nd AS (SELECT COUNT(*) AS n FROM docs_s)
       |SELECT CAST(nd.n AS BIGINT) AS n_docs,
       |       CAST(ce.n AS BIGINT) AS n_exact,
       |       CAST(cc.n AS BIGINT) AS n_cand,
       |       CAST(hit.n AS BIGINT) AS n_hit,
       |       CAST(hit.n * 10000 // cc.n AS BIGINT) AS precision_bp,
       |       CAST(hit.n * 10000 // ce.n AS BIGINT) AS recall_bp
       |FROM hit, ce, cc, nd""".stripMargin) { (s, d) =>
    val docs = Tables.widen(Tables.documents(s, d))
      .select("doc_id", "text").filter(stratumCol)
    val buckets = lshSigsOf(docs).groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val cand = bucketPairs(buckets, "ids", "doc_a", "doc_b").distinct()
    val ex = exactJaccardPairsOf(docs).select("doc_a", "doc_b")
    // q228's single-pass shape (guide §2.4): both arms computed once via
    // one full-outer join; only the trivial n_docs count stays a
    // broadcast cross join (a pruned scan + filter + count).
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    ex.withColumn("e", lit(1))
      .join(cand.withColumn("c", lit(1)), Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(col("e")).as("n_exact"), count(col("c")).as("n_cand"),
        count(when(col("e").isNotNull && col("c").isNotNull, 1)).as("n_hit"))
      .crossJoin(broadcast(nd))
      .select(col("n_docs"), col("n_exact"), col("n_cand"), col("n_hit"),
        expr("n_hit * 10000 div n_cand").as("precision_bp"),
        expr("n_hit * 10000 div n_exact").as("recall_bp"))
  }

  val all: Seq[QueryDef] = Seq(q21ExactDedup, q22MinhashLsh, q23Simhash,
    q24NgramJaccard, q115Containment, q126SourceOverlap, q206UrlCanon,
    q216PrefixJoin, q228DedupEval, q266DedupEvalSampled)
}
