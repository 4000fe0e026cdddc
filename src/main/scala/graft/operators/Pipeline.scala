package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.DataFrame

import graft.engine.{QueryDef, Tables}

/** The whole curation pipeline as ONE composable API [EXT, north star]:
  * what a user of this library actually runs end-to-end — the individual
  * stages exist as verified queries (q92 gate, q21/q22+q56 dedup, q86
  * contamination, q109 budget, q116 shard); this chains their SHARED
  * frame-level expressions into a single lazily-planned DataFrame, so
  * Catalyst sees the entire pipeline at once (filters merge into the
  * scan, stages that share a shuffle share it for free) and the output
  * is reproducible row-for-row across reruns and repartitionings.
  *
  * Stage order is the cost-ordered one every production pipeline
  * converges on: cheap per-row gates first (shrink the corpus before
  * anything shuffles), then exact dedup (one keyed shuffle), then
  * near-dup (LSH buckets + transitive closure on survivors only), then
  * the contamination probe (broadcast semi-join against the tiny
  * benchmark gram set), then budget selection, then shard scatter.
  *
  * PipelineSpec drives the full chain at sf0.001 and pins each stage's
  * invariant on the final output (gate, representative-only, no
  * benchmark gram, budget bound, shard balance, JSONL round-trip).
  */
object Pipeline {

  /** Deterministic (doc_id, source, text, n_toks, shard, pos) curated
    * corpus from a raw (doc_id, text, lang, source, n_chars) frame.
    *
    * @param docsDf      raw corpus
    * @param benchDf     benchmark/eval documents (doc_id, text) — any doc
    *                    sharing a 3-gram with these is dropped
    * @param tokenBudget per-source token budget (greedy md5-priority
    *                    prefix, q109's exact semantics)
    * @param nShards     output shard count (q116's LCG scatter)
    */
  def curate(docsDf: DataFrame, benchDf: DataFrame,
      tokenBudget: Long, nShards: Int): DataFrame = {
    // 0. Unicode canonicalization (q136's expression) — precomposed and
    //    decomposed spellings must collide in every hash downstream
    //    (exact dedup, shingles, contamination grams). Free on clean
    //    corpora: the isNormalized fast path returns the input as-is.
    //    n_chars recomputes from the canonical text: the caller's count
    //    reflects the pre-normalization spelling, and a gate fed the
    //    stale count would pass one spelling and drop the other — the
    //    exact divergence this stage removes.
    val canonical = docsDf
      .withColumn("text", graft.functions.GraftFunctions.nfc(col("text")))
      .withColumn("n_chars", length(col("text")).cast(LongType))

    // 1. quality gate — q92's cascade, projection-time, shrinks the
    //    corpus before any shuffle sees it
    val kept = canonical
      .filter(Corpus.dropReason(col("text"), col("n_chars"), col("lang")) === "0_kept")
      .select("doc_id", "source", "text")

    // 2. exact dedup — first-seen (min doc_id) per exact text, q21's
    //    semantics: one keyed shuffle on the content hash. Truncated:
    //    two consumers (the LSH signatures and the near-dup join below)
    //    would otherwise re-run the scan → nfc → quality-gate → window
    //    chain each (guide §2.4 duplicated subtrees — measured as three
    //    repeated ~400 ms corpus stages in one q139 pass); one
    //    corpus-sized intra-query materialization replaces them.
    val exact = Clustering.truncate(kept
      .withColumn("keeper",
        min("doc_id").over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper"))

    // 3. near-dup keep-list — q22's LSH pairs on the exact-dedup
    //    survivors, q56's transitive closure, keep each cluster's min id
    val sigs = Dedup.lshSigsOf(exact)
    val buckets = sigs.groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    // pairs feeds BOTH the closure (which materializes its own edge set)
    // and dupMembers below — without the truncate the whole upstream
    // scan → nfc → quality gate → exact-dedup window → LSH → buckets
    // pipeline re-executes for dupMembers (guide §2.4: duplicated
    // subtrees). The pair list is near-dup-mass-sized (tiny vs corpus),
    // so materializing it once is safe at any scale.
    val pairs = Clustering.truncate(
      Dedup.bucketPairs(buckets, "ids", "a", "b").distinct())
    val reps = Clustering.connectedComponents(pairs)
      .filter(col("node") === col("label")).select(col("node").as("doc_id"))
    val dupMembers = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    // truncated for the same reason: the contamination probe and the
    // anti-join both consume it
    val deduped = Clustering.truncate(exact
      .join(dupMembers.withColumn("in_pair", lit(true)), Seq("doc_id"), "left")
      .join(reps.withColumn("is_rep", lit(true)), Seq("doc_id"), "left")
      .filter(col("in_pair").isNull || col("is_rep"))
      .select("doc_id", "source", "text"))

    // 4. contamination filter — q86's shape: benchmark 3-grams are tiny
    //    by construction, so the probe is a broadcast ANTI semi-join;
    //    corpus grams never shuffle
    def grams(df: DataFrame): DataFrame = {
      val t = split(col("text"), " ")
      df.select(col("doc_id"), t.as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("t")) - 3),
          i => array_join(slice(col("t"), i + 1, lit(3)), " "))).as("g"))
    }
    val benchGrams = grams(benchDf).select("g").distinct()
    val contaminated = grams(deduped)
      .join(broadcast(benchGrams), "g").select("doc_id").distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 5. token budget per source — q109's exact greedy-prefix semantics
    //    (md5 priority, whole documents, ties by doc_id)
    val prio = clean.select(col("doc_id"), col("source"), col("text"),
      size(split(col("text"), " ")).cast(LongType).as("n_toks"),
      Corpus.md5Bucket(col("doc_id").cast("string"), 2147483647L).as("prio"))
    val budgeted = prio
      .withColumn("cum",
        sum("n_toks").over(Window.partitionBy("source").orderBy("prio", "doc_id")))
      .filter(col("cum") <= tokenBudget)

    // 6. shard scatter — q116's exact LCG mix: uniform, deterministic,
    //    breaks source/time locality; in-shard position by the mixed key
    val key = (col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
    budgeted
      .withColumn("s", key)
      .withColumn("shard", (col("s") % nShards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy(col("s"), col("doc_id"))))
      .select("doc_id", "source", "text", "n_toks", "shard", "pos")
  }

  /** The END-TO-END pretraining-data pipeline — what a user actually
    * runs: [[curate]] (gate → dedup → decontaminate → budget → shard),
    * then BPE-tokenize every surviving document with a LEARNED merge
    * table (q138's codegen'd expression — `merges` comes from
    * `Corpus.trainBpe`/`trainBpeDistributed`), then pack each shard's
    * token stream into fixed-budget context bins (q99's running-sum
    * semantics, per shard instead of per source — shards are the
    * training-time unit).
    *
    * Output: one row per curated doc with `(doc_id, source, text,
    * n_toks, n_bpe_tokens, shard, pos, bin)` — `bin` is the
    * `binTokens`-sized context window where the doc's first BPE token
    * lands, deterministic across reruns and repartitionings.
    *
    * Scale shape: NO shuffle beyond [[curate]]'s own. Tokenization is
    * one codegen'd projection (merge table ships once per task as a
    * codegen reference); the packing window partitions by `shard` and
    * orders by `pos` — the exact partitioning AND order curate's final
    * window produced, so Catalyst reuses that exchange and sort
    * (PipelineSpec pins the exchange count equal to curate's).
    */
  def pretrain(docsDf: DataFrame, benchDf: DataFrame, tokenBudget: Long,
      nShards: Int, merges: Seq[(String, String)],
      binTokens: Int = 4096): DataFrame = {
    val curated = curate(docsDf, benchDf, tokenBudget, nShards)
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curated
      .withColumn("n_bpe_tokens",
        size(graft.functions.GraftFunctions.bpeEncode(col("text"), merges))
          .cast(LongType))
      .withColumn("start_tok", sum("n_bpe_tokens").over(w) - col("n_bpe_tokens"))
      .withColumn("bin", floor(col("start_tok") / binTokens).cast(LongType))
      .select("doc_id", "source", "text", "n_toks", "n_bpe_tokens",
        "shard", "pos", "bin")
  }

  // q139 — the ENTIRE curate pipeline as one hash-checked query: NFC →
  // quality gate → exact dedup → LSH near-dup closure → contamination
  // anti-join → per-source token budget → LCG shard scatter, end to end
  // against a DuckDB twin that recomputes every stage declaratively
  // (recursive CTE for the transitive closure). Bench docs = doc_id %
  // 97 = 0 (q86's eval-set convention); the corpus is everything else.
  // This is the composition proof: the per-stage oracles (q92, q21,
  // q22+q56, q86, q109, q116) each verify a stage in isolation — this
  // verifies that chaining them through [[curate]]'s shared expressions
  // changes nothing.
  //
  // Scale shape: identical to [[curate]]'s (it IS curate) — the stages
  // add exactly one keyed shuffle each, near-dup stays inside LSH
  // buckets, the contamination probe broadcasts the tiny bench gram set.
  val q139PipelineCurate: QueryDef = QueryDef.sql(
    "q139_pipeline_curate",
    """WITH RECURSIVE
      |raw AS (SELECT doc_id, source, lang, nfc_normalize(text) AS text
      |        FROM documents WHERE doc_id % 97 <> 0),
      |canon AS (SELECT doc_id, source, lang, text,
      |                 CAST(length(text) AS BIGINT) AS n_chars FROM raw),
      |kept AS (SELECT doc_id, source, text FROM canon
      |         WHERE n_chars >= 80 AND lang IN ('en', 'zh')
      |           AND NOT (len(list_distinct(string_split(text, ' '))) * 10
      |                    < len(string_split(text, ' ')) * 4)),
      |exact AS (SELECT doc_id, source, text FROM
      |            (SELECT kept.*, MIN(doc_id) OVER (PARTITION BY text) AS keeper
      |             FROM kept)
      |          WHERE doc_id = keeper),
      |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM exact),
      |sh AS (SELECT DISTINCT doc_id,
      |              toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      |       FROM t, generate_series(1, 4000) g(i) WHERE i <= len(toks) - 2),
      |wi AS (SELECT doc_id,
      |              CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS sid
      |       FROM sh),
      |hashed AS (SELECT doc_id, j, ((j*2+1)*sid + (j*j+7)) % 2147483647 AS h
      |           FROM wi, generate_series(0, 15) g(j)),
      |mins AS (SELECT doc_id, j, MIN(h) AS mh FROM hashed GROUP BY 1, 2),
      |sigs AS (SELECT doc_id, j // 4 AS band,
      |                string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
      |         FROM mins GROUP BY 1, 2),
      |prs AS (SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
      |        FROM sigs a JOIN sigs b
      |          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |edges AS (SELECT pa AS u, pb AS v FROM prs UNION SELECT pb, pa FROM prs),
      |reach(node, label) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node),
      |labeled AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY 1),
      |deduped AS (SELECT e.doc_id, e.source, e.text FROM exact e
      |            WHERE e.doc_id NOT IN (SELECT u FROM edges)
      |               OR e.doc_id IN (SELECT node FROM labeled WHERE node = cluster_id)),
      |btoks AS (SELECT doc_id, string_split(text, ' ') AS bt
      |          FROM documents WHERE doc_id % 97 = 0),
      |bgrams AS (SELECT DISTINCT array_to_string(bt[i:i+2], ' ') AS g
      |           FROM btoks, UNNEST(range(1, len(bt) - 1)) u(i)
      |           WHERE len(bt) >= 3),
      |ctoks AS (SELECT doc_id, string_split(text, ' ') AS ct FROM deduped),
      |cgrams AS (SELECT DISTINCT doc_id, array_to_string(ct[i:i+2], ' ') AS g
      |           FROM ctoks, UNNEST(range(1, len(ct) - 1)) u(i)
      |           WHERE len(ct) >= 3),
      |clean AS (SELECT * FROM deduped
      |          WHERE doc_id NOT IN (SELECT DISTINCT doc_id
      |                               FROM cgrams JOIN bgrams USING (g))),
      |prio AS (SELECT doc_id, source,
      |                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |                  % 2147483647 AS prio
      |         FROM clean),
      |budgeted AS (SELECT doc_id, source, n_toks FROM
      |               (SELECT prio.*, SUM(n_toks) OVER
      |                  (PARTITION BY source ORDER BY prio, doc_id) AS cum
      |                FROM prio)
      |             WHERE cum <= 800),
      |k AS (SELECT doc_id, source, n_toks,
      |             (doc_id * 1103515245 + 12345) % 2147483648 AS s
      |      FROM budgeted)
      |SELECT doc_id, source, n_toks, CAST(s % 4 AS INTEGER) AS shard,
      |       CAST(row_number() OVER (PARTITION BY s % 4
      |                               ORDER BY s, doc_id) AS INTEGER) AS pos
      |FROM k
      |ORDER BY shard, pos""".stripMargin) { (s, d) =>
    val all = Tables.widen(Tables.documents(s, d))
    val corpus = all.filter(col("doc_id") % 97 =!= 0)
    val bench = all.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    curate(corpus, bench, tokenBudget = 800L, nShards = 4)
      .select("doc_id", "source", "n_toks", "shard", "pos")
      .orderBy("shard", "pos")
  }

  val all: Seq[QueryDef] = Seq(q139PipelineCurate)
}
