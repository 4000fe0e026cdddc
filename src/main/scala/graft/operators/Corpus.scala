package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Training-corpus curation operators [EXT, north star]: the pipeline
  * stages that sit between raw scraped text and a training mix —
  * benchmark-contamination detection, weighted dataset mixing, column
  * profiling, and incremental-batch dedup against an existing corpus.
  *
  * All four are oracle-verified over `documents`: the deterministic
  * md5-bucket trick (q67) stands in for every "random" choice, so DuckDB
  * reproduces the exact row set.
  */
object Corpus {

  // q258 — REPRODUCIBLE WEIGHTED SAMPLING (the eval-set/inspection
  // draw: pick k docs per source with probability ∝ length, the same
  // docs on EVERY rerun, retry, partitioning, and engine — true
  // randomness here is silent eval churn, the q100 lesson applied to
  // weighted draws): priority sampling with a seedless md5 hash as the
  // fixed pseudo-uniform — score = hash div weight (integer), keep the
  // k smallest per source (heavier docs draw proportionally smaller
  // scores, the A-ES/priority-sampling order statistic with the float
  // exponent replaced by integer division — a DEFINED sampler, not an
  // approximation of one). One keyed window capped at k rows per
  // group map-side (WindowGroupLimit); ties broken by doc_id.
  val q258WeightedSample: QueryDef = QueryDef.sql(
    "q258_weighted_sample",
    s"""WITH p AS (SELECT source, doc_id, n_chars,
       |    (${graft.operators.Dedup.md5IdSql("CAST(doc_id AS VARCHAR)")})
       |      * 10000 // greatest(n_chars, 1) AS score
       |  FROM documents),
       |r AS (SELECT source, doc_id, n_chars, score,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY score, doc_id) AS rank
       |      FROM p)
       |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
       |       CAST(n_chars AS BIGINT) AS n_chars, CAST(score AS BIGINT) AS score
       |FROM r WHERE rank <= 20
       |ORDER BY source, rank""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(s, d).select(
      col("source"), col("doc_id"), col("n_chars"),
      expr(s"${md5IdSpark("CAST(doc_id AS STRING)")} * 10000 " +
        "div greatest(n_chars, 1L)").as("score"))
    scored.select(col("source"), col("doc_id"), col("n_chars"), col("score"),
      row_number().over(
        Window.partitionBy("source").orderBy("score", "doc_id")).as("rank"))
      .filter(col("rank") <= 20)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_chars"), col("score"))
      .orderBy("source", "rank")
  }

  /** Spark-SQL spelling of Dedup.md5Id for use inside expr() strings. */
  private def md5IdSpark(x: String): String =
    s"CAST(conv(substring(md5(CAST($x AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 2147483647"

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.widen(Tables.documents(s, d))

  /** Cross-engine deterministic bucket in [0, mod): first 15 hex chars of
    * md5(key) as a bigint (q67's kernel — both engines hash the identical
    * UTF-8 bytes and parse the identical hex prefix).
    */
  private[operators] def md5Bucket(key: Column, mod: Long): Column =
    conv(substring(md5(key.cast("binary")), 1, 15), 16, 10).cast(LongType) % mod

  // q86 — benchmark contamination scan: which corpus documents share a
  // word n-gram with any benchmark document? The canonical eval-leakage
  // check before training. Benchmark membership is deterministic
  // (doc_id % 97 = 0 stands in for the eval set); n = 3 keeps the
  // testdata signal dense (real pipelines run 8-13-gram windows — n is a
  // knob, the plan shape is identical).
  //
  // Scale shape: ONE pass shingles both sides (the benchmark side is a
  // filter, not a second scan — Spark reuses the exchange); the
  // benchmark gram set is tiny by construction (evals are small) so the
  // probe is a BROADCAST semi-join against it — the corpus side never
  // shuffles its grams anywhere, and per-doc hit counts aggregate
  // map-side. At 100 TB this is: scan, project grams, broadcast-probe,
  // partial count — no all-pairs, no big shuffle.
  val q86Contamination: QueryDef = QueryDef.sql(
    "q86_contamination",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
      |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 3),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
      |corpus AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
      |SELECT corpus.doc_id, COUNT(*) AS n_hits
      |FROM corpus JOIN bench USING (g)
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val n = 3
    val t = split(col("text"), " ")
    val grams = docs(s, d)
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("t")) - n),
        i => array_join(slice(col("t"), i + 1, lit(n)), " "))).as("g"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val corpus = grams.filter(col("doc_id") % 97 =!= 0).distinct()
    corpus.join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id")
  }

  // q87 — weighted dataset mixing: each source carries a sampling rate
  // from a mixing config (here derived arithmetically; in production a
  // tiny config table), and rows are kept by deterministic md5 bucket —
  // the reproducible, cluster-order-independent form of weighted
  // sampling. Rates are integer BASIS POINTS so the keep predicate is
  // pure integer arithmetic (no float rate crossing engines).
  //
  // Scale shape: broadcast the 20-row config, one scan, map-side
  // filter + partial agg. The sample is a function of doc_id alone, so
  // re-runs, retries, and different partitionings all produce the same
  // mix — the property that matters when the mix defines a training set.
  val q87WeightedMix: QueryDef = QueryDef.sql(
    "q87_weighted_mix",
    """WITH w AS (
      |  SELECT 'src' || CAST(i AS VARCHAR) AS source,
      |         (CAST(i AS BIGINT) % 4 + 1) * 2500 AS rate_bp
      |  FROM range(20) t(i)),
      |k AS (
      |  SELECT d.source, d.n_chars
      |  FROM documents d JOIN w USING (source)
      |  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
      |        < rate_bp)
      |SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM k
      |GROUP BY 1
      |ORDER BY source""".stripMargin) { (s, d) =>
    val w = s.range(20).select(
      concat(lit("src"), col("id").cast("string")).as("source"),
      ((col("id") % 4 + 1) * 2500).as("rate_bp"))
    docs(s, d)
      .join(broadcast(w), "source")
      .filter(md5Bucket(col("doc_id").cast("string"), 10000L) < col("rate_bp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("total_chars"))
      .orderBy("source")
  }

  // q109 — TOKEN-BUDGET mixing [EXT]: the other half of the mixing story.
  // q87 keeps a RATE per source; real training mixes are specified as
  // token BUDGETS per source ("300B tokens of web, 50B of code"). Each
  // source's documents are ranked by a deterministic md5 priority (the
  // reproducible stand-in for a shuffle) and the prefix that fits the
  // budget entirely is kept — greedy fill, no partial documents, ties
  // broken by doc_id so the kept set is a pure function of the data.
  //
  // Scale shape: ONE keyed shuffle (partition by source), the running
  // total is a window per source — parallel across sources. For a
  // single source too big for one task's window: two-pass cutoff —
  // (1) map-side histogram of priority buckets → cumulative tokens per
  // bucket → the priority threshold where the budget lands, (2) keep
  // rows with priority below threshold as a pure filter; the window
  // form here is the exact semantics that pass verifies against.
  /** The ONE oracle both q109 and q110 verify against — their plans must
    * be bit-identical, so a budget/priority/tokenizer tweak edits ONE
    * string. */
  private val tokenBudgetOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2147483647 AS prio
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_toks,
      |         CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY prio, doc_id) AS BIGINT) AS cum_toks
      |  FROM t)
      |SELECT doc_id, source, n_toks, cum_toks
      |FROM c WHERE cum_toks <= 800
      |ORDER BY source, cum_toks, doc_id""".stripMargin

  /** (doc_id, source, n_toks, prio) — the shared scoring projection of
    * both token-budget forms. */
  private def tokenPriorities(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_toks"),
      md5Bucket(col("doc_id").cast("string"), 2147483647L).as("prio"))

  val q109TokenBudgetMix: QueryDef = QueryDef.sql(
    "q109_token_budget_mix", tokenBudgetOracleSql) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy("source").orderBy("prio", "doc_id")
    tokenPriorities(s, d)
      .withColumn("cum_toks", sum("n_toks").over(bySource))
      .filter(col("cum_toks") <= 800)
      .select("doc_id", "source", "n_toks", "cum_toks")
      .orderBy("source", "cum_toks", "doc_id")
  }

  // q110 — q109's declared SCALE FORM, same oracle: the two-pass cutoff
  // the q109 comment promises. Pass 1 histograms priorities into 1024
  // buckets per source (map-side partial agg; the histogram is tiny —
  // sources × 1024) and computes each bucket's starting token offset
  // with a window over the HISTOGRAM, not the data; buckets whose
  // offset already exceeds the budget are pruned before any per-row
  // work. Pass 2 joins the offsets back (broadcast) and runs the
  // running total partitioned by (source, bucket) — 1024× finer than
  // q109's per-source window, so one giant source no longer serializes
  // into one task. Offsets make the within-bucket cumsum globally
  // exact, so the kept set and cum_toks are BIT-IDENTICAL to q109 —
  // which is why both queries share one oracle.
  val q110TokenBudgetTwopass: QueryDef = QueryDef.sql(
    "q110_token_budget_twopass", tokenBudgetOracleSql) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val width = 2147483648L / 1024L // prio < 2^31 → bucket in [0, 1023]
    val t = tokenPriorities(s, d)
      .withColumn("bucket", (col("prio") / width).cast(LongType))
    val perBucket = t.groupBy("source", "bucket").agg(sum("n_toks").as("btoks"))
    val before = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("start", coalesce(sum("btoks").over(before), lit(0L)))
      // a bucket starting past the budget cannot contribute a kept row
      // (cumsums are monotone) — prune before any per-row work
      .filter(col("start") <= 800)
      .select("source", "bucket", "start")
    val inBucket = Window.partitionBy("source", "bucket").orderBy("prio", "doc_id")
    t.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_toks", col("start") + sum("n_toks").over(inBucket))
      .filter(col("cum_toks") <= 800)
      .select("doc_id", "source", "n_toks", "cum_toks")
      .orderBy("source", "cum_toks", "doc_id")
  }

  // q111 — sliding context-window CHUNKING [EXT]: long documents →
  // overlapping fixed-size token windows (window 64, stride 32) — how
  // documents become training examples (and RAG index entries) when they
  // exceed the model context. Chunks start every `stride` tokens; a tail
  // shorter than half a window is dropped unless it is the document's
  // only chunk (no tiny fragments, no empty docs). Emits the chunk's
  // md5 fingerprint rather than its text — content-verifying without
  // shipping the corpus through the result set.
  //
  // Scale shape: pure per-row fan-out — tokenize once, explode the
  // (bounded) start sequence, slice/hash inside codegen; NO shuffle at
  // all before the presentation sort. The same constant-bounded
  // generate_series trick as the shingle queries keeps the DuckDB twin
  // lateral-free.
  /** The chunking transform over any (doc_id, text) frame — the query's
    * body, callable directly (PropertySpec brute-forces it on generated
    * docs). Chunk starts are capped at token 4000, mirroring the
    * constant bound the DuckDB twin's generate_series carries (the
    * [[Dedup]] shingle convention: both sides see identical sets even
    * if a document ever exceeds the cap).
    */
  def chunkWindows(docsDf: DataFrame, win: Int = 64, stride: Int = 32): DataFrame = {
    val t = docsDf.select(col("doc_id"), split(col("text"), " ").as("toks"))
    t.select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), least(size(col("toks")), lit(4000)),
          lit(stride))).as("start"))
      .withColumn("chunk_toks",
        least(lit(win), size(col("toks")) - col("start") + 1).cast(LongType))
      .filter(col("start") === 1 || col("chunk_toks") * 2 >= win)
      .select(col("doc_id"),
        ((col("start") - 1) / stride).cast(LongType).as("chunk_id"),
        col("start").cast(LongType).as("start_tok"), col("chunk_toks"),
        md5(concat_ws(" ", slice(col("toks"), col("start"), lit(win)))
          .cast("binary")).as("chunk_hash"))
  }

  val q111ChunkWindows: QueryDef = QueryDef.sql(
    "q111_chunk_windows",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (SELECT doc_id, s, len(toks) AS n,
      |             CAST(least(64, len(toks) - s + 1) AS BIGINT) AS chunk_toks,
      |             md5(array_to_string(toks[s:s+63], ' ')) AS chunk_hash
      |      FROM t, generate_series(1, 4000, 32) g(s)
      |      WHERE s <= len(toks))
      |SELECT doc_id, CAST((s - 1) // 32 AS BIGINT) AS chunk_id,
      |       CAST(s AS BIGINT) AS start_tok, chunk_toks, chunk_hash
      |FROM c
      |WHERE s = 1 OR chunk_toks * 2 >= 64
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    chunkWindows(docs(s, d)).orderBy("doc_id", "chunk_id")
  }

  // q88 — column profiling: per-column row/null/distinct counts and mean
  // length over the string columns — the data-quality summary every
  // ingest runs first. ONE scan: all metrics for all columns compute in
  // a single aggregation. The three exact COUNT(DISTINCT)s expand the
  // input ~4x before the shuffle — q96 below is the declared scale form
  // (approx_count_distinct, no Expand), CorpusSpec pins their agreement;
  // the per-column long format is a driver-side unpivot of the 1-row
  // aggregate, not a second pass.
  val q88Profile: QueryDef = QueryDef.sql(
    "q88_profile",
    """SELECT 'lang' AS column_name, COUNT(*) AS n_rows,
      |       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |       COUNT(DISTINCT lang) AS n_distinct,
      |       CAST(SUM(length(lang)) AS DOUBLE) / CAST(COUNT(lang) AS DOUBLE) AS avg_len
      |FROM documents
      |UNION ALL
      |SELECT 'source', COUNT(*),
      |       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       COUNT(DISTINCT source),
      |       CAST(SUM(length(source)) AS DOUBLE) / CAST(COUNT(source) AS DOUBLE)
      |FROM documents
      |UNION ALL
      |SELECT 'text', COUNT(*),
      |       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       COUNT(DISTINCT text),
      |       CAST(SUM(length(text)) AS DOUBLE) / CAST(COUNT(text) AS DOUBLE)
      |FROM documents
      |ORDER BY column_name""".stripMargin) { (s, d) =>
    val cols = Seq("lang", "source", "text")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_null"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        sum(length(col(c)).cast("long")).as(s"${c}_lensum"),
        count(col(c)).as(s"${c}_nonnull"))
    }
    docs(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.sorted.map { c =>
        struct(
          lit(c).as("column_name"),
          col("n_rows"),
          col(s"${c}_null").as("n_null"),
          col(s"${c}_distinct").as("n_distinct"),
          (col(s"${c}_lensum").cast(DoubleType) /
            col(s"${c}_nonnull").cast(DoubleType)).as("avg_len"))
      }: _*)).as("m"))
      .select("m.*")
      .orderBy("column_name")
  }

  // q96 — q88's 100 TB form: identical profile, but the three exact
  // COUNT(DISTINCT)s become approx_count_distinct (HLL++), so the plan
  // has NO Expand — every metric is a bounded-memory partial aggregate
  // and the shuffle carries one sketch per column instead of ~4x the
  // input rows. Rows-only by construction (sketch estimates are
  // engine-specific, the q38/q35 pairing applied to profiling);
  // CorpusSpec pins agreement with exact q88 within the sketch's
  // documented error bound.
  val q96ProfileApprox: QueryDef = QueryDef.rowsOnly("q96_profile_approx") { (s, d) =>
    val cols = Seq("lang", "source", "text")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_null"),
        approx_count_distinct(col(c)).as(s"${c}_distinct"),
        sum(length(col(c)).cast("long")).as(s"${c}_lensum"),
        count(col(c)).as(s"${c}_nonnull"))
    }
    docs(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.sorted.map { c =>
        struct(
          lit(c).as("column_name"),
          col("n_rows"),
          col(s"${c}_null").as("n_null"),
          col(s"${c}_distinct").as("n_distinct"),
          (col(s"${c}_lensum").cast(DoubleType) /
            col(s"${c}_nonnull").cast(DoubleType)).as("avg_len"))
      }: _*)).as("m"))
      .select("m.*")
      .orderBy("column_name")
  }

  // q89 — incremental dedup: a new ingest batch (doc_id % 5 = 0 stands
  // in for "today's crawl") is deduped against the existing corpus by a
  // content key (leading-2-token prefix — the testdata's analog of a
  // normalized URL / content hash). The scale path is bloom-then-exact:
  // a Bloom filter over the corpus keys splits the batch into
  // definitely-new rows (bit-absent — no join needed, the common case)
  // and possibly-seen rows (the exact anti-join runs ONLY on these, so
  // the shuffle carries fpp + true-dup fraction of the batch, not the
  // batch). Bit-identical to the plain anti-join, which is what the
  // oracle runs.
  val q89IncrementalDedup: QueryDef = QueryDef.sql(
    "q89_incremental_dedup",
    """WITH k AS (
      |  SELECT doc_id, array_to_string(string_split(text, ' ')[1:2], ' ') AS key
      |  FROM documents),
      |corpus AS (SELECT DISTINCT key FROM k WHERE doc_id % 5 <> 0),
      |new_batch AS (SELECT doc_id, key FROM k WHERE doc_id % 5 = 0)
      |SELECT n.doc_id, n.key
      |FROM new_batch n ANTI JOIN corpus c ON n.key = c.key
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val keyed = docs(s, d).select(col("doc_id"),
      array_join(slice(split(col("text"), " "), 1, 2), " ").as("key"))
    val corpus = keyed.filter(col("doc_id") % 5 =!= 0).select("key").distinct()
    val newBatch = keyed.filter(col("doc_id") % 5 === 0)
    // bloom over the corpus keys (long form of the key for the probe;
    // the exact anti-join below still joins on the full key string)
    val bloom = BloomJoin.buildKeyBloom(
      corpus.select(md5Bucket(col("key"), Long.MaxValue).as("k")), "k",
      expectedKeys = BloomJoin.estimateRows(corpus))
    val probed = newBatch.withColumn("__maybe",
      graft.functions.GraftFunctions.bloomMightContain(
        md5Bucket(col("key"), Long.MaxValue), bloom))
    val definiteNew = probed.filter(!col("__maybe")).drop("__maybe")
    val survivors = probed.filter(col("__maybe")).drop("__maybe")
      .join(corpus, Seq("key"), "left_anti")
      .select("doc_id", "key")
    definiteNew.select("doc_id", "key").union(survivors).orderBy("doc_id")
  }

  // q98 — vocabulary heavy hitters, two-pass: pass 1 runs the
  // Misra-Gries sketch ([[graft.functions.FrequencySketch]], k=1000
  // counters) over the bigram stream — bounded memory per partition,
  // merge shuffles ONE ≤k-entry map per partition, and the guarantee
  // (no item with freq > n/(k+1) is dropped) makes the candidate set a
  // superset of the true phi=1/1000 heavy hitters; pass 2 re-counts
  // ONLY the candidates via a broadcast semi-join and applies the exact
  // threshold. Net: the full-shuffle groupBy over every distinct n-gram
  // (which at 100 TB is billions of keys) is replaced by two scans whose
  // shuffles carry ≤ k keys — and the result is EXACT, which is why a
  // plain GROUP BY/HAVING oracle can verify it.
  val q98HeavyHitters: QueryDef = QueryDef.sql(
    "q98_heavy_hitters",
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT array_to_string(t[i:i+1], ' ') AS g
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
      |  WHERE len(t) >= 2),
      |tot AS (SELECT COUNT(*) AS n FROM grams)
      |SELECT g AS gram, COUNT(*) AS n_occurrences
      |FROM grams
      |GROUP BY g
      |HAVING COUNT(*) * 1000 > (SELECT n FROM tot)
      |ORDER BY gram""".stripMargin) { (s, d) =>
    val n = 2
    val t = split(col("text"), " ")
    val grams = docs(s, d)
      .select(t.as("t"))
      .filter(size(col("t")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("t")) - n),
        i => array_join(slice(col("t"), i + 1, lit(n)), " "))).as("g"))
    val mg = udaf(new graft.functions.FrequencySketch.MisraGries(1000),
      org.apache.spark.sql.Encoders.STRING)
    // pass 1: sketch AND stream length in ONE aggregation (one scan);
    // n_total rides the broadcast with the candidates
    val candidates = grams
      .agg(mg(col("g")).as("cand"), count(lit(1)).as("n_total"))
      .select(explode(col("cand")).as("c"), col("n_total"))
      .select(col("c.token").as("g"), col("n_total"))
    grams
      .join(broadcast(candidates), "g")
      .groupBy("g", "n_total")
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * 1000 > col("n_total"))
      .select(col("g").as("gram"), col("n_occurrences"))
      .orderBy("gram")
  }

  // q99 — sequence packing: assign documents to fixed-token-budget
  // training shards (the "pack the corpus into 4096-token bins" stage
  // between curation and tokenization). Deterministic stream order
  // (doc_id) + a running token total per source; a document's bin is
  // where its FIRST token lands. Pure integer window arithmetic, so the
  // oracle reproduces it bit-for-bit.
  //
  // Scale shape: ONE keyed shuffle — the window partitions by source
  // (packing is per-source so shards never mix sources; also what keeps
  // the window parallel instead of a global sort). Within a source the
  // running sum is a linear pass over the sorted partition. Bin stats
  // aggregate map-side on (source, bin).
  val q99SequencePacking: QueryDef = QueryDef.sql(
    "q99_sequence_packing",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, source, n_tokens,
      |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
      |  FROM t)
      |SELECT source, CAST(start_tok // 4096 AS BIGINT) AS bin,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
      |FROM w
      |GROUP BY 1, 2
      |ORDER BY source, bin""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast(LongType).as("n_tokens"))
      .withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .groupBy(col("source"), floor(col("start_tok") / 4096).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("source", "bin")
  }

  // q141 — packed-bin MANIFEST: q99 aggregates bins; this emits the
  // per-document layout a training dataloader actually consumes — which
  // bin each doc starts in, its token offset WITHIN that bin, and how
  // many bins it spans (the cross-boundary docs are exactly where
  // attention masks / sequence resets must be placed; a doc with
  // n_bins > 1 continues into the next context window). Zero-token docs
  // occupy one logical slot so every doc appears in exactly one bin.
  //
  // Scale shape: q99's ONE keyed shuffle (per-source window over the
  // same sort), then pure projection arithmetic — the manifest costs
  // nothing beyond the packing pass itself.
  val q141BinManifest: QueryDef = QueryDef.sql(
    "q141_bin_manifest",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, source, n_tokens,
      |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
      |  FROM t)
      |SELECT doc_id, source, n_tokens,
      |       CAST(start_tok // 4096 AS BIGINT) AS bin,
      |       CAST(start_tok % 4096 AS BIGINT) AS bin_offset,
      |       CAST((start_tok + greatest(n_tokens, 1) - 1) // 4096
      |            - start_tok // 4096 + 1 AS BIGINT) AS n_bins
      |FROM w
      |ORDER BY source, bin, bin_offset, doc_id""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast(LongType).as("n_tokens"))
      .withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("start_tok") / 4096).cast(LongType).as("bin"),
        (col("start_tok") % 4096).cast(LongType).as("bin_offset"),
        (floor((col("start_tok") + greatest(col("n_tokens"), lit(1L)) - 1) / 4096)
          - floor(col("start_tok") / 4096) + 1).cast(LongType).as("n_bins"))
      .orderBy("source", "bin", "bin_offset", "doc_id")
  }

  // q100 — deterministic stratified train/val/test split: each document
  // lands in exactly one split by its md5 bucket (q67's seedless-hash
  // kernel), with the ratio applied WITHIN each source so every stratum
  // keeps the same 90/5/5 proportions regardless of how skewed the
  // source mix is. A pure projection-time decision — reproducible across
  // runs, retries, partitionings, and engines, which is the property a
  // train/test boundary must have (a rerun that reshuffles eval docs
  // into train is silent contamination).
  //
  // Scale shape: one scan, zero joins; the summary aggregates map-side
  // on (source, split).
  val q100TrainSplit: QueryDef = QueryDef.sql(
    "q100_train_split",
    """WITH b AS (
      |  SELECT source, n_chars,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
      |  FROM documents),
      |s AS (
      |  SELECT source, n_chars,
      |         CASE WHEN bucket < 90 THEN 'train'
      |              WHEN bucket < 95 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM b)
      |SELECT source, split, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM s
      |GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin) { (s, d) =>
    val bucket = md5Bucket(col("doc_id").cast("string"), 100L)
    docs(s, d)
      .select(col("source"), col("n_chars"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("source", "split")
  }

  /** q92's ordered rule cascade as a single projection-time expression —
    * shared with the streaming ingest path
    * ([[graft.streaming.EventStream.corpusIngestStream]]), so batch and
    * stream apply bit-identical quality semantics by construction.
    */
  def dropReason(text: Column, nChars: Column, lang: Column): Column = {
    val w = split(text, " ")
    when(nChars < 80, "1_too_short")
      .when(!lang.isin("en", "zh"), "2_non_target_lang")
      .when(size(array_distinct(w)) * 10 < size(w) * 4, "3_too_repetitive")
      .otherwise("0_kept")
  }

  // q92 — quality filter cascade: ordered drop rules with first-failing-
  // rule attribution — the corpus-filtering stage's audit artifact. The
  // CASE evaluates rules in declared order on both engines, so every
  // document lands in exactly one bucket and the per-rule counts answer
  // "what is each rule costing me" directly. Thresholds use integer
  // arithmetic only (diversity*10 < tokens*4 instead of a float ratio)
  // so no float compare crosses engines.
  //
  // Scale shape: ONE scan, all rules are projection-time expressions
  // (no UDF, no join), the summary is a map-side-combinable count per
  // reason — the cheapest possible full-corpus audit. The per-document
  // labeled form is the same projection without the final aggregate.
  val q92FilterCascade: QueryDef = QueryDef.sql(
    "q92_filter_cascade",
    """WITH labeled AS (
      |  SELECT CASE
      |    WHEN n_chars < 80 THEN '1_too_short'
      |    WHEN lang NOT IN ('en', 'zh') THEN '2_non_target_lang'
      |    WHEN len(list_distinct(string_split(text, ' '))) * 10
      |         < len(string_split(text, ' ')) * 4 THEN '3_too_repetitive'
      |    ELSE '0_kept' END AS drop_reason,
      |    n_chars
      |  FROM documents)
      |SELECT drop_reason, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM labeled
      |GROUP BY 1
      |ORDER BY drop_reason""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(dropReason(col("text"), col("n_chars"), col("lang")).as("drop_reason"),
        col("n_chars"))
      .groupBy("drop_reason")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("drop_reason")
  }

  // q105 — cross-document duplicated-span report (the substring-level
  // dedup measurement of "Deduplicating Training Data Makes Language
  // Models Better", Lee et al. 2021): for every document, how many of
  // its 5-token span positions also occur in at least one OTHER
  // document. Complements q101 (intra-doc repetition) and q24 (doc-pair
  // similarity): this is the per-position boilerplate measure a
  // substring-dedup pass would act on.
  //
  // Scale shape: spans are built per-row with HOFs (no explode until the
  // span stream is needed), then every stage is a KEYED shuffle —
  // distinct (doc, span), span-frequency count, semi-join back, per-doc
  // count. Span payload is bounded (5 tokens); nothing is all-pairs.
  val q105DupSpans: QueryDef = QueryDef.sql(
    "q105_dup_spans",
    """WITH t AS (SELECT doc_id,
      |             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id,
      |             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
      |               || toks[i+3] || ' ' || toks[i+4] AS span
      |      FROM t, generate_series(1, 4000) s(i) WHERE i <= len(toks) - 4),
      |multi AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM g)
      |          GROUP BY span HAVING COUNT(*) >= 2),
      |dup AS (SELECT doc_id, COUNT(*) AS n_dup FROM g
      |        WHERE span IN (SELECT span FROM multi) GROUP BY doc_id),
      |tot AS (SELECT doc_id, len(toks) - 4 AS n_spans FROM t WHERE len(toks) >= 5)
      |SELECT tot.doc_id, CAST(n_spans AS BIGINT) AS n_spans,
      |       CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_spans,
      |       CAST(COALESCE(n_dup, 0) AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_span_frac
      |FROM tot LEFT JOIN dup ON tot.doc_id = dup.doc_id
      |ORDER BY tot.doc_id""".stripMargin) { (s, d) =>
    val t = docs(s, d)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .withColumn("spans", expr(
        """CASE WHEN size(toks) >= 5 THEN
          |  transform(sequence(1, size(toks) - 4), i ->
          |    concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
          |              element_at(toks, i + 2), element_at(toks, i + 3),
          |              element_at(toks, i + 4)))
          |ELSE array() END""".stripMargin))
    val g = t.select(col("doc_id"), explode(col("spans")).as("span"))
    val multi = g.distinct()
      .groupBy("span").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select("span")
    val dup = g.join(multi, "span")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    t.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), (size(col("toks")) - 4).cast(LongType).as("n_spans"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_spans"),
        (coalesce(col("n_dup"), lit(0L)).cast(DoubleType)
          / col("n_spans").cast(DoubleType)).as("dup_span_frac"))
      .orderBy("doc_id")
  }

  // q116 — deterministic shard assignment: the global shuffle every
  // training pipeline ends with. Docs are scattered across N shards by a
  // deterministic mix of the key (an LCG both engines compute identically
  // in exact BIGINT arithmetic — Spark's murmur hash has no DuckDB twin),
  // and each shard is internally ordered by the same mixed key, which is
  // what breaks source/time locality in the training stream.
  //
  // Scale shape: this is physically `repartition(N, shard)` +
  // `sortWithinPartitions(s)` + write — ONE hash exchange of the final
  // (already filtered/deduped) corpus, in-partition sort, no driver
  // involvement. The window below is partitioned by `shard` so the plan
  // is exactly that exchange + sort; N here is 8 for the testdata, at
  // 100 TB N is thousands (shard ≈ output file), so the exchange has no
  // skew by construction — the LCG is uniform.
  val q116ShardAssign: QueryDef = QueryDef.sql(
    "q116_shard_assign",
    """WITH k AS (SELECT doc_id,
      |             (doc_id * 1103515245 + 12345) % 2147483648 AS s
      |           FROM documents)
      |SELECT doc_id, CAST(s % 8 AS INTEGER) AS shard,
      |       CAST(row_number() OVER (PARTITION BY s % 8
      |                               ORDER BY s, doc_id) AS INTEGER) AS pos
      |FROM k
      |ORDER BY shard, pos""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val keyed = docs(s, d).select(col("doc_id"),
      ((col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)).as("s"))
    val w = Window.partitionBy(col("s") % 8).orderBy(col("s"), col("doc_id"))
    keyed
      .select(col("doc_id"), (col("s") % 8).cast("int").as("shard"),
        row_number().over(w).cast("int").as("pos"))
      .orderBy("shard", "pos")
  }

  // q117 — unigram-LM rarity filter: the CCNet-style "perplexity" quality
  // gate, with the LM built from the corpus itself. Per-token corpus
  // frequencies are aggregated once, joined back, and each document is
  // scored by its mean token frequency — documents whose tokens are
  // rarer than the corpus average (gibberish, OOD boilerplate) flag as
  // below_avg. All aggregation is exact BIGINT (order-insensitive); the
  // only double is one IEEE division of those exact integers, so the
  // DuckDB hash-compare is deterministic. The below_avg flag is a pure
  // integer cross-comparison (mass·total_toks < n_toks·total_mass) —
  // no float threshold at all. Headroom: the cross-products stay under
  // 2^63 up to ~sf100 corpus sizes; beyond that the flag becomes a
  // decimal compare, same plan.
  //
  // Scale shape: tokenize ONCE into per-doc tf (the same compressed form
  // q52 reuses); corpus frequency derives from tf (a keyed re-agg of the
  // compressed pairs, not a second raw-token shuffle); the tf⋈cf join
  // broadcasts cf — vocabulary is Zipf-bounded, so even web-scale corpora
  // have a broadcastable token table relative to the corpus (fall back to
  // a keyed join on tok if not, same semantics); the per-doc score is a
  // map-side partial sum. One corpus scan end-to-end.
  val q117DocRarity: QueryDef = QueryDef.sql(
    "q117_doc_rarity",
    """WITH toks AS (SELECT doc_id, tok
      |              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |                    FROM documents)
      |              WHERE tok <> ''),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
      |doc AS (SELECT tf.doc_id,
      |               CAST(SUM(tf.tf) AS BIGINT) AS n_toks,
      |               CAST(SUM(tf.tf * cf.cf) AS BIGINT) AS freq_mass
      |        FROM tf JOIN cf USING (tok) GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS total_toks,
      |               CAST(SUM(freq_mass) AS BIGINT) AS total_mass FROM doc)
      |SELECT doc_id, n_toks, freq_mass,
      |       CAST(freq_mass AS DOUBLE) / CAST(n_toks AS DOUBLE) AS avg_tok_freq,
      |       (freq_mass * total_toks < n_toks * total_mass) AS below_avg
      |FROM doc CROSS JOIN tot
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("tok").agg(sum("tf").as("cf"))
    val doc = tf.join(broadcast(cf), "tok")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_toks"), sum(col("tf") * col("cf")).as("freq_mass"))
    val tot = doc.agg(sum("n_toks").as("total_toks"), sum("freq_mass").as("total_mass"))
    doc.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_toks"), col("freq_mass"),
        (col("freq_mass").cast(DoubleType) / col("n_toks").cast(DoubleType))
          .as("avg_tok_freq"),
        (col("freq_mass") * col("total_toks") < col("n_toks") * col("total_mass"))
          .as("below_avg"))
      .orderBy("doc_id")
  }

  // q142 — bigram-LM fluency/novelty scoring: q117's unigram rarity
  // gate raised to second order, the cheap stand-in for the KenLM-style
  // perplexity filter CCNet runs. The LM is the corpus's own adjacent-
  // pair frequencies; each document is scored by its mean bigram
  // frequency (fluent text reuses common transitions; gibberish and
  // shuffled boilerplate do not) plus its NOVEL-bigram count (pairs
  // occurring nowhere else in the corpus — high novelty and low mean
  // frequency together flag out-of-distribution text). Like q117, every
  // aggregate is exact BIGINT; the only double is one IEEE division of
  // exact integers, the novelty ratio is integer basis points, and the
  // below-average flag is a pure integer cross-comparison — nothing
  // transcendental, so the DuckDB hash-compare is exact.
  //
  // Scale shape: bigram extraction is a per-row fan-out (the q111
  // constant-bounded position trick, shared by the twin); counting is
  // ONE keyed agg. Unlike q117's unigram table, the BIGRAM vocabulary is
  // quadratic in vocab and is NOT broadcastable at corpus scale, so the
  // count join-back is a plain keyed shuffle join on the bigram — the
  // deliberate contrast with q117's broadcast (both forms exist so the
  // right one is available at either scale; AQE still broadcasts this
  // one at test scale, where the table is tiny). The per-doc score is a
  // map-side partial sum; the grand totals are a 1-row broadcast. The
  // integer cross-products stay under 2^63 to ~sf100; past that the
  // flag becomes a decimal compare, same plan.
  val q142BigramLm: QueryDef = QueryDef.sql(
    "q142_bigram_lm",
    """WITH t AS (SELECT doc_id,
      |             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |           FROM documents),
      |bi AS (SELECT doc_id, toks[s] || ' ' || toks[s + 1] AS bigram
      |       FROM t, generate_series(1, 4000) g(s)
      |       WHERE s <= len(toks) - 1),
      |bf AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY 1),
      |doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bi,
      |               CAST(SUM(c12) AS BIGINT) AS bigram_mass,
      |               CAST(SUM(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |                 AS novel_bigrams
      |        FROM bi JOIN bf USING (bigram) GROUP BY 1),
      |base AS (SELECT d.doc_id,
      |                COALESCE(doc.n_bi, 0) AS n_bi,
      |                COALESCE(doc.bigram_mass, 0) AS bigram_mass,
      |                COALESCE(doc.novel_bigrams, 0) AS novel_bigrams
      |         FROM documents d LEFT JOIN doc ON d.doc_id = doc.doc_id),
      |tot AS (SELECT CAST(SUM(n_bi) AS BIGINT) AS total_bi,
      |               CAST(SUM(bigram_mass) AS BIGINT) AS total_mass FROM base)
      |SELECT doc_id, n_bi, bigram_mass, novel_bigrams,
      |       CASE WHEN n_bi > 0
      |            THEN CAST(bigram_mass AS DOUBLE) / CAST(n_bi AS DOUBLE) END
      |         AS avg_bigram_freq,
      |       CASE WHEN n_bi > 0 THEN novel_bigrams * 10000 // n_bi END AS novel_bp,
      |       (bigram_mass * total_bi < n_bi * total_mass) AS below_avg
      |FROM base CROSS JOIN tot
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"),
      filter(split(col("text"), " "), x => x =!= "").as("toks"))
    // ONE corpus scan: explode_OUTER keeps a (doc_id, null) row for
    // <2-token docs, so document coverage survives the whole pipeline
    // without a second scan for the doc spine. The position sequence is
    // guarded because Spark's sequence(1, 0) runs DESCENDING ([1, 0]) —
    // a <2-token doc must yield NULL, not two phantom positions.
    val bi = t
      .select(col("doc_id"), col("toks"),
        explode_outer(when(size(col("toks")) >= 2,
          sequence(lit(1), least(size(col("toks")) - 1, lit(4000))))).as("s"))
      .select(col("doc_id"),
        when(col("s").isNotNull,
          concat(element_at(col("toks"), col("s")), lit(" "),
            element_at(col("toks"), col("s") + 1))).as("bigram"))
    // Compress to per-doc bigram term frequencies FIRST (the q117/q52
    // tf pattern): btf's aggregation exchange is the reuse point both
    // downstream consumers read, so the corpus text is scanned once.
    val btf = bi.groupBy("doc_id", "bigram").agg(count(lit(1)).as("tf"))
    // Keyed (NOT broadcast) count join-back: the bigram table grows
    // ~squared in the unigram vocabulary and outgrows any broadcast
    // threshold at corpus scale — contrast q117, where the unigram
    // table broadcasts. A null bigram (bigram-less doc) never matches,
    // so its c12 stays null and scores below as zeros.
    val bf = btf.filter(col("bigram").isNotNull)
      .groupBy("bigram").agg(sum("tf").as("c12"))
    val perDoc = btf.join(bf, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("bigram").isNotNull, col("tf")).otherwise(0L)).as("n_bi"),
        sum(when(col("bigram").isNotNull, col("tf") * col("c12")).otherwise(0L))
          .as("bigram_mass"),
        // a corpus-unique bigram has c12 == 1 == tf, so summing tf over
        // c12==1 counts exactly the novel POSITIONS
        sum(when(col("c12") === 1, col("tf")).otherwise(0L)).as("novel_bigrams"))
    val tot = perDoc.agg(sum("n_bi").as("total_bi"),
      sum("bigram_mass").as("total_mass"))
    perDoc.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_bi"), col("bigram_mass"), col("novel_bigrams"),
        when(col("n_bi") > 0,
          col("bigram_mass").cast(DoubleType) / col("n_bi").cast(DoubleType))
          .as("avg_bigram_freq"),
        when(col("n_bi") > 0, expr("novel_bigrams * 10000 div n_bi")).as("novel_bp"),
        (col("bigram_mass") * col("total_bi") < col("n_bi") * col("total_mass"))
          .as("below_avg"))
      .orderBy("doc_id")
  }

  // q118 — boilerplate prefix stripping: the REWRITE counterpart to
  // q105's dup-span report. Shared document openings (site headers,
  // license banners, template preambles) are found by counting k-token
  // prefixes across the corpus; any prefix shared by >= `thr` documents
  // is treated as boilerplate and stripped from the emitted text. k = 2
  // and thr = 2 keep the testdata signal dense (real pipelines run
  // longer prefixes and much higher thresholds — both are knobs, the
  // plan shape is identical). Output text is re-joined from tokens on
  // BOTH engines, so stripped and unstripped rows compare bit-exactly.
  //
  // Scale shape: TWO passes over text, like every census-then-rewrite
  // op (q110's pattern): pass 1 is the prefix census — a keyed agg of
  // 2-token strings, one row per doc before the agg, one per distinct
  // prefix after; the surviving boilerplate set is small by construction
  // (it's the head of a Zipf curve) so pass 2 flags + strips via a
  // BROADCAST left join — the corpus side never shuffles. The second
  // scan is the cost of not caching the corpus, which at 100 TB is the
  // right trade; no all-pairs anywhere.
  val q118BoilerplateStrip: QueryDef = QueryDef.sql(
    "q118_boilerplate_strip",
    """WITH t AS (SELECT doc_id,
      |             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |           FROM documents),
      |p AS (SELECT doc_id, toks,
      |             CASE WHEN len(toks) >= 2
      |                  THEN array_to_string(toks[1:2], ' ') END AS pre
      |      FROM t),
      |c AS (SELECT pre FROM p WHERE pre IS NOT NULL
      |      GROUP BY 1 HAVING COUNT(*) >= 2)
      |SELECT doc_id, (c.pre IS NOT NULL) AS boilerplate,
      |       CASE WHEN c.pre IS NOT NULL THEN array_to_string(toks[3:], ' ')
      |            ELSE array_to_string(toks, ' ') END AS text_clean
      |FROM p LEFT JOIN c USING (pre)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val p = docs(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .withColumn("pre",
        when(size(col("toks")) >= 2,
          concat_ws(" ", element_at(col("toks"), 1), element_at(col("toks"), 2))))
    val common = p.filter(col("pre").isNotNull)
      .groupBy("pre").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("pre"), lit(true).as("hit"))
    p.join(broadcast(common), Seq("pre"), "left")
      .select(col("doc_id"),
        coalesce(col("hit"), lit(false)).as("boilerplate"),
        when(col("hit"),
          array_join(expr("slice(toks, 3, greatest(size(toks) - 2, 0))"), " "))
          .otherwise(array_join(col("toks"), " ")).as("text_clean"))
      .orderBy("doc_id")
  }

  // q120 — per-domain cap: no source may contribute more than K
  // documents to the mix (the anti-domination guard — without it one
  // crawler-friendly domain swamps the corpus). Survivors are chosen by
  // deterministic md5 priority, NOT arrival order: a cap applied in scan
  // order keeps whatever the ingest happened to read first, which is a
  // time/layout bias; hash priority is an unbiased without-replacement
  // sample, reproducible across runs and engines. K = 10 exercises both
  // branches on the testdata (25 docs/source at sf0.01).
  //
  // Scale shape: q47's one-window shape — a single exchange keyed on
  // source, per-partition top-K under row_number. A mega-domain makes
  // that window partition the straggler; the fix at 100 TB is q110's
  // two-pass histogram cut (bucket the priorities, window the tiny
  // histogram, broadcast offsets), same answer by construction.
  val q120DomainCap: QueryDef = QueryDef.sql(
    "q120_domain_cap",
    """WITH p AS (
      |  SELECT doc_id, source,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS prio
      |  FROM documents)
      |SELECT doc_id, source
      |FROM (SELECT doc_id, source,
      |             row_number() OVER (PARTITION BY source
      |                                ORDER BY prio, doc_id) AS rnk
      |      FROM p)
      |WHERE rnk <= 10
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val prio = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast(LongType)
    val w = Window.partitionBy("source").orderBy(col("prio"), col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("source"), prio.as("prio"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  // q121 — deterministic negative sampling for contrastive training:
  // each document gets K "negative" partners chosen pseudo-randomly but
  // reproducibly (a reshuffling rerun must pair the same negatives, or
  // eval runs aren't comparable). Docs are scattered into B hash buckets;
  // each bucket elects a representative (min md5 priority); doc d's
  // negatives are the representatives of its next K buckets on the ring.
  // Hash scatter makes the pairing as-if-random; the ring walk makes it
  // collision-free (a rep is never in its probe's own bucket, so no
  // self-pair) and total.
  //
  // Scale shape: NO global window and no self-join — the rep election is
  // a keyed agg to B rows (B is a knob, thousands at 100 TB), the rep
  // table broadcasts, and pairing is a map-side join + bounded explode.
  // Compare the naive forms this replaces: orderBy+row_number (single
  // partition) or a shuffled self-join (quadratic candidates).
  val q121NegativePairs: QueryDef = QueryDef.sql(
    "q121_negative_pairs",
    """WITH p AS (
      |  SELECT doc_id,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS prio
      |  FROM documents),
      |b AS (SELECT doc_id, prio, prio % 64 AS bucket FROM p),
      |reps AS (
      |  SELECT bucket, doc_id AS rep_id
      |  FROM (SELECT bucket, doc_id,
      |               row_number() OVER (PARTITION BY bucket
      |                                  ORDER BY prio, doc_id) AS rn
      |        FROM b)
      |  WHERE rn = 1)
      |SELECT b.doc_id, CAST(j AS INTEGER) AS neg_rank, reps.rep_id AS neg_id
      |FROM b, UNNEST([1, 2, 3]) AS t(j)
      |JOIN reps ON reps.bucket = (b.bucket + j) % 64
      |ORDER BY doc_id, neg_rank""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val prio = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast(LongType)
    val b = docs(s, d)
      .select(col("doc_id"), prio.as("prio"))
      .withColumn("bucket", col("prio") % 64)
    val w = Window.partitionBy("bucket").orderBy(col("prio"), col("doc_id"))
    val reps = b.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("bucket").as("rep_bucket"), col("doc_id").as("rep_id"))
    b.select(col("doc_id"), col("bucket"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .join(broadcast(reps), (col("bucket") + col("j")) % 64 === col("rep_bucket"))
      .select(col("doc_id"), col("j").cast("int").as("neg_rank"),
        col("rep_id").as("neg_id"))
      .orderBy("doc_id", "neg_rank")
  }

  // q122 — BPE merge-candidate counting, the inner loop of tokenizer
  // training: count every adjacent character pair across the corpus and
  // rank the top merges. The classic implementation detail (Sennrich et
  // al. 2016, public BPE trainers since) is that pair counts are computed
  // over the WORD FREQUENCY table, not the token stream — identical words
  // contribute identical pairs, so aggregate words first and weight each
  // word's pairs by its count.
  //
  // Scale shape: that pre-agg is exactly what makes this 100 TB-safe —
  // the token stream is corpus-sized but the vocabulary is Zipfian
  // (millions of rows, not trillions), so the expensive pair explode runs
  // over the vocab table. Two keyed shuffles (word, then pair), both with
  // map-side partial aggregation; the top-50 is TakeOrderedAndProject
  // (per-partition heaps, no global sort materialization).
  val q122BpePairs: QueryDef = QueryDef.sql(
    "q122_bpe_pairs",
    """WITH words AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (
      |  SELECT w, count(*) AS wn FROM words WHERE len(w) >= 2 GROUP BY w),
      |pairs AS (
      |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, wn
      |  FROM wc CROSS JOIN UNNEST(range(1, len(w))) AS t(i))
      |SELECT pair, CAST(sum(wn) AS BIGINT) AS cnt
      |FROM pairs GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin) { (s, d) =>
    val wc = docs(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wn"))
    wc.select(
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"),
        col("wn"))
      .groupBy("pair").agg(sum("wn").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
  }

  // q138 — BPE ENCODE, the other half of q122: train a 50-merge table
  // on the word-frequency vocabulary (driver-side iterative model fit —
  // the Zipf-bounded vocab makes the loop cheap, the same model-state
  // pattern as the k-means centroid loop), then tokenize every document
  // with the learned table in ONE codegen'd projection. This is the
  // tokenizer pass a training pipeline runs corpus-wide — q29's
  // whitespace count approximates token budgets; this produces the
  // actual subword stream those budgets meter.
  //
  // Scale shape: training reads only the (word, freq) agg (one keyed
  // shuffle, Zipf-bounded collect); encoding is a per-row expression
  // with the rank table shipped once per task as a codegen reference
  // object — no shuffle, no UDF closure per row. No SQL oracle (the
  // greedy merge loop is not expressible in DuckDB SQL) — CorpusSpec
  // cross-checks against an independent reference implementation.
  val q138BpeEncode: QueryDef = QueryDef.rowsOnly("q138_bpe_encode") { (s, d) =>
    val merges = trainBpe(s, d, 50)
    val toks = graft.functions.GraftFunctions.bpeEncode(col("text"), merges)
    docs(s, d)
      .select(col("doc_id"), toks.as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_bpe_tokens"),
        // empty/whitespace-only docs have no tokens: null boundaries,
        // not an ANSI array-index error
        when(size(col("t")) > 0, element_at(col("t"), 1)).as("first_token"),
        when(size(col("t")) > 0, element_at(col("t"), -1)).as("last_token"))
      .orderBy("doc_id")
  }

  /** Upper bound on the word-frequency table [[trainBpe]] collects. At
    * corpus scale the distinct-"word" count is NOT Zipf-bounded the way
    * the pair alphabet is — URLs, typos, and unicode junk push it into
    * the billions — so an uncapped collect OOMs the driver. A top-N by
    * frequency keeps the collect bounded at ANY corpus size while
    * leaving the learned merges unchanged: a word below the cut
    * contributes at most its own frequency to any pair's mass, which at
    * this N is noise against the head words' counts (CorpusSpec pins
    * cap-invariance at test scale and bounded collect on a synthetic
    * heavy-tail vocabulary).
    */
  val BpeMaxTrainVocab: Int = 1 << 18

  /** The engine-side word-frequency vocabulary both training modes
    * start from: one keyed shuffle over the tokenized corpus.
    */
  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Train `nMerges` BPE merges on the corpus vocabulary (driver-side
    * iterative fit over the word-frequency table; deterministic
    * tie-breaks — see [[graft.functions.BpeKernel.train]]). The collect
    * is bounded by `maxVocab` — top-N words by frequency via
    * `TakeOrderedAndProject` (ties broken on the word so the cut is
    * deterministic); see [[BpeMaxTrainVocab]] for why the cap is safe.
    * For a vocabulary too large even for the capped collect, use
    * [[trainBpeDistributed]] — same merges, per-round engine rounds.
    */
  private[graft] def trainBpe(s: SparkSession, d: String, nMerges: Int,
      maxVocab: Int = BpeMaxTrainVocab): Seq[(String, String)] = {
    val vocab = bpeVocab(s, d)
      .orderBy(col("f").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.BpeKernel.train(vocab, nMerges)
  }

  /** Fully distributed BPE training: the vocabulary never leaves the
    * engine — each round ships ONE row (the adopted pair) to the driver
    * ([[graft.functions.BpeKernel.trainDistributed]]). The initial
    * character split reuses the encode kernel with an empty merge table
    * so driver and engine can never disagree on the alphabet.
    */
  private[graft] def trainBpeDistributed(s: SparkSession, d: String,
      nMerges: Int): Seq[(String, String)] = {
    val vocab = bpeVocab(s, d).select(
      graft.functions.GraftFunctions.bpeEncode(col("w"), Seq.empty).as("toks"),
      col("f"))
    graft.functions.BpeKernel.trainDistributed(vocab, nMerges)
  }

  // q124 — fractional per-source upsampling: materialize the "epochs per
  // source" plan of a training-data recipe. Each source carries a repeat
  // factor f (here derived from the source id — {1.0, 1.5, 2.0, 2.5} in
  // tenths so the arithmetic stays integer; a real recipe broadcasts a
  // tiny factor table, same plan): every doc appears floor(f) times, and
  // the fractional remainder selects an extra copy for exactly that
  // share of docs by md5 hash — deterministic, so a rerun materializes
  // the identical epoch plan (random()-based upsampling can't be
  // checkpointed or audited).
  //
  // Scale shape: q87 down-selects a mixture; this is its upsampling
  // twin. ZERO data shuffle — repeat count is a per-row projection and
  // the copies are a bounded explode (≤ ceil(f) per doc); contrast
  // union-per-epoch (re-scans the corpus ceil(f) times) or rand()
  // sampling (irreproducible). The output sort is the only exchange.
  val q124UpsampleMix: QueryDef = QueryDef.sql(
    "q124_upsample_mix",
    """WITH f AS (
      |  SELECT doc_id, source,
      |         10 + (CAST(substr(source, 4) AS BIGINT) % 4) * 5 AS f10
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, f10,
      |         CAST(f10 // 10
      |              + CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |                            AS BIGINT) % 10 < f10 % 10
      |                     THEN 1 ELSE 0 END AS INTEGER) AS n_copies
      |  FROM f)
      |SELECT doc_id, source, n_copies, CAST(i AS INTEGER) AS copy_idx
      |FROM c CROSS JOIN UNNEST(range(1, n_copies + 1)) AS t(i)
      |ORDER BY doc_id, copy_idx""".stripMargin) { (s, d) =>
    val f10 = (lit(10) + substring(col("source"), 4, 10).cast(LongType) % 4 * 5)
    val extra = when(md5Bucket(col("doc_id").cast("string"), 10L) < col("f10") % 10, 1)
      .otherwise(0)
    docs(s, d)
      .select(col("doc_id"), col("source"), f10.as("f10"))
      .withColumn("n_copies", ((col("f10") / 10).cast(LongType) + extra).cast("int"))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  // q127 — padding-waste report: the exact token count every batch pads
  // away under naive (arrival-order) vs length-sorted batching — THE
  // standard argument for length-bucketed batch assembly, computed as a
  // query instead of asserted. Batches of 8 within each source (ragged tail allowed);
  // waste = n_docs·max_toks − sum_toks, all integer arithmetic.
  //
  // Scale shape: one scan, ONE source-keyed exchange shared by both
  // strategies (two row_numbers over the SAME partitioning, different
  // orderings — Spark reuses the exchange, pays two in-partition sorts),
  // then a per-doc 2-row explode and a keyed agg. Batching within
  // source keeps the window parallel — a GLOBAL batch id would serialize
  // into one window task (q99's lesson); real shard assembly batches
  // within shards anyway (q116 scatters first).
  val q127PaddingWaste: QueryDef = QueryDef.sql(
    "q127_padding_waste",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_toks
      |  FROM documents),
      |r AS (
      |  SELECT source, n_toks,
      |         CAST((row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 8
      |              AS INTEGER) AS naive_b,
      |         CAST((row_number() OVER (PARTITION BY source ORDER BY n_toks, doc_id) - 1) // 8
      |              AS INTEGER) AS sorted_b
      |  FROM t),
      |u AS (
      |  SELECT 'naive' AS strategy, source, naive_b AS batch_id, n_toks FROM r
      |  UNION ALL
      |  SELECT 'sorted' AS strategy, source, sorted_b AS batch_id, n_toks FROM r)
      |SELECT strategy, source, batch_id,
      |       COUNT(*) AS n_docs, MAX(n_toks) AS max_toks,
      |       CAST(COUNT(*) * MAX(n_toks) - SUM(n_toks) AS BIGINT) AS waste
      |FROM u GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy("source")
    val t = docs(s, d).select(col("doc_id"), col("source"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast(LongType).as("n_toks"))
    t.withColumn("naive_b",
        ((row_number().over(bySrc.orderBy("doc_id")) - 1) / 8).cast(IntegerType))
      .withColumn("sorted_b",
        ((row_number().over(bySrc.orderBy("n_toks", "doc_id")) - 1) / 8).cast(IntegerType))
      .select(col("source"), col("n_toks"), explode(array(
        struct(lit("naive").as("strategy"), col("naive_b").as("batch_id")),
        struct(lit("sorted").as("strategy"), col("sorted_b").as("batch_id")))).as("sb"))
      .groupBy(col("sb.strategy").as("strategy"), col("source"),
        col("sb.batch_id").as("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max("n_toks").as("max_toks"),
        (count(lit(1)) * max("n_toks") - sum("n_toks")).as("waste"))
      .orderBy("strategy", "source", "batch_id")
  }

  // q131 — n-gram NOVELTY CURVE: how many never-seen-before unique word
  // 3-grams each successive ingestion batch contributes (batch = doc_id
  // % 10 standing in for ingestion days, as in q89). The saturation
  // diagnostic for a growing corpus: when new batches stop adding novel
  // n-grams, more of the same source buys no diversity — the metric
  // behind "we've exhausted this crawl" decisions. (3-grams, not single
  // tokens: the token vocabulary saturates in the first batch on any
  // corpus — the phrase space is what keeps discriminating.) first_batch
  // is a min-aggregate, so the curve is exact and order-independent.
  //
  // Scale shape: ONE gram-keyed shuffle with map-side partial min (the
  // same shape as any tf/cf aggregate — no distinct-explosion); the
  // curve itself is a |batches|-row aggregate, cumulative size via a
  // window over those few rows.
  val q131NoveltyCurve: QueryDef = QueryDef.sql(
    "q131_novelty_curve",
    """WITH t AS (
      |  SELECT doc_id % 10 AS batch, string_split(text, ' ') AS tk FROM documents),
      |grams AS (
      |  SELECT batch, array_to_string(tk[i:i+2], ' ') AS g
      |  FROM t, UNNEST(range(1, len(tk) - 1)) AS u(i)
      |  WHERE len(tk) >= 3),
      |first_seen AS (
      |  SELECT g, CAST(MIN(batch) AS BIGINT) AS first_batch
      |  FROM grams GROUP BY g),
      |curve AS (
      |  SELECT first_batch AS batch, COUNT(*) AS new_grams
      |  FROM first_seen GROUP BY 1)
      |SELECT batch, new_grams,
      |       CAST(SUM(new_grams) OVER (ORDER BY batch) AS BIGINT) AS gram_space
      |FROM curve
      |ORDER BY batch""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = split(col("text"), " ")
    docs(s, d)
      .select((col("doc_id") % 10).as("batch"), t.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("batch"), explode(transform(
        sequence(lit(0), size(col("t")) - 3),
        i => array_join(slice(col("t"), i + 1, lit(3)), " "))).as("g"))
      .groupBy("g").agg(min("batch").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("new_grams"))
      .withColumn("gram_space",
        sum("new_grams").over(Window.orderBy("batch")))
      .orderBy("batch")
  }

  // q132 — contamination MASKING: the rewrite twin of q86's report.
  // Dropping every doc that brushes a benchmark loses whole documents
  // for one quoted sentence; the surgical form masks exactly the
  // overlapping token SPANS (every token covered by a benchmark-matching
  // 3-gram → a sentinel) and keeps the rest — q118's census-then-rewrite
  // shape applied to eval decontamination (Lee et al.'s span-level
  // treatment). Deterministic: masked positions are a pure function of
  // the data, and the rewrite re-joins from tokens on BOTH engines so
  // masked/unmasked rows compare bit-exactly.
  //
  // Scale shape: the benchmark gram set is tiny (evals are small) →
  // broadcast semi-probe, corpus grams never shuffle; hit positions
  // aggregate per contaminated doc (keyed agg on the SMALL hit set);
  // the rewrite is one more corpus scan joined to that small position
  // table (broadcast when it fits, keyed join on doc_id otherwise) —
  // two passes total, the same census-then-rewrite cost as q118.
  val q132ContaminationMask: QueryDef = QueryDef.sql(
    "q132_contamination_mask",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |g AS (SELECT doc_id, i, array_to_string(tk[i:i+2], ' ') AS g
      |      FROM t, UNNEST(range(1, len(tk) - 1)) AS u(i)
      |      WHERE len(tk) >= 3),
      |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
      |hits AS (SELECT g.doc_id, g.i FROM g JOIN bench USING (g)
      |         WHERE g.doc_id % 97 <> 0),
      |maskpos AS (SELECT DISTINCT doc_id, i + o AS p
      |            FROM hits, UNNEST([0, 1, 2]) AS v(o)),
      |plists AS (SELECT doc_id, list(p ORDER BY p) AS plist
      |           FROM maskpos GROUP BY 1)
      |SELECT t.doc_id,
      |       array_to_string(list_transform(range(1, len(tk) + 1),
      |         p -> CASE WHEN list_contains(COALESCE(plist, []), p)
      |                   THEN '<masked>' ELSE tk[p] END), ' ') AS masked_text,
      |       CAST(COALESCE(len(plist), 0) AS INTEGER) AS n_masked
      |FROM t LEFT JOIN plists USING (doc_id)
      |WHERE t.doc_id % 97 <> 0
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val tk = split(col("text"), " ")
    val t = docs(s, d).select(col("doc_id"), tk.as("tk"))
    val grams = t.filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 2),
        i => struct(i.as("i"),
          array_join(slice(col("tk"), i, lit(3)), " ").as("g")))).as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.g").as("g"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val hits = grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "g")
    val plists = hits
      .select(col("doc_id"), explode(array(col("i"), col("i") + 1, col("i") + 2)).as("p"))
      .distinct()
      .groupBy("doc_id").agg(sort_array(collect_set(col("p"))).as("plist"))
    val emptyInts = array().cast("array<int>")
    t.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(plists), Seq("doc_id"), "left")
      .withColumn("plist", coalesce(col("plist"), emptyInts))
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1), size(col("tk"))),
          p => when(array_contains(col("plist"), p), "<masked>")
            .otherwise(element_at(col("tk"), p))), " ").as("masked_text"),
        size(col("plist")).as("n_masked"))
      .orderBy("doc_id")
  }

  // q133 — MIX SOLVER: derive the per-source acceptance rates that
  // morph the corpus's ACTUAL token distribution into a TARGET mix —
  // the step that PRODUCES the config q87/q109 consume (a recipe says
  // "equal token share per source"; the solver turns that into the
  // per-source keep-rates a deterministic sampler can apply). Target
  // here: uniform token share. accept_bp = min(10000, target·10000 /
  // actual) in integer basis points — sources over their share are
  // downsampled, sources under it pass whole (rates never exceed 1;
  // upsampling beyond 1 is q124's job). expected_toks previews the
  // post-sampling mix. All arithmetic is exact BIGINT division.
  //
  // Scale shape: one scan → per-source token totals (ONE keyed agg with
  // map-side partials), a 1-row global total broadcast back, and pure
  // integer projections over the |sources|-row config — the solver
  // itself costs nothing at any corpus size.
  val q133MixSolver: QueryDef = QueryDef.sql(
    "q133_mix_solver",
    """WITH t AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |per AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS src_toks,
      |               COUNT(*) AS n_docs
      |        FROM t GROUP BY 1),
      |tot AS (SELECT CAST(SUM(src_toks) AS BIGINT) AS total_toks,
      |               COUNT(*) AS n_sources FROM per)
      |SELECT source, n_docs, src_toks,
      |       CAST(src_toks * 10000 // total_toks AS BIGINT) AS share_bp,
      |       CAST(LEAST(10000, (total_toks // n_sources) * 10000 // src_toks)
      |            AS BIGINT) AS accept_bp,
      |       CAST(src_toks * LEAST(10000, (total_toks // n_sources) * 10000 // src_toks)
      |            // 10000 AS BIGINT) AS expected_toks
      |FROM per CROSS JOIN tot
      |ORDER BY source""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_toks"))
    val per = t.groupBy("source")
      .agg(sum("n_toks").as("src_toks"), count(lit(1)).as("n_docs"))
    val tot = per.agg(sum("src_toks").as("total_toks"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("src_toks"),
        expr("src_toks * 10000 div total_toks").as("share_bp"),
        least(lit(10000L),
          expr("(total_toks div n_sources) * 10000 div src_toks")).as("accept_bp"),
        expr("src_toks * least(10000, (total_toks div n_sources) * 10000 div src_toks) div 10000")
          .as("expected_toks"))
      .orderBy("source")
  }

  // q162 — PARAGRAPH-level dedup with text REBUILD (the Dolma/Lee et al.
  // sub-document granularity: q21 drops whole duplicate docs, q105 only
  // REPORTS shared spans — this one rewrites the corpus, removing every
  // repeated block while keeping each doc's unique remainder). Documents
  // split into fixed 8-token blocks (the paragraph stand-in for a
  // newline-free corpus; trailing partial block included); an occurrence
  // survives iff its doc is the FIRST (min doc_id) to contain that exact
  // block — first-doc-wins is a pure min-aggregate, so the keep decision
  // is order-independent and exact. Scale shape: block extraction is a
  // bounded per-row fan-out; first-doc is ONE block-keyed agg; the
  // join-back is KEYED on block (the block space grows with the corpus
  // and outgrows any broadcast — q142's argument); the rebuild is a
  // per-doc sorted collect of that doc's own kept blocks (doc-sized,
  // bounded). Emptied docs (every block seen earlier) keep a row with
  // n_kept = 0 and empty text — the drop decision belongs to the caller.
  val q162ParagraphDedup: QueryDef = QueryDef.sql(
    "q162_paragraph_dedup",
    """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |           FROM documents),
      |blk AS (SELECT doc_id, k,
      |          array_to_string(toks[8*k+1 : 8*k+8], ' ') AS block
      |        FROM t, generate_series(0, 511) g(k)
      |        WHERE 8*k < len(toks)),
      |firstdoc AS (SELECT block, MIN(doc_id) AS fd FROM blk GROUP BY 1),
      |kept AS (SELECT b.doc_id, b.k, b.block
      |         FROM blk b JOIN firstdoc f ON b.block = f.block AND b.doc_id = f.fd),
      |tot AS (SELECT doc_id, COUNT(*) AS nb FROM blk GROUP BY 1),
      |ka AS (SELECT doc_id, COUNT(*) AS nk,
      |              string_agg(block, ' ' ORDER BY k) AS new_text
      |       FROM kept GROUP BY 1)
      |SELECT t.doc_id, CAST(t.nb AS INTEGER) AS n_blocks,
      |       CAST(COALESCE(ka.nk, 0) AS INTEGER) AS n_kept,
      |       COALESCE(ka.new_text, '') AS new_text
      |FROM tot t LEFT JOIN ka USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"),
      filter(split(col("text"), " "), x => x =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
    // 512-block (4096-token) cap = the oracle's constant
    // generate_series(0, 511) bound (the q22/q53/q142 shared-cap
    // discipline: generate_series only accepts constants, so the engine
    // must mirror the SAME bound or the two sides silently diverge on
    // long documents)
    val blk = t
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          least(expr("(size(toks) - 1) div 8"), lit(511)))).as("k"))
      .select(col("doc_id"), col("k"),
        concat_ws(" ", slice(col("toks"), col("k") * 8 + 1, lit(8))).as("block"))
    val firstdoc = blk.groupBy("block").agg(min("doc_id").as("fd"))
    val kept = blk.join(firstdoc, Seq("block")).filter(col("doc_id") === col("fd"))
    val tot = blk.groupBy("doc_id").agg(count(lit(1)).as("n_blocks"))
    val ka = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        transform(sort_array(collect_list(struct(col("k"), col("block")))),
          s => s.getField("block"))).as("new_text"))
    tot.join(ka, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_blocks").cast("int").as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).cast("int").as("n_kept"),
        coalesce(col("new_text"), lit("")).as("new_text"))
      .orderBy("doc_id")
  }

  // q204 — EXACT-SUBSTRING dedup CUT (Lee et al. 2021's ExactSubstr,
  // completing the substring family: q105 REPORTS which 5-token span
  // positions recur across the corpus, q162 removes disjoint 8-token
  // blocks — this one ACTS at q105's granularity, removing every token
  // position covered by a non-canonical duplicated span and rebuilding
  // the text from the remainder). Stride-1 overlapping 5-token spans; a
  // span occurrence is CUT iff its span text occurs ≥2 times corpus-wide
  // (cross- OR intra-doc — both are training-loss duplication) and the
  // occurrence is not the canonical one. Canonical = global minimum
  // (doc_id, k) — a pure min-aggregate, so first-wins is
  // order-independent and exact; overlapping cut spans merge into
  // maximal runs for free because removal is by POSITION-set union, not
  // by span.
  //
  // Scale shape: span fan-out is bounded per row (W-token payload,
  // stride 1); the frequency+canon pass is ONE span-keyed agg; the
  // join-back is KEYED on span (the span space grows with the corpus —
  // q142's no-broadcast argument); cut positions collapse in ONE
  // doc-keyed collect_set (doc-length-bounded state); the rebuild is a
  // row-local indexed-HOF filter — no posexplode, no per-token shuffle.
  // Suffix-automaton exactness at any length is out of scope by design:
  // the W-gram position-union IS the published scalable approximation
  // (a duplicated run ≥ W is covered exactly; shorter overlaps are left,
  // as in the paper's minimum-match-length knob).
  //
  // Cap discipline (q162): span starts capped at k ≤ 255 and the
  // oracle's token spine at 256 tokens — both sides mirror the SAME
  // constants (testdata max doc = 100 tokens, so the caps are inactive
  // there; at real scale the engine drops the least() guard and the
  // oracle is no longer the verification path).
  val q204SubstrDedup: QueryDef = QueryDef.sql(
    "q204_substr_dedup",
    """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |           FROM documents),
      |sp AS (SELECT doc_id, k, array_to_string(toks[k+1:k+5], ' ') AS span
      |       FROM t, generate_series(0, 255) g(k) WHERE k + 5 <= len(toks)),
      |canon AS (SELECT span, COUNT(*) AS cnt, MIN(doc_id) AS fdoc FROM sp GROUP BY 1),
      |canon2 AS (SELECT c.span, c.cnt, c.fdoc, MIN(s.k) AS fk
      |           FROM sp s JOIN canon c ON s.span = c.span AND s.doc_id = c.fdoc
      |           GROUP BY 1, 2, 3),
      |pos AS (SELECT DISTINCT s.doc_id, s.k + i AS p
      |        FROM sp s JOIN canon2 c ON s.span = c.span, generate_series(0, 4) g(i)
      |        WHERE c.cnt >= 2 AND NOT (s.doc_id = c.fdoc AND s.k = c.fk)),
      |cut AS (SELECT doc_id, COUNT(*) AS n_cut FROM pos GROUP BY 1),
      |allp AS (SELECT doc_id, k AS p, toks[k+1] AS tok
      |         FROM t, generate_series(0, 255) g(k) WHERE k < len(toks)),
      |keep AS (SELECT a.doc_id, a.p, a.tok
      |         FROM allp a LEFT JOIN pos d ON a.doc_id = d.doc_id AND a.p = d.p
      |         WHERE d.p IS NULL),
      |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS new_text
      |        FROM keep GROUP BY 1)
      |SELECT t.doc_id, CAST(len(t.toks) AS INTEGER) AS n_toks,
      |       CAST(COALESCE(cut.n_cut, 0) AS INTEGER) AS n_cut,
      |       COALESCE(reb.new_text, '') AS new_text
      |FROM t LEFT JOIN cut ON t.doc_id = cut.doc_id
      |       LEFT JOIN reb ON t.doc_id = reb.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"),
      filter(split(col("text"), " "), x => x =!= "").as("toks"))
    val sp = t.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), least(size(col("toks")) - 5, lit(255)))).as("k"))
      .select(col("doc_id"), col("k"),
        concat_ws(" ", slice(col("toks"), col("k") + 1, lit(5))).as("span"))
    val canon = sp.groupBy("span").agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("k"))).as("first"))
    // KEYED join-back on span — the span space is corpus-sized (q142's
    // no-broadcast argument); cut-position union is one doc-keyed set agg
    val cuts = sp.join(canon, Seq("span"))
      .filter(col("cnt") >= 2 &&
        !(col("doc_id") === col("first.doc_id") && col("k") === col("first.k")))
      .select(col("doc_id"), explode(sequence(col("k"), col("k") + 4)).as("p"))
      .groupBy("doc_id").agg(collect_set("p").as("cut"))
    t.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        coalesce(size(col("cut")), lit(0)).as("n_cut"),
        concat_ws(" ",
          filter(col("toks"), (x, i) =>
            !array_contains(coalesce(col("cut"), lit(Array.empty[Int])), i))).as("new_text"))
      .orderBy("doc_id")
  }

  // q212 — COUNT-MIN SKETCH frequency estimation, completing the
  // mergeable-sketch family (q38/q113 HLL distinct, q85 GK quantiles,
  // q98 Misra-Gries heavy hitters): where q98's two-pass form gives
  // EXACT counts for candidates, CMS answers point frequency queries in
  // ONE pass with fixed memory (d×w counters, est ≥ true always,
  // overcount ≤ εN w.h.p.) — the shape a streaming frequency service
  // actually keeps. Hashes are the cross-engine md5 kernel (row j hashes
  // concat(j, ':', tok)), so DuckDB re-derives the identical d=4, w=64
  // counter array and the identical estimates — the sketch CONTENT is on
  // the hash gate, not just its API. The gate emits the top-20 exact
  // tokens (found exactly, q98-style) with their CMS estimates and
  // overcounts. Scale shape: the counter build is ONE keyed agg over
  // (j, h) — 256 groups, map-side combinable, mergeable across
  // shards/days by cell-wise addition; probes broadcast-join the tiny
  // counter table.
  val q212CountMin: QueryDef = QueryDef.sql(
    "q212_count_min",
    s"""WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       |                AS tok
       |              FROM documents),
       |cnt AS (SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY 1),
       |top AS (SELECT tok, exact_cnt FROM cnt
       |        ORDER BY exact_cnt DESC, tok LIMIT 20),
       |cells AS (SELECT j, (${md5IdSqlJ("tok")}) % 64 AS h, COUNT(*) AS c
       |          FROM toks, generate_series(0, 3) g(j) GROUP BY 1, 2),
       |probe AS (SELECT t.tok, t.exact_cnt, j,
       |                 (${md5IdSqlJ("t.tok")}) % 64 AS h
       |          FROM top t, generate_series(0, 3) g(j)),
       |est AS (SELECT p.tok, p.exact_cnt, MIN(c.c) AS cms_est
       |        FROM probe p JOIN cells c ON p.j = c.j AND p.h = c.h
       |        GROUP BY 1, 2)
       |SELECT tok, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       |       CAST(cms_est AS BIGINT) AS cms_est,
       |       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
       |FROM est ORDER BY exact_cnt DESC, tok""".stripMargin) { (s, d) =>
    val toks = docs(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    def hashes(tok: Column): Column = explode(array((0 until 4).map(j =>
      struct(lit(j).as("j"),
        (Dedup.md5Id(concat(lit(s"$j:"), tok)) % 64).as("h"))): _*))
    val cells = toks.select(hashes(col("tok")).as("c"))
      .groupBy(col("c.j").as("j"), col("c.h").as("h"))
      .agg(count(lit(1)).as("c"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    top.select(col("tok"), col("exact_cnt"), hashes(col("tok")).as("p"))
      .select(col("tok"), col("exact_cnt"), col("p.j").as("j"), col("p.h").as("h"))
      .join(broadcast(cells), Seq("j", "h"))
      .groupBy("tok", "exact_cnt").agg(min("c").as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** DuckDB twin of row-j CMS hashing: md5 of 'j:tok' through the
    * [[Dedup.md5IdSql]] kernel (the SQL is assembled with the
    * generate_series variable `j` inline).
    */
  private def md5IdSqlJ(tok: String): String =
    s"CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':', $tok)), 1, 15)) AS BIGINT) % 2147483647"

  val all: Seq[QueryDef] = Seq(
    q86Contamination, q87WeightedMix, q88Profile, q89IncrementalDedup,
    q92FilterCascade, q96ProfileApprox, q98HeavyHitters, q99SequencePacking,
    q100TrainSplit, q105DupSpans, q109TokenBudgetMix, q110TokenBudgetTwopass,
    q111ChunkWindows, q116ShardAssign, q117DocRarity, q118BoilerplateStrip,
    q120DomainCap, q121NegativePairs, q122BpePairs, q124UpsampleMix, q138BpeEncode,
    q127PaddingWaste, q131NoveltyCurve, q132ContaminationMask, q133MixSolver,
    q141BinManifest, q142BigramLm, q162ParagraphDedup, q204SubstrDedup,
    q212CountMin, q258WeightedSample)
}
