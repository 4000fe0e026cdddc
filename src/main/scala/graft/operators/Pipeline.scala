package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.DataFrame

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
    //    semantics: one keyed shuffle on the content hash
    val exact = kept
      .withColumn("keeper",
        min("doc_id").over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")

    // 3. near-dup keep-list — q22's LSH pairs on the exact-dedup
    //    survivors, q56's transitive closure, keep each cluster's min id
    val sigs = Dedup.lshSigsOf(exact)
    val buckets = sigs.groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val pairs = Dedup.bucketPairs(buckets, "ids", "a", "b").distinct()
    val reps = Clustering.connectedComponents(pairs)
      .filter(col("node") === col("label")).select(col("node").as("doc_id"))
    val dupMembers = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val deduped = exact
      .join(dupMembers.withColumn("in_pair", lit(true)), Seq("doc_id"), "left")
      .join(reps.withColumn("is_rep", lit(true)), Seq("doc_id"), "left")
      .filter(col("in_pair").isNull || col("is_rep"))
      .select("doc_id", "source", "text")

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
}
