package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding application — the other half of q122 (which counts
  * merge candidates, the training inner loop): given a LEARNED, ranked
  * merge table, encode text into BPE tokens. This is the tokenizer pass
  * a training pipeline runs over every document, so it is an expression
  * (one projection over the scan, merge table shipped once per task via
  * a codegen reference object), not a UDF closure re-serialized per row.
  *
  * Semantics (the canonical greedy algorithm): words split on single
  * spaces; each word starts as its character sequence; repeatedly merge
  * the adjacent pair with the LOWEST rank in the table until no adjacent
  * pair is ranked. Tokens of all words concatenate in order. Characters
  * are the initial alphabet — no end-of-word marker, matching q122's
  * pair-counting convention (`Corpus` cites the reference anchor).
  */
object BpeKernel {

  /** Greedy encode of one word. `ranks` maps "a b" (space-joined pair)
    * to merge priority (lower merges first). Returns the token list.
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var toks: Array[String] = word.map(_.toString).toArray
    var done = false
    while (!done && toks.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + " " + toks(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, merged, 0, bestIdx)
        merged(bestIdx) = toks(bestIdx) + toks(bestIdx + 1)
        System.arraycopy(toks, bestIdx + 2, merged, bestIdx + 1,
          toks.length - bestIdx - 2)
        toks = merged
      }
    }
    toks
  }

  /** Encode whitespace-tokenized text; tokens of all words concatenate
    * in order (empty splits from repeated spaces contribute nothing).
    */
  def encode(text: UTF8String, ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.toString.split(' ').foreach { w =>
      if (w.nonEmpty) encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray)
  }

  /** Driver-side BPE TRAINING over a (word, freq) vocabulary — true
    * iterative training: after each adopted merge the pair counts are
    * recomputed on the updated symbol sequences (q122 computes exactly
    * one round of this loop engine-side; the Zipf-bounded vocab makes
    * the driver loop cheap — model fitting, like the k-means centroid
    * loop, not data processing). Ties break lexicographically so the
    * learned table is deterministic. Returns pairs in merge order.
    */
  def train(vocab: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, f) =>
        var j = 0
        while (j < toks.length - 1) {
          val k = (toks(j), toks(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val ranks = new java.util.HashMap[String, Integer]
        ranks.put(best._1 + " " + best._2, 0)
        words = words.map { case (toks, f) =>
          // applying just the new merge everywhere = one encodeWord pass
          // with a single-entry rank table
          (encodeWordOnce(toks, best), f)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** One engine-side training round over a symbol-sequence vocabulary
    * frame `(toks: array<string>, f: bigint)` — pair counting, argmax
    * adoption, and the single-merge rewrite all run as DataFrame ops, so
    * training survives a vocabulary too large even for the capped driver
    * collect ([[graft.operators.Corpus.trainBpe]]'s top-N floor). The
    * driver only ever sees ONE row per round (the adopted pair) — the
    * k-means model-sync shape, applied to tokenizer training.
    *
    * Per round: one keyed shuffle (pair counts, map-side partial), a
    * 1-row `TakeOrderedAndProject` collect, and one codegen'd
    * [[BpeMergeOnce]] projection rewriting the cached vocabulary.
    * Tie-breaks ((-count, a, b)) match [[train]] exactly, so both modes
    * learn the identical merge table (CorpusSpec pins this).
    */
  def trainDistributed(vocab: org.apache.spark.sql.DataFrame, nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // localCheckpoint (eager) per round, NOT persist: an iterative
    // rewrite that chains plans grows the lineage by one projection per
    // round, and analysis + cache-manager plan comparison over an
    // ever-deeper tree turns 50 rounds quadratic-plus. Truncating to a
    // LogicalRDD keeps every round's plan constant-size — the same
    // discipline the connected-components fixpoint uses.
    var cur = vocab.localCheckpoint(true)
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      // adjacent pairs of the CURRENT symbol sequences, weighted by word
      // frequency — q122's kernel generalized past the first round. The
      // size >= 2 guard keeps sequence() ascending (Spark generates a
      // DESCENDING range when start > stop, which would fabricate pairs).
      val best = cur
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i + 1] AS b))")).as("p"), col("f"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        cur = cur
          .select(GraftSqlShim.column(
            BpeMergeOnce(GraftSqlShim.expression(col("toks")), a, b)).as("toks"), col("f"))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq
  }

  /** [[encodeWordOnce]] over Catalyst array data — the executor-side
    * kernel of [[BpeMergeOnce]].
    */
  def mergeOnce(toks: ArrayData, a: UTF8String, b: UTF8String): GenericArrayData = {
    val n = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var j = 0
    while (j < n) {
      if (j < n - 1 && toks.getUTF8String(j) == a && toks.getUTF8String(j + 1) == b) {
        out += UTF8String.concat(a, b); j += 2
      } else { out += toks.getUTF8String(j); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWordOnce(toks: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == pair._1 && toks(j + 1) == pair._2) {
        out += toks(j) + toks(j + 1); j += 2
      } else { out += toks(j); j += 1 }
    }
    out.toArray
  }

  /** Merge list → the rank table [[encode]] consumes. */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + " " + b, r) }
    m
  }
}

/** `bpe_encode(text)` with an embedded learned merge table. The table
  * rides as a codegen reference object (serialized once per task, like
  * Spark's own regex patterns), so the generated code is a single
  * static call inside the WholeStageCodegen span.
  */
final case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val ranks = BpeKernel.ranksOf(merges)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, classOf[java.util.HashMap[_, _]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.encode($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Apply exactly ONE adopted merge `(a, b)` to a symbol-sequence column
  * (`array<string>`) — the per-round vocabulary rewrite of distributed
  * BPE training ([[BpeKernel.trainDistributed]]). The pair rides as two
  * codegen reference objects, so the rewrite is a single static call
  * inside the WholeStageCodegen span — no UDF closure, no shuffle.
  */
final case class BpeMergeOnce(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_once"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_merge_once requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.mergeOnce(input.asInstanceOf[ArrayData], ua, ub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeMergeA", ua, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeMergeB", ub, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernel.mergeOnce($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeOnce =
    copy(child = newChild)
}
