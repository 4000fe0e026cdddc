package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns: one fused pass computing dot product and both
  * norms, with `doGenCode` so it participates in whole-stage codegen.
  *
  * Why not the higher-order-function composition in [[VectorOps.cosine]]?
  * That builds `zip_with` product arrays and walks each vector three
  * times; this reads both `ArrayData` buffers once with no intermediate
  * allocation — the difference is ~3–4× on the brute-force ANN kernel,
  * which at 100 TB is the entire probe cost. Accumulation order matches
  * the HOF version (a single left-to-right pass), so results are
  * bit-identical and the DuckDB verification is unaffected.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local: two cosine calls can land in the same
      // Janino method scope, where fixed names collide and break codegen.
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level access for the engine's native functions. */
object GraftFunctions {

  /** Register on an existing session (sessions the driver builds don't go
    * through [[GraftExtensions]]); idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash16", exprs => MinHash16(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash16", exprs => SimHash16(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_rpsig16", exprs => RpSig16(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_parse_offers", exprs => ParseOffers(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bloom_might_contain", exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs(0)), "built-in")
  }

  /** SQL-callable, codegen'd cosine over array<double> columns. Requires
    * [[register]] (SparkEntry.tune does it) or [[GraftExtensions]].
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)

  /** 16-value MinHash signature of a token array (null if < 3 tokens). */
  def minhash16(toks: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_minhash16", toks)

  /** 16-bit SimHash of a token array (distinct-token votes). */
  def simhash16(toks: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_simhash16", toks)

  /** 4 banded RP-signature values of a 64-dim double vector (null
    * otherwise) — the fused sketch behind rpSignatures (q90/q91/q125).
    */
  def rpsig16(e: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_rpsig16", e)

  /** Unicode NFC canonicalization (codegen'd, already-normalized fast
    * path) — run before hashing/dedup so precomposed and decomposed
    * spellings of the same text collide. Constructed directly (not via
    * the registry) so it works in sessions that never called
    * [[register]] — e.g. inside [[graft.operators.Pipeline.curate]].
    * See [[NfcNormalize]].
    */
  def nfc(s: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(s)))
  }

  /** BPE tokenization with a learned merge table (see [[BpeEncode]]).
    * Constructed directly — the merge table is a runtime object, not a
    * literal, so it rides as a codegen reference like Spark's own
    * compiled regex patterns.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    GraftSqlShim.column(BpeEncode(GraftSqlShim.expression(text), merges))
  }

  /** Codegen'd Bloom membership probe of a bigint key against a
    * serialized `org.apache.spark.util.sketch.BloomFilter` (see
    * [[BloomMightContain]]). False positives possible — always follow
    * with the exact join.
    */
  def bloomMightContain(key: Column, serializedBloom: Array[Byte]): Column =
    org.apache.spark.sql.functions.call_function("graft_bloom_might_contain",
      key, org.apache.spark.sql.functions.lit(serializedBloom))

  /** Broadcast-backed Bloom probe (see [[BloomMightContainBc]]) — the
    * scale form: the plan carries only the broadcast handle; the filter
    * bytes move once per executor, not once per task binary.
    */
  def bloomMightContain(
      key: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    GraftSqlShim.column(BloomMightContainBc(GraftSqlShim.expression(key), bloom))
  }
}

/** `SparkSessionExtensions` hook: build sessions with
  * `.withExtensions(new GraftExtensions)` (or set
  * `spark.sql.extensions=graft.functions.GraftExtensions`) to get the
  * native functions in every new session, SQL included.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    // the native as-of operator plans in any session built with these
    // extensions (AsOf.join also installs it lazily for plain sessions)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // keyless |ta−tb| ≤ δ theta-joins rewrite to cell-bucketed
    // equi-joins (RangeJoin.install is the lazy per-session analog)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
