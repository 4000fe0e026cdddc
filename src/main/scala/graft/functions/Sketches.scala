package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document sketch expressions: the whole
  * shingle→hash→minimize (MinHash) and token→vote→sign (SimHash)
  * pipelines fused into ONE projection-time pass per document.
  *
  * Why an expression and not the relational composition (explode →
  * groupBy(doc) → 16 aggregates)? The composed form shuffles one row per
  * shingle (≈ tokens per doc) just to re-meet at the doc key it started
  * from — at 100 TB that shuffle is the job. The sketch is a per-row
  * computation with O(1) state; fusing it keeps the scan → sketch →
  * band-explode pipeline entirely shuffle-free until the (band, sig)
  * bucket aggregation, which is the only data movement LSH actually
  * needs. Hash parity with the DuckDB oracle is preserved bit-for-bit:
  * md5 → first 15 hex chars as int → mod 2^31-1, then the same affine
  * permutation family — duplicates don't affect a min, so skipping the
  * relational DISTINCT changes nothing.
  */
object Sketches {
  final val Mersenne31 = 2147483647L // 2^31 - 1

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(s), 1, 15), 16, 10) % 2^31-1` — the engine-wide
    * deterministic token id (see operators.Dedup.md5Id). 15 hex chars =
    * 60 bits, always fits a long.
    */
  def md5Id(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    // first 15 hex chars = 7.5 bytes: parse without building a string
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v = (v << 4) | ((h(7) & 0xf0L) >> 4)
    v % Mersenne31
  }

  /** All 16 MinHash minima over word 3-gram shingles of `toks`
    * (first `cap` tokens), or null when there are fewer than 3 tokens.
    * Shingle text is `tok(i) + ' ' + tok(i+1) + ' ' + tok(i+2)`, matching
    * the relational form's concat_ws.
    */
  def minhash16(toks: ArrayData, cap: Int): ArrayData = {
    val n = math.min(toks.numElements(), cap)
    if (n < 3) return null
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < n - 2) {
      val b0 = toks.getUTF8String(i).getBytes
      val b1 = toks.getUTF8String(i + 1).getBytes
      val b2 = toks.getUTF8String(i + 2).getBytes
      val buf = new Array[Byte](b0.length + b1.length + b2.length + 2)
      System.arraycopy(b0, 0, buf, 0, b0.length)
      buf(b0.length) = ' '
      System.arraycopy(b1, 0, buf, b0.length + 1, b1.length)
      buf(b0.length + b1.length + 1) = ' '
      System.arraycopy(b2, 0, buf, b0.length + b1.length + 2, b2.length)
      val sid = md5Id(buf)
      var j = 0
      while (j < 16) {
        val h = ((2L * j + 1) * sid + (j.toLong * j + 7)) % Mersenne31
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** ±1 random-hyperplane components for RP-LSH, j = 0..15, d = 0..63 —
    * md5("j-d") parity, identical to the relational form's literals and
    * the DuckDB oracle's CTE (operators.Similarity.rpSign).
    */
  private val rpSigns: Array[Array[Double]] = Array.tabulate(16, 64) { (j, d) =>
    val digest = MessageDigest.getInstance("MD5").digest(s"$j-$d".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v = (v << 4) | ((digest(7) & 0xf0L) >> 4)
    if (v % 2 == 0) 1.0 else -1.0
  }

  /** The 4 banded RP-signature values of a 64-dim vector (4 bits per
    * band), or null when the vector is not 64-dim. Each hyperplane dot
    * folds in index order with plain double adds — the identical IEEE
    * sequence as the relational `aggregate(zip_with(...))` form it
    * replaces, so sign decisions (and therefore buckets) are
    * bit-for-bit the same.
    */
  def rpsig16(e: ArrayData): ArrayData = {
    if (e.numElements() != 64) return null
    val bits = new Array[Int](16)
    var j = 0
    while (j < 16) {
      val h = rpSigns(j)
      var acc = 0.0
      var d = 0
      while (d < 64) { acc += e.getDouble(d) * h(d); d += 1 }
      bits(j) = if (acc > 0) 1 else 0
      j += 1
    }
    val bvals = new Array[Int](4)
    var b = 0
    while (b < 4) {
      bvals(b) = bits(4 * b) | (bits(4 * b + 1) << 1) |
        (bits(4 * b + 2) << 2) | (bits(4 * b + 3) << 3)
      b += 1
    }
    new GenericArrayData(bvals)
  }

  /** 16-bit SimHash over the DISTINCT non-empty tokens of `toks`: each
    * distinct token votes ±1 per bit of its affine-rehashed id; the
    * signature sets bit j iff the vote sum is positive. Matches the
    * relational q23 form exactly (distinct is load-bearing here, so the
    * expression dedupes internally).
    */
  def simhash16(toks: ArrayData): Long = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t.numBytes() > 0 && seen.add(t)) {
        val sid = md5Id(t.getBytes)
        val h = (1000003L * sid + 12345L) % Mersenne31
        var j = 0
        while (j < 16) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** `graft_minhash16(array<string>) -> array<long>` (null if < 3 tokens). */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash16"

  /** Token cap mirrors the 4002-token bound of the relational/oracle form. */
  private final val cap = 4002

  override def nullSafeEval(a: Any): Any =
    Sketches.minhash16(a.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.Sketches.minhash16($a, $cap);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHash16 = copy(child = c)
}

/** `graft_rpsig16(array<double>) -> array<int>` — the 4 banded
  * random-hyperplane signature values of a 64-dim vector (null
  * otherwise). One fused pass over the vector replaces 16
  * `aggregate(zip_with(...))` chains, each of which materialized a
  * 64-element product array per hyperplane.
  */
case class RpSig16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rpsig16"

  override def nullSafeEval(a: Any): Any =
    Sketches.rpsig16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.Sketches.rpsig16($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RpSig16 = copy(child = c)
}

/** `graft_simhash16(array<string>) -> long`. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(a: Any): Any =
    Sketches.simhash16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sketches.simhash16($a);")

  override protected def withNewChildInternal(c: Expression): SimHash16 = copy(child = c)
}
