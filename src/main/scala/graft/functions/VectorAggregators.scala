package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed vector aggregates (`Aggregator[IN, BUF, OUT]`) — the engine's
  * custom-UDAF surface (SURVEY.md §2.2). The centroid is the building
  * block for IVF training (k-means steps) and cluster summarization.
  *
  * Scale shape: the buffer is one dense vector + a count, so partial
  * aggregation is map-side (one buffer per partition per group), merge is
  * O(dim), and the shuffle carries buffers, not rows.
  */
object VectorAggregators {

  final case class CentroidBuf(var sums: Array[Double], var n: Long)

  /** Element-wise mean of `array<double>` vectors. */
  class Centroid extends Aggregator[Array[Double], CentroidBuf, Array[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: CentroidBuf, a: Array[Double]): CentroidBuf = {
      if (a == null) b
      else if (b.n == 0L) CentroidBuf(a.clone(), 1L)
      else {
        var i = 0
        while (i < b.sums.length && i < a.length) { b.sums(i) += a(i); i += 1 }
        b.n += 1
        b
      }
    }

    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        var i = 0
        while (i < x.sums.length && i < y.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        x.n += y.n
        x
      }
    }

    override def finish(b: CentroidBuf): Array[Double] =
      if (b.n == 0L) Array.emptyDoubleArray else b.sums.map(_ / b.n)

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  final case class Scored(score: Double, id: Long)

  /** Bounded top-k per group: the buffer holds at most k (score, id)
    * entries, so partial aggregation keeps a k-sized heap per group per
    * partition and the shuffle carries k rows per group — the window
    * row_number() formulation (q47) sorts EVERY group member instead.
    * Ordering: score descending, id ascending on ties (bit-identical to
    * the window form's ORDER BY score DESC, id).
    */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    /** Insert keeping the buffer sorted best-first, truncated at k. */
    private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      if (buf.length >= k && better(buf.last, a)) buf
      else {
        val (pre, post) = buf.span(better(_, a))
        (pre :+ a) ++ post.take(k - pre.length - 1)
      }
    }

    override def zero: Seq[Scored] = Vector.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = insert(b, a)
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      y.foldLeft(x)(insert)
    override def finish(b: Seq[Scored]): Seq[Scored] = b
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }
}
