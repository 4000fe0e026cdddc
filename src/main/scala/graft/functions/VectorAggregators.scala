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
}
