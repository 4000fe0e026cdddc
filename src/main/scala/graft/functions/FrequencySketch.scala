package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries frequent-items sketch as a typed `Aggregator` — the
  * bounded-memory "what dominates this corpus" primitive. The buffer
  * holds at most k counters, reduce is O(1) amortized, and the merge
  * uses the mergeable-summaries rule (Agarwal et al., "Mergeable
  * Summaries", PODS 2012): sum counters, then subtract the (k+1)-th
  * largest count from all and drop the non-positive.
  *
  * Guarantees (classic): every item with true frequency > n/(k+1) is
  * present in the final sketch, and each reported count underestimates
  * the true count by at most n/(k+1). So with threshold phi > 1/(k+1)
  * the sketch yields NO false negatives — the exact heavy-hitter set
  * can then be recovered with a second pass that counts only the
  * candidates (a broadcast semi-join, ≤ k keys in the shuffle) instead
  * of grouping EVERY distinct item. q98 is that two-pass shape.
  */
object FrequencySketch {

  final case class TokenCount(token: String, n: Long)

  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[TokenCount]] {
    require(k >= 1, s"MisraGries needs at least 1 counter, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b
      else b.get(a) match {
        case Some(c) => b.updated(a, c + 1)
        case None if b.size < k => b.updated(a, 1L)
        // full and unseen: decrement every counter (the arriving item's
        // +1 and one unit of k existing counters annihilate), drop zeros
        case None => b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val summed = (x.keySet ++ y.keySet).iterator
          .map(t => t -> (x.getOrElse(t, 0L) + y.getOrElse(t, 0L))).toMap
        if (summed.size <= k) summed
        else {
          val thresh = summed.valuesIterator.toIndexedSeq
            .sorted(Ordering[Long].reverse).apply(k) // (k+1)-th largest
          summed.flatMap { case (t, c) => if (c > thresh) Some(t -> (c - thresh)) else None }
        }
      }

    /** Deterministic output order: estimated count desc, token asc. */
    override def finish(b: Map[String, Long]): Seq[TokenCount] =
      b.toSeq.map { case (t, c) => TokenCount(t, c) }
        .sortBy(tc => (-tc.n, tc.token))

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[TokenCount]] =
      ExpressionEncoder[Seq[TokenCount]]()
  }
}
