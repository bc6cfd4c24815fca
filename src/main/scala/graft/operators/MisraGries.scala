package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary: a mergeable, fixed-size (≤ k entries)
  * sketch of a key stream with the guarantee
  *
  *   true_count − n/(k+1)  ≤  estimate  ≤  true_count
  *
  * so every key with true frequency > n/(k+1) is PRESENT in the summary —
  * no false negatives above the threshold. Merging two summaries is
  * pointwise sum followed by the batch decrement (subtract the (k+1)-th
  * largest count, drop non-positives), which preserves the error bound
  * (Agarwal et al., "Mergeable Summaries", PODS 2012). That mergeability
  * is exactly the Aggregator contract: Spark runs `reduce` per partition
  * and `merge` across partitions, so the shuffle carries one ≤ k-entry map
  * per (group × partition) no matter how large the key DOMAIN is — the
  * point of the sketch vs a plain groupBy, whose shuffle carries every
  * distinct key. Downstream recounts the surviving candidates exactly
  * (see q142), so sketch approximation never reaches a result.
  *
  * The decrement step sorts ≤ k+1 counts and only runs when an insert
  * overflows capacity; at k ≲ a few hundred that is the cheap branch of a
  * scan (a production variant would amortize with a min-heap, same
  * guarantee).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"capacity must be positive: $k")

  override def zero: Map[String, Long] = Map.empty

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val kth = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c > kth => t -> (c - kth) }
    }

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else shrink(b.updated(a, b.getOrElse(a, 0L) + 1L))

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    if (x.isEmpty) y else if (y.isEmpty) x
    else shrink(y.foldLeft(x) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}
