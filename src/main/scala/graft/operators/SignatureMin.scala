package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise-min aggregation over MinHash signatures: the sketch-union
  * operator. Because min distributes over set union, the element-wise min
  * of per-document signatures IS the signature of the union of their
  * shingle sets — so a corpus/source/shard-level sketch is buildable
  * incrementally, with mergeable fixed-size state (k longs), never
  * re-reading documents.
  *
  * This is the one place the engine uses a typed `Aggregator` (SURVEY
  * §2.11 policy: only for operators with no built-in): Spark has no
  * element-wise array-min aggregate, and the explode+min+collect rewrite
  * shuffles k rows per document instead of one fixed-size buffer per
  * partition. Registered via `functions.udaf` — partial aggregation and
  * merge come from the Aggregator contract, so the shuffle carries one
  * k-long buffer per (group × partition).
  */
object SignatureMin extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  private def minInto(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (b.isEmpty) a.toArray
    else {
      require(b.length == a.length, s"signature width mismatch: ${b.length} vs ${a.length}")
      var i = 0
      while (i < b.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
      b
    }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (a == null) b else minInto(b, a)

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y else if (y.isEmpty) x else minInto(x, y)

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
