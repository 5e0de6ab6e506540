package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate: the MinHash sketch of a UNION of sets is the
  * elementwise minimum of the member signatures — so a corpus-level
  * sketch aggregates associatively and commutatively, with O(k)
  * state, in one pass. Registered per-session as the
  * `graft_minhash_union` UDAF (see Dedup.sourceSketch).
  *
  * This is the property that makes MinHash a *mergeable* summary: a
  * 1000-executor cluster sketches each partition independently and
  * merges k longs per group, never reshuffling the documents.
  */
object MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  val k = 64

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    val n = math.min(k, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
