package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise minimum over fixed-width string vectors — the MinHash
  * signature fold (x2): per document, the n per-hash minima of the
  * per-shingle md5 signatures, folded in ONE pass.
  *
  * Why a typed aggregator and not `min(col) x n`: Spark's declarative
  * `min(STRING)` carries an immutable buffer field, which HashAggregateExec
  * cannot hold in its mutable row — the whole aggregate falls back to
  * SortAggregate, sorting the full shingle stream by doc_id on BOTH sides
  * of the exchange (at 100 TB: two full sorts of the corpus's shingle
  * stream that the hash shape never needs; locally x2's two heaviest
  * stages). A TypedImperativeAggregate plans as ObjectHashAggregate:
  * partial/final hash maps, no sort anywhere, k strings per (partition,
  * doc) over the shuffle — identical movement, no ordering cost.
  *
  * Ordering identity: inputs are md5 hex (pure ASCII), where Java's
  * UTF-16 `compareTo`, Spark's UTF8String binary order, and DuckDB's
  * VARCHAR byte order all coincide — the fold is bit-identical to the
  * oracle's `min(md5(...))`. Buffers mutate in place (the documented
  * Aggregator contract; the TopKAggregatorBase discipline): reduce into
  * an ArrayBuffer, re-materialized once per encoder-decoded partial.
  * An empty buffer (zero) is the identity; groups always see >= 1 row.
  */
class MinStringsAggregator(n: Int)
    extends Aggregator[Seq[String], scala.collection.Seq[String], Seq[String]] {

  private def asMutable(buf: scala.collection.Seq[String])
      : scala.collection.mutable.ArrayBuffer[String] = buf match {
    case ab: scala.collection.mutable.ArrayBuffer[String] @unchecked => ab
    case other =>
      val ab = new scala.collection.mutable.ArrayBuffer[String](n)
      ab ++= other
      ab
  }

  private def fold(buf: scala.collection.mutable.ArrayBuffer[String],
      in: scala.collection.Seq[String]): scala.collection.Seq[String] = {
    require(in.length == n,
      s"MinStringsAggregator($n): input vector has ${in.length} elements")
    if (buf.isEmpty) buf ++= in
    else {
      var i = 0
      while (i < n) {
        val x = in(i)
        if (x.compareTo(buf(i)) < 0) buf(i) = x
        i += 1
      }
      buf
    }
  }

  override def zero: scala.collection.Seq[String] = Nil
  override def reduce(buf: scala.collection.Seq[String],
      in: Seq[String]): scala.collection.Seq[String] =
    fold(asMutable(buf), in)
  override def merge(a: scala.collection.Seq[String],
      b: scala.collection.Seq[String]): scala.collection.Seq[String] =
    if (b.isEmpty) a else fold(asMutable(a), b)
  override def finish(buf: scala.collection.Seq[String]): Seq[String] =
    buf.toSeq
  override def bufferEncoder: Encoder[scala.collection.Seq[String]] =
    ExpressionEncoder[scala.collection.Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
