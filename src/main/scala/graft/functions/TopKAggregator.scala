package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per group
  * — ordered by score descending, id ascending on ties — without sorting
  * the group.
  *
  * This is the `Aggregator[IN, BUF, OUT]` extension point (SURVEY §7 step 7):
  * the buffer is a bounded list, `reduce` is O(k) per row, `merge` is O(k)
  * per partial — so a top-k over a billion-row group moves k values per
  * partition over the shuffle instead of the group's rows, unlike the
  * window-function formulation (w2) which must sort every partition.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // descending score, ascending id — deterministic under any merge order
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    // buf is kept sorted best-first and capped at k
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }
  }

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Integer-exact sibling of [[TopKAggregator]] for int64 fixed-point scores
  * (the x43/x54 discipline): top-k (score, id) pairs per group ordered by
  * score descending, id ascending on ties, with no Long→Double round trip.
  *
  * Same scale shape: the buffer is a k-capped sorted list, so a per-group
  * top-k moves k values per partition over the shuffle (partial + final
  * object-hash aggregation) instead of sorting whole partitions the way a
  * window formulation does.
  */
class TopKLongAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }
  }

  override def zero: Seq[(Long, Long)] = Nil
  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, in)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
