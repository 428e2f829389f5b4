package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Shared core of the typed top-k aggregators: keeps the k best (score, id)
  * pairs per group in a bounded sorted buffer — `reduce` is O(k) per row,
  * `merge` is O(k) per partial — so a top-k over a billion-row group moves
  * k values per partition over the shuffle instead of the group's rows,
  * unlike the window-function formulation (w2) which must sort every
  * partition.
  *
  * This is the `Aggregator[IN, BUF, OUT]` extension point (SURVEY §7 step
  * 7). Leaves supply `better` with PRIMITIVE comparisons (not an Ordering)
  * so each score type's tie/edge semantics are explicit and bit-stable,
  * plus the concrete encoders.
  */
abstract class TopKAggregatorBase[S](k: Int)
    extends Aggregator[(S, Long), Seq[(S, Long)], Seq[(S, Long)]] {

  /** Strict total order, best first: score descending, id ascending on
    * ties — deterministic under any merge order.
    */
  protected def better(a: (S, Long), b: (S, Long)): Boolean

  private def insert(buf: Seq[(S, Long)], x: (S, Long)): Seq[(S, Long)] = {
    // buf is kept sorted best-first and capped at k
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }
  }

  override def zero: Seq[(S, Long)] = Nil
  override def reduce(buf: Seq[(S, Long)], in: (S, Long)): Seq[(S, Long)] =
    insert(buf, in)
  override def merge(a: Seq[(S, Long)], b: Seq[(S, Long)]): Seq[(S, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(S, Long)]): Seq[(S, Long)] = buf
}

/** Top-k with double scores (w4's per-group top-k by retail price; the
  * dense cosine paths' denseTopK). Comparison is `Double.compare`, not
  * `>`: IEEE `>` is false BOTH ways for NaN, which would make `better`
  * merge-order-dependent (NaN parked at the front when the buffer is
  * short, dropped when full) — Double.compare ranks NaN above every
  * finite score, exactly where the window ordering and DuckDB's
  * row_number this aggregator replaces put it.
  */
class TopKAggregator(k: Int) extends TopKAggregatorBase[Double](k) {
  override protected def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Integer-exact sibling for int64 fixed-point scores (the x43/x54
  * discipline): no Long→Double round trip, so ranking is bit-identical to
  * the oracle's integer row_number ordering.
  */
class TopKLongAggregator(k: Int) extends TopKAggregatorBase[Long](k) {
  override protected def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
