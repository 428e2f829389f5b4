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
  *
  * The buffer is mutated in place (Aggregator's documented reduce/merge
  * contract: "for performance, the function may modify `b` and return it").
  * The previous immutable-Seq spelling allocated a fresh O(k) list per
  * QUALIFYING row plus two full-list traversals per row (`size`/`last` on a
  * List) — a flat per-row tax every probe query paid (x27/x53/x63 measured
  * +0.2–0.4 s each when the window ranking moved onto this aggregator).
  * Now a row that cannot enter the full buffer costs two O(1) reads, and an
  * entering row one arraycopy shift of < k elements — no allocation. A
  * partial arriving through the buffer encoder deserializes as an immutable
  * seq; it is re-materialized into an ArrayBuffer once per PARTIAL (never
  * per row). `zero` stays the shared immutable Nil — safe because the
  * mutable copy is created on first insert, so group buffers never alias.
  */
abstract class TopKAggregatorBase[S](k: Int)
    extends Aggregator[(S, Long), scala.collection.Seq[(S, Long)], Seq[(S, Long)]] {

  /** Strict total order, best first: score descending, id ascending on
    * ties — deterministic under any merge order.
    */
  protected def better(a: (S, Long), b: (S, Long)): Boolean

  private def asMutable(buf: scala.collection.Seq[(S, Long)])
      : scala.collection.mutable.ArrayBuffer[(S, Long)] = buf match {
    case ab: scala.collection.mutable.ArrayBuffer[(S, Long)] @unchecked => ab
    case other =>
      val ab = new scala.collection.mutable.ArrayBuffer[(S, Long)](k + 1)
      ab ++= other
      ab
  }

  // buf is kept sorted best-first and capped at k; x lands after every
  // not-worse element (identical position to the old span-insert for this
  // strict total order — positions differ only for bit-identical duplicate
  // entries, whose relative order is unobservable)
  private def insert(buf: scala.collection.mutable.ArrayBuffer[(S, Long)],
      x: (S, Long)): scala.collection.mutable.ArrayBuffer[(S, Long)] = {
    val n = buf.length
    if (n >= k && !better(x, buf(n - 1))) buf
    else {
      var i = n
      while (i > 0 && better(x, buf(i - 1))) i -= 1
      buf.insert(i, x)
      if (buf.length > k) buf.remove(k)
      buf
    }
  }

  override def zero: scala.collection.Seq[(S, Long)] = Nil
  override def reduce(buf: scala.collection.Seq[(S, Long)],
      in: (S, Long)): scala.collection.Seq[(S, Long)] =
    insert(asMutable(buf), in)
  override def merge(a: scala.collection.Seq[(S, Long)],
      b: scala.collection.Seq[(S, Long)]): scala.collection.Seq[(S, Long)] =
    b.foldLeft(asMutable(a))(insert)
  // one immutable O(k) copy per GROUP (the Dataset-facing output type stays
  // the default immutable Seq; the buffer is the 2.13 collection.Seq
  // supertype so the hot path can stay an ArrayBuffer)
  override def finish(buf: scala.collection.Seq[(S, Long)]): Seq[(S, Long)] =
    buf.toSeq
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
  override def bufferEncoder: Encoder[scala.collection.Seq[(Double, Long)]] =
    ExpressionEncoder[scala.collection.Seq[(Double, Long)]]()
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
  override def bufferEncoder: Encoder[scala.collection.Seq[(Long, Long)]] =
    ExpressionEncoder[scala.collection.Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
