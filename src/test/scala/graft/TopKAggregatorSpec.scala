package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAggregator, TopKLongAggregator}

/** The typed bounded top-k buffer (denseTopK / hammingTopK / the BM25
  * rankings ride it): order semantics, the k cap, NaN placement, and — for
  * the r20 mutable-buffer insert path — merge-order independence, in-place
  * aliasing safety across groups, and equivalence to the sort-take-k
  * reference on randomized inputs.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private def reference(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortBy { case (s, id) => (-s, id) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      .take(k)

  test("reduce keeps the k best, score desc then id asc, capped at k") {
    val agg = new TopKAggregator(3)
    val rows = Seq((0.5, 7L), (0.9, 2L), (0.5, 3L), (0.1, 1L), (0.9, 9L))
    val out = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(out) == Seq((0.9, 2L), (0.9, 9L), (0.5, 3L)))
  }

  test("NaN ranks above every finite score (Double.compare order)") {
    val agg = new TopKAggregator(2)
    val rows = Seq((1.0, 1L), (Double.NaN, 5L), (2.0, 2L))
    val out = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(out).map(_._2) == Seq(5L, 2L))
  }

  test("merge of encoder-shaped (immutable) partials equals single-pass; any order") {
    val agg = new TopKLongAggregator(4)
    val a = Seq((10L, 1L), (8L, 2L), (8L, 9L))
    val b = Seq((12L, 4L), (8L, 5L), (1L, 6L))
    // simulate the encoder boundary: partials arrive as immutable seqs
    def partial(rows: Seq[(Long, Long)]): Seq[(Long, Long)] =
      rows.foldLeft(agg.zero)(agg.reduce).toVector
    val m1 = agg.finish(agg.merge(partial(a), partial(b)))
    val m2 = agg.finish(agg.merge(partial(b), partial(a)))
    val all = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    assert(m1 == m2 && m1 == agg.finish(all).toVector.take(4))
    assert(m1 == Seq((12L, 4L), (10L, 1L), (8L, 2L), (8L, 5L)))
  }

  test("zero never aliases: two groups reduced from the same zero stay disjoint") {
    val agg = new TopKAggregator(2)
    val z = agg.zero
    val g1 = agg.reduce(z, (1.0, 1L))
    val g2 = agg.reduce(z, (2.0, 2L))
    assert(agg.finish(g1) == Seq((1.0, 1L)))
    assert(agg.finish(g2) == Seq((2.0, 2L)))
  }

  test("randomized: equals sort-take-k under arbitrary partial splits") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val agg = new TopKAggregator(k)
      val n = 1 + rnd.nextInt(40)
      // small score space forces ties; ids unique (the group contract)
      val rows = (0 until n).map(i => (rnd.nextInt(5).toDouble, i.toLong))
      val cut = rnd.nextInt(n + 1)
      val (p1, p2) = rows.splitAt(cut)
      val merged = agg.merge(
        p1.foldLeft(agg.zero)(agg.reduce).toVector,
        p2.foldLeft(agg.zero)(agg.reduce).toVector)
      assert(agg.finish(merged).toVector == reference(rows, k).toVector,
        s"k=$k rows=$rows cut=$cut")
    }
  }
}
