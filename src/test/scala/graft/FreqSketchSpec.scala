package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketchAggregator

/** Misra-Gries heavy-hitters sketch: the exact-regime certificate, the
  * lossy-regime guarantees (the part no oracle comparison can reach —
  * x68's oracle only ever sees the exact regime), and merge-order
  * independence where it is promised.
  */
class FreqSketchSpec extends AnyFunSuite {

  private def run(agg: FreqSketchAggregator, keys: Seq[String])
      : (Map[String, Long], Boolean) = {
    val buf = keys.foldLeft(agg.zero)(agg.reduce)
    val (pairs, exact) = agg.finish(buf)
    (pairs.toMap, exact)
  }

  test("exact regime: distinct <= capacity certifies and counts exactly") {
    val agg = new FreqSketchAggregator(8)
    val keys = Seq("a", "b", "a", "c", "a", "b", "d")
    val (counts, exact) = run(agg, keys)
    assert(exact, "no eviction can fire below capacity")
    assert(counts == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("lossy regime: certificate withdrawn, lower bounds, heavy key survives") {
    val agg = new FreqSketchAggregator(2)
    // 'hot' has frequency 10 out of N=16; error bound N/(C+1) = 5.33, so
    // 'hot' MUST survive with count >= 10 - 5 and never overcount
    val keys = Seq.fill(10)("hot") ++
      Seq("a", "b", "c", "d", "e", "f")
    val (counts, exact) = run(agg, keys)
    assert(!exact, "evictions fired past capacity — certificate withdrawn")
    assert(counts.contains("hot"),
      s"a key above N/(capacity+1) frequency must survive: $counts")
    assert(counts("hot") <= 10 && counts("hot") >= 10 - 16 / 3,
      s"MG count is a bounded lower bound: $counts")
    assert(counts.size <= 2, s"at most capacity counters survive: $counts")
    counts.foreach { case (k, c) =>
      val truth = keys.count(_ == k).toLong
      assert(c <= truth, s"$k overcounted: sketch $c vs true $truth")
    }
  }

  test("merge: exact-regime partials sum exactly in any order; truncation certifies") {
    val agg = new FreqSketchAggregator(8)
    val p1 = Seq("a", "a", "b").foldLeft(agg.zero)(agg.reduce)
    val p2 = Seq("b", "c").foldLeft(agg.zero)(agg.reduce)
    val p3 = Seq("a", "d", "d").foldLeft(agg.zero)(agg.reduce)
    val m12 = agg.merge(agg.merge(p1, p2), p3)
    val m21 = agg.merge(p3, agg.merge(p2, p1))
    assert(agg.finish(m12) == agg.finish(m21),
      "exact-regime merges are order-independent")
    assert(agg.finish(m12) ==
      (Seq("a" -> 3L, "b" -> 2L, "d" -> 2L, "c" -> 1L), true))
    // merging two full partials with disjoint keys must truncate to
    // capacity and withdraw the certificate
    val small = new FreqSketchAggregator(2)
    val f1 = Seq("a", "a", "b").foldLeft(small.zero)(small.reduce)
    val f2 = Seq("c", "c", "c", "d").foldLeft(small.zero)(small.reduce)
    val (pairs, exact) = small.finish(small.merge(f1, f2))
    assert(!exact && pairs.size <= 2,
      s"merge truncation must cap counters and withdraw exactness: $pairs")
    // the heaviest key survives the rank-(capacity+1) subtraction
    assert(pairs.toMap.contains("c"), s"heaviest key must survive: $pairs")
  }

  test("finish orders counters (count desc, key asc) deterministically") {
    val agg = new FreqSketchAggregator(8)
    val (pairs, _) = {
      val buf = Seq("b", "a", "b", "a", "c").foldLeft(agg.zero)(agg.reduce)
      agg.finish(buf)
    }
    assert(pairs == Seq("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
