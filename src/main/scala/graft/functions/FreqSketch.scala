package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory, MERGEABLE frequency summary for key spaces too large to
  * groupBy (x15's bigram counting shuffles the whole key space; the n-gram
  * space is quadratic in vocabulary, so at web scale the counting pass
  * itself must be capacity-bounded). One pass, at most `capacity` counters
  * per partial, partials merge associatively (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) — so the plan is a partial/final object-hash
  * aggregate moving <= capacity (key, count) pairs per partition over the
  * shuffle, never the stream.
  *
  * Guarantees (classic Misra-Gries): every surviving counter UNDERCOUNTS
  * its key by at most the total decrement weight <= N/(capacity+1); any
  * key with true frequency above N/(capacity+1) is guaranteed present.
  *
  * The sketch is SELF-CERTIFYING: the buffer carries an `evicted` flag set
  * the first time any eviction (reduce's decrement-all, or merge's
  * rank-(capacity+1) subtraction) fires. If the flag is false at finish,
  * no count was ever decremented and every counter is EXACT — the audit
  * regime the oracle compares in (distinct keys <= capacity), certified by
  * the sketch itself instead of a second counting pass over the data.
  * Consumers `require(exact)` where they promise exact output and name the
  * capacity knob in the failure message (the bm25Guard discipline).
  *
  * Determinism: counts are merge-order-independent in the exact regime
  * (pure sums). In the lossy regime the SET of surviving counters can vary
  * with merge order (inherent to MG) while the error bound holds — which
  * is why exactness is certified, not assumed.
  */
class FreqSketchAggregator(capacity: Int)
    extends Aggregator[String, (Map[String, Long], Boolean),
      (Seq[(String, Long)], Boolean)] {
  require(capacity > 0, "freq-sketch capacity must be positive")

  override def zero: (Map[String, Long], Boolean) = (Map.empty, false)

  override def reduce(buf: (Map[String, Long], Boolean),
      key: String): (Map[String, Long], Boolean) = {
    val (m, ev) = buf
    m.get(key) match {
      case Some(c) => (m.updated(key, c + 1), ev)
      case None if m.size < capacity => (m.updated(key, 1L), ev)
      case None =>
        // decrement-all, drop zeros — the classic MG eviction step; the
        // incoming key's +1 and one decrement cancel, so it is not added
        (m.flatMap { case (k2, c) =>
          if (c > 1) Some(k2 -> (c - 1)) else None
        }, true)
    }
  }

  override def merge(a: (Map[String, Long], Boolean),
      b: (Map[String, Long], Boolean)): (Map[String, Long], Boolean) = {
    val combined = (a._1.keySet ++ b._1.keySet).iterator
      .map(k2 => k2 -> (a._1.getOrElse(k2, 0L) + b._1.getOrElse(k2, 0L)))
      .toMap
    val ev = a._2 || b._2
    if (combined.size <= capacity) (combined, ev)
    else {
      // mergeable-summaries truncation: subtract the (capacity+1)-th
      // largest count from every counter, drop the non-positive — at most
      // `capacity` survive and the per-key undercount bound telescopes
      val thresh = combined.valuesIterator.toArray
        .sorted(Ordering[Long].reverse).apply(capacity)
      (combined.flatMap { case (k2, c) =>
        if (c - thresh > 0) Some(k2 -> (c - thresh)) else None
      }, true)
    }
  }

  /** (counters sorted count-desc then key-asc, exact?) — the sort makes
    * the output a deterministic value in the exact regime.
    */
  override def finish(buf: (Map[String, Long], Boolean))
      : (Seq[(String, Long)], Boolean) =
    (buf._1.toSeq.sortBy { case (k2, c) => (-c, k2) }, !buf._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Boolean)] =
    ExpressionEncoder[(Map[String, Long], Boolean)]()
  override def outputEncoder: Encoder[(Seq[(String, Long)], Boolean)] =
    ExpressionEncoder[(Seq[(String, Long)], Boolean)]()
}
