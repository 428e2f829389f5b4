package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `Bench.suspectOf` — the calibration-normalized regression gate —
  * with a table of cases, so the pure arithmetic (scale prior by
  * calibration ratio, then 3x AND +0.5s absolute) is proven before it
  * next has to adjudicate a poisoned run. No SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  private def sus(now: (String, Double), prior: Double,
      priorCalib: Option[Double], calibNow: Double): Boolean =
    Bench.suspectOf(Seq(now), Map(now._1 -> prior), priorCalib, calibNow)
      .contains(now._1)

  test("drifted box does not flag: a 2x-slower calibration scales the prior") {
    // box is 2x slower (calibration 0.2 -> 0.4); the query merely tracked it
    assert(!sus("q" -> 5.0, prior = 2.0, priorCalib = Some(0.2), calibNow = 0.4))
    // even a 2.9x normalized ratio stays under the gate
    assert(!sus("q" -> 11.6, prior = 2.0, priorCalib = Some(0.2), calibNow = 0.4))
  }

  test("genuine regression flags, drift or not") {
    // same box speed, 3.6x and +2.6s
    assert(sus("q" -> 3.6, prior = 1.0, priorCalib = Some(0.2), calibNow = 0.2))
    // slower box AND a real regression on top: 5x the scaled prior
    assert(sus("q" -> 20.0, prior = 2.0, priorCalib = Some(0.2), calibNow = 0.4))
  }

  test("a faster box cannot mask a real 3x (prior scales DOWN)") {
    // box is 4x faster; a query stuck at its old wall time is now 4x the
    // scaled prior and must flag
    assert(sus("q" -> 2.0, prior = 2.0, priorCalib = Some(0.4), calibNow = 0.1))
  }

  test("missing prior calibration falls back to a raw compare") {
    assert(sus("q" -> 3.6, prior = 1.0, priorCalib = None, calibNow = 0.4))
    assert(!sus("q" -> 2.9, prior = 1.0, priorCalib = None, calibNow = 0.4))
    // a non-positive archived calibration is treated as absent
    assert(sus("q" -> 3.6, prior = 1.0, priorCalib = Some(-1.0), calibNow = 0.4))
  }

  test("the +0.5s absolute gate silences sub-100ms scheduler noise") {
    // 6x but only +0.25s absolute: not suspect
    assert(!sus("q" -> 0.3, prior = 0.05, priorCalib = Some(0.2), calibNow = 0.2))
    // the same ratio past the absolute gate IS suspect
    assert(sus("q" -> 3.0, prior = 0.5, priorCalib = Some(0.2), calibNow = 0.2))
  }

  test("failed measurements never flag (either side)") {
    assert(!sus("q" -> -1.0, prior = 1.0, priorCalib = Some(0.2), calibNow = 0.2))
    assert(!sus("q" -> 9.0, prior = -1.0, priorCalib = Some(0.2), calibNow = 0.2))
    // a query with no archived prior at all never flags
    assert(Bench.suspectOf(Seq("new_q" -> 9.0), Map.empty, Some(0.2), 0.2).isEmpty)
  }

  test("multi-query runs flag exactly the regressed subset, in order") {
    val results = Seq("a" -> 1.0, "b" -> 9.0, "c" -> 0.4, "d" -> 8.0)
    val prior = Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.3, "d" -> 2.0)
    assert(Bench.suspectOf(results, prior, Some(0.25), 0.25) == Seq("b", "d"))
  }
}
