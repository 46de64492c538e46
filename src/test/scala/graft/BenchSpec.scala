package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention self-defense, certified without needing a
  * deliberately loaded box: the trip wire, the 3-pass min-fold, and the
  * errors-only-when-every-pass-failed contract are pure functions. */
class BenchSpec extends AnyFunSuite {
  private def pass(obs: (String, Double)*): Bench.Pass =
    obs.map { case (n, t) => n -> (t, None: Option[String]) }.toMap

  test("divergent: trips past 15% pass-total divergence, not within it") {
    assert(!Bench.divergent(100.0, 100.0))
    assert(!Bench.divergent(100.0, 114.9)) // inside the ±15% noise band
    assert(Bench.divergent(100.0, 115.1))
    assert(Bench.divergent(466.6, 573.7)) // the BENCH_r09 contended run
    assert(Bench.divergent(223.6, 431.7)) // the BENCH_r08 contended run
    assert(Bench.divergent(431.7, 223.6)) // symmetric
  }

  test("divergent with the first-run allowance: pass-1 codegen bias on " +
      "a big suite doesn't trip; whole-box theft still does") {
    // the r12/r13 false-positive class: ~0.3 s/query of first-execution
    // codegen lands in pass 1 — observed clean-box totals
    assert(!Bench.divergent(530.6, 451.5, 272)) // BENCH_r12
    assert(!Bench.divergent(454.0, 368.4, 274)) // r13 idle re-run
    // real co-tenancy (r8 signature) clears any plausible allowance
    assert(Bench.divergent(431.7, 223.6, 180))
    // the allowance never masks large relative theft on small suites
    assert(Bench.divergent(100.0, 130.0, 16))
    // DIRECTION-AWARE: the allowance only excuses pass 1 being slower
    // (codegen cannot slow pass 2) — evenly-spread theft landing in
    // pass 2 trips even when it is under allowance-sized in magnitude
    assert(Bench.divergent(451.5, 530.6, 272)) // r12 totals, reversed
    assert(!Bench.divergent(451.5, 500.0, 272)) // pass 2 inside the band
  }

  test("perQueryDivergent: any >2x single-query swing above the 1 s " +
      "floor trips; sub-second jitter and failed passes don't") {
    // the r9 signature: totals 23% apart, q62 7.2 s vs 28.9 s
    assert(Bench.perQueryDivergent(
      pass("q62" -> 7.2, "q80" -> 9.0), pass("q62" -> 28.9, "q80" -> 9.4)))
    // within 2x: quiet
    assert(!Bench.perQueryDivergent(
      pass("q1" -> 5.0, "q2" -> 3.0), pass("q1" -> 9.9, "q2" -> 3.1)))
    // sub-second queries jitter freely below the floor
    assert(!Bench.perQueryDivergent(
      pass("q1" -> 0.1), pass("q1" -> 0.9)))
    // a failed pass measures the failure, not contention
    val failed: Bench.Pass = Map("q1" -> (30.0, Some("boom")))
    assert(!Bench.perQueryDivergent(pass("q1" -> 5.0), failed))
  }

  test("suspects + the 3x verdict factor: warm-pass cache-eviction " +
      "jitter (~2x) stays quiet, r9-style theft still convicts") {
    val warm2 = pass("q62" -> 4.4, "q80" -> 6.2, "q255" -> 10.8)
    val evicted = pass("q62" -> 9.5, "q80" -> 6.0, "q255" -> 10.1)
    assert(Bench.suspects(warm2, evicted) == Seq("q62")) // 2x trigger
    assert(!Bench.perQueryDivergent(warm2, evicted, factor = 3.0))
    val theft = pass("q62" -> 28.9, "q80" -> 6.0, "q255" -> 10.1)
    assert(Bench.perQueryDivergent(warm2, theft, factor = 3.0))
    assert(Bench.suspects(warm2, theft, 3.0) == Seq("q62"))
  }

  test("minFold: a contended pass never wins; third pass folds in") {
    val names = Seq("q1", "q2")
    val quiet1 = pass("q1" -> 1.0, "q2" -> 2.0)
    val loaded = pass("q1" -> 9.0, "q2" -> 7.0)
    val quiet2 = pass("q1" -> 1.1, "q2" -> 1.8)
    assert(Bench.minFold(names, Seq(quiet1, loaded, quiet2)).toMap ==
      Map("q1" -> 1.0, "q2" -> 1.8))
  }

  test("minFold + allFailMessage: failed passes never win the min; " +
      "errors appear only when every pass failed") {
    val names = Seq("q1", "q2")
    val p1: Bench.Pass = Map(
      "q1" -> (0.1, Some("boom")), // fast BECAUSE it failed
      "q2" -> (2.0, Some("err-a")))
    val p2: Bench.Pass = Map(
      "q1" -> (5.0, None),
      "q2" -> (3.0, Some("err-b")))
    assert(Bench.minFold(names, Seq(p1, p2)).toMap ==
      Map("q1" -> 5.0, "q2" -> 2.0))
    assert(Bench.allFailMessage("q1", Seq(p1, p2)).isEmpty)
    assert(Bench.allFailMessage("q2", Seq(p1, p2)) ==
      Some("q2" -> "pass1: err-a | pass2: err-b"))
    // identical messages collapse to one
    val p3: Bench.Pass = Map("q2" -> (1.0, Some("err-a")), "q1" -> (1.0, None))
    assert(Bench.allFailMessage("q2", Seq(p1, p3)) == Some("q2" -> "err-a"))
  }
}
