package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression-gate policy (Bench.withinGate). The gate
  * is `ratio <= 2 OR dt - floor <= min(0.5 s, 2x floor)`: the additive
  * band absorbs local[32] scheduling noise for sub-second cells, and
  * the 2x-floor cap keeps tiny-floor cells honest — ADVICE r15 showed
  * an unconditional 0.5 s band lets a 0.05 s floor pass at 0.55 s
  * (an 11x regression), and the same gate adjudicates solo replays and
  * the 100x ledger, so such a regression would self-certify as ok. */
class BenchGateSpec extends AnyFunSuite {

  test("ratio gate: within 2x floor always passes") {
    assert(Bench.withinGate(1.9, 1.0))
    assert(Bench.withinGate(0.09, 0.05))
    assert(Bench.withinGate(200.0, 100.0))
  }

  test("variance band: sub-second noise on medium floors passes") {
    // the reduce2_outer shape: 0.232 s floor read at 0.5 s (2.16x)
    assert(Bench.withinGate(0.5, 0.232))
    // 1.0 s floor read at 1.45 s is 1.45x — passes the pure ratio
    // gate; for floors >= 0.5 s the 0.5 s band can never extend past
    // 2x anyway (ADVICE r16: the old comment mislabelled this 2.05x)
    assert(Bench.withinGate(1.45, 1.0))
    // a case that genuinely exercises the band: 0.3 s floor read at
    // 0.75 s is 2.5x — over the ratio gate, but dt - fl = 0.45 sits
    // within min(0.5, 0.6) = 0.5 (only floors in (0.25, 0.5) can
    // reach past 2x through the band)
    assert(Bench.withinGate(0.75, 0.3))
    // and just past the band at the same floor fails
    assert(!Bench.withinGate(0.81, 0.3))
  }

  test("band is capped at 2x the floor for tiny-floor cells") {
    // the ADVICE r15 scenario: 0.05 s floor at 0.55 s is an 11x
    // regression — the capped band (min(0.5, 0.1) = 0.1) rejects it
    assert(!Bench.withinGate(0.55, 0.05))
    // but 3x a tiny floor still passes via the capped band
    // (dt - fl = 0.1 <= min(0.5, 0.1))
    assert(Bench.withinGate(0.15, 0.05))
    // just above the capped band fails
    assert(!Bench.withinGate(0.151, 0.05))
  }

  test("large floors get no band help — pure 2x ratio") {
    assert(!Bench.withinGate(20.6, 10.0))
    assert(Bench.withinGate(20.0, 10.0))
  }

  test("genuine regressions stay over") {
    assert(!Bench.withinGate(5.0, 1.0))
    assert(!Bench.withinGate(2.6, 1.0))
  }
}
