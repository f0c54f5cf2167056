package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.search.HybridSearch.Weights

/** RRF weight algebra invariants (memory_engine.py:1795-1807). Properties
  * run through plain ScalaCheck (no scalatestplus bridge in the offline
  * cache). */
class WeightsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("defaults: vec 0.7 / bm25 0.3, nothing else") {
    val w = Weights.resolve(0.7, 0.0, 0.0, 0.0)
    assert(math.abs(w.vec - 0.7) < 1e-12 && math.abs(w.bm25 - 0.3) < 1e-12)
    assert(w.recency == 0.0 && w.feedback == 0.0 && w.confidence == 0.0)
  }

  test("documented example: rw=0.2 fw=cw=0.1") {
    val w = Weights.resolve(0.7, 0.2, 0.1, 0.1)
    assert(math.abs(w.vec - 0.7 * 0.8 * 0.8) < 1e-12)
    assert(math.abs(w.bm25 - 0.3 * 0.8 * 0.8) < 1e-12)
    assert(math.abs(w.recency - 0.2 * 0.8) < 1e-12)
    assert(w.feedback == 0.1 && w.confidence == 0.1)
  }

  test("all weights sum to 1 for in-range inputs") {
    check(Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (rw, fw, cw) =>
        math.abs(Weights.resolve(0.7, rw, fw, cw).coreSum - 1.0) < 1e-9
    })
  }

  test("aux overflow is normalized: fw+cw > 1 -> scaled to 1, core 0") {
    val w = Weights.resolve(0.7, 0.0, 0.8, 0.8)
    assert(math.abs(w.feedback - 0.5) < 1e-12)
    assert(math.abs(w.confidence - 0.5) < 1e-12)
    assert(w.vec == 0.0 && w.bm25 == 0.0)
  }

  test("out-of-range recency/feedback/confidence are clamped to [0,1]") {
    check(Prop.forAll(Gen.choose(-1.0, 2.0), Gen.choose(-1.0, 2.0), Gen.choose(-1.0, 2.0)) {
      (rw, fw, cw) =>
        val w = Weights.resolve(0.7, rw, fw, cw)
        Seq(w.vec, w.bm25, w.recency, w.feedback, w.confidence)
          .forall(x => x >= -1e-12 && x <= 1.0 + 1e-12)
    })
  }
}
