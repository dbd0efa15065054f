package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleGate

/** The decade-up gate's adjudication is pure — pin every red path so a
  * regression in the GATE can't silently turn it green (and the 15-min
  * run isn't needed to test the decision table).
  */
class ScaleGateSpec extends AnyFunSuite {

  private val refusal = ScaleGate.ExpectedRefusals.head
  private def allRefusalsFail: Map[String, String] =
    ScaleGate.ExpectedRefusals.map(_ -> "IllegalArgumentException: n > 10000").toMap

  test("green: flat ratios, exactly the allow-listed refusals at 10x") {
    val base = Map("q1" -> 1.0, "q2" -> 2.0, refusal -> 0.5)
    val scaled = Map("q1" -> 2.0, "q2" -> 5.0, refusal -> 0.1)
    val v = ScaleGate.adjudicate(base, Map.empty, scaled, allRefusalsFail)
    assert(v.red === Nil)
    assert(v.sharedCount === 2)
    assert(v.medianRatio > 1.9 && v.medianRatio <= 2.5)
  }

  test("red: a shared query above its ceiling x margin") {
    val base = Map("q1" -> 1.0)
    // default ceiling 4.0 x margin 1.5 = 6.0; 8x at 8s is above both
    // the ceiling and the noise floor
    val v = ScaleGate.adjudicate(base, Map.empty, Map("q1" -> 8.0), Map.empty)
    assert(v.red.exists(_.contains("q1 ratio 8.0 exceeds ceiling")))
  }

  test("noise floor: the same ratio below NoiseFloorSec is not gated") {
    val v = ScaleGate.adjudicate(
      Map("q1" -> 0.1), Map.empty, Map("q1" -> 1.0), Map.empty)
    assert(v.red === Nil, "10x on a 1s query is floor noise, not a smell")
  }

  test("pinned ceiling: a query at its measured ratio stays green, above it goes red") {
    val (q, pin) = ScaleGate.PinnedCeilings.maxBy(_._2) // the loosest pin
    val ok = ScaleGate.adjudicate(
      Map(q -> 2.0), Map.empty, Map(q -> 2.0 * pin), Map.empty)
    assert(ok.red === Nil)
    val bad = ScaleGate.adjudicate(
      Map(q -> 2.0), Map.empty, Map(q -> 2.0 * pin * 1.6), Map.empty)
    assert(bad.red.exists(_.startsWith(q)))
  }

  test("red: an unexpected failure at 10x") {
    val v = ScaleGate.adjudicate(
      Map("q1" -> 1.0), Map.empty, Map("q1" -> 1.0),
      Map("q1" -> "OutOfMemoryError: boom"))
    assert(v.red.exists(_.contains("not an allow-listed refusal")))
  }

  test("red: an expected refusal that stopped refusing (guard regression)") {
    val base = Map(refusal -> 0.5)
    val scaled = Map(refusal -> 5.0) // ran and SUCCEEDED at 10x
    val v = ScaleGate.adjudicate(base, Map.empty, scaled,
      allRefusalsFail - refusal)
    assert(v.red.exists(r => r.startsWith(refusal) && r.contains("guard regressed")))
  }

  test("red: any failure at base scale") {
    val v = ScaleGate.adjudicate(
      Map("q1" -> 1.0), Map("q1" -> "boom"), Map("q1" -> 1.0), Map.empty)
    assert(v.red.exists(_.contains("failed at BASE scale")))
  }

  test("a query that failed at base does not double-report at 10x") {
    val v = ScaleGate.adjudicate(
      Map("q1" -> 1.0), Map("q1" -> "boom"),
      Map("q1" -> 1.0), Map("q1" -> "boom"))
    assert(v.red.size === 1)
  }

  test("absolute band: a pinned-width twin is judged on sf1.0 seconds, not ratio") {
    val (q, band) = ScaleGate.AbsoluteBands.head
    // a monstrous RATIO under the band stays green (the 1.2s denominator
    // must not be able to redden a constant-volume twin)...
    val ok = ScaleGate.adjudicate(
      Map(q -> 0.5), Map.empty, Map(q -> (band - 1.0)), Map.empty)
    assert(ok.red === Nil)
    // ...and a modest ratio ABOVE the band goes red
    val bad = ScaleGate.adjudicate(
      Map(q -> (band / 2.0)), Map.empty, Map(q -> (band + 5.0)), Map.empty)
    assert(bad.red.exists(r => r.startsWith(q) && r.contains("band")))
  }

  test("anti-vacuity: the margin, ceilings and bands are sane") {
    assert(ScaleGate.Margin > 1.0 && ScaleGate.Margin < 3.0)
    assert(ScaleGate.PinnedCeilings.values.forall(c => c >= ScaleGate.DefaultCeiling))
    assert(ScaleGate.ExpectedRefusals.size === 6)
    assert(ScaleGate.AbsoluteBands.keySet.intersect(
      ScaleGate.PinnedCeilings.keySet).isEmpty,
      "a query must have exactly one adjudication rule")
    assert(ScaleGate.AbsoluteBands.values.forall(b => b > 10.0 && b < 300.0))
  }
}
