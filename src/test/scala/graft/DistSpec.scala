package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Dist

/** Golden values from Python's statistics.NormalDist (the reference's
  * distribution backend, alphastats/stats.py:18).
  */
class DistSpec extends AnyFunSuite {
  private val cdfCases = Seq(
    -3.5 -> 0.0002326290790355401,
    -1.959963984540054 -> 0.025000000000000022,
    -0.5 -> 0.3085375387259869,
    0.0 -> 0.5,
    0.3 -> 0.6179114221889526,
    1.0 -> 0.8413447460685429,
    2.5 -> 0.9937903346742238,
    4.2 -> 0.9999866542509841)

  private val invCases = Seq(
    0.001 -> -3.090232306167813,
    0.05 -> -1.6448536269514726,
    0.25 -> -0.6744897501960817,
    0.5 -> 0.0,
    0.75 -> 0.6744897501960817,
    0.95 -> 1.6448536269514715,
    0.999 -> 3.090232306167813)

  test("cdf matches NormalDist to 1e-12") {
    cdfCases.foreach { case (x, want) =>
      assert(math.abs(Dist.cdf(x) - want) < 1e-12, s"cdf($x)=${Dist.cdf(x)} want $want")
    }
  }

  test("invCdf matches NormalDist (AS241) to 1e-12") {
    invCases.foreach { case (p, want) =>
      assert(math.abs(Dist.invCdf(p) - want) < 1e-12, s"invCdf($p)=${Dist.invCdf(p)} want $want")
    }
  }

  test("cdf/invCdf round-trip") {
    Seq(0.01, 0.2, 0.5, 0.77, 0.99).foreach { p =>
      assert(math.abs(Dist.cdf(Dist.invCdf(p)) - p) < 1e-12)
    }
  }
}
