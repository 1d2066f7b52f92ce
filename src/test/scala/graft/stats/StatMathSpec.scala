package graft.stats

import org.scalatest.funsuite.AnyFunSuite

class StatMathSpec extends AnyFunSuite {
  import StatMath._

  test("lnGamma matches known values") {
    assert(math.abs(lnGamma(1.0)) < 1e-10)
    assert(math.abs(lnGamma(2.0)) < 1e-10)
    assert(math.abs(lnGamma(5.0) - math.log(24.0)) < 1e-10)
    assert(math.abs(lnGamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-10)
  }

  test("chi2Sf matches reference values (scipy chi2.sf)") {
    // scipy.stats.chi2.sf(3.84, 1) = 0.050043...
    assert(math.abs(chi2Sf(3.841459, 1) - 0.05) < 1e-4)
    // chi2.sf(5.991, 2) = 0.05
    assert(math.abs(chi2Sf(5.991465, 2) - 0.05) < 1e-4)
    // chi2.sf(0, k) = 1
    assert(chi2Sf(0.0, 3) == 1.0)
    // chi2.sf(100, 3) ~ 1.3e-21, essentially 0
    assert(chi2Sf(100.0, 3) < 1e-15)
  }

  test("chi2TwoSample: identical distributions -> stat 0, p 1") {
    val (stat, p) = chi2TwoSample(Array(100L, 200L, 300L), Array(100L, 200L, 300L))
    assert(stat == 0.0 && p == 1.0)
  }

  test("chi2TwoSample: hand-computed 2x2 case") {
    // ref (10, 20), prod (20, 10). pooled p = .5/.5, total per sample 30.
    // expected 15 each; stat = 4 * 25/15 = 6.6667; df=1; p = chi2.sf(6.6667,1) = 0.009823
    val (stat, p) = chi2TwoSample(Array(10L, 20L), Array(20L, 10L))
    assert(math.abs(stat - 20.0 / 3.0) < 1e-10)
    assert(math.abs(p - 0.009823) < 1e-4)
  }

  test("kolmogorovSf endpoints and known point") {
    assert(kolmogorovSf(0.0) == 1.0)
    assert(kolmogorovSf(10.0) < 1e-15)
    // Q_KS(1.0) = 0.26999967...
    assert(math.abs(kolmogorovSf(1.0) - 0.27) < 1e-3)
  }

  test("ksPValue: d=0 -> ~1; large d -> ~0") {
    assert(ksPValue(0.0, 1000, 1000) > 0.999)
    assert(ksPValue(0.5, 1000, 1000) < 1e-10)
  }

  test("psi: identical -> 0, shifted -> positive and monotone") {
    val p = Array(0.25, 0.25, 0.25, 0.25)
    assert(psi(p, p) == 0.0)
    val q1 = Array(0.30, 0.25, 0.25, 0.20)
    val q2 = Array(0.40, 0.25, 0.25, 0.10)
    assert(psi(p, q1) > 0.0)
    assert(psi(p, q2) > psi(p, q1))
  }

  test("permutation is deterministic and a valid permutation") {
    val p1 = permutation(100, 31L)
    val p2 = permutation(100, 31L)
    assert(p1.sameElements(p2))
    assert(p1.sorted.sameElements(Array.tabulate(100)(identity)))
    val p3 = permutation(100, 32L)
    assert(!p1.sameElements(p3))
  }
}

class MmdSpec extends AnyFunSuite {
  import Mmd._

  private def gauss(n: Int, d: Int, mean: Double, seed: Long): Array[Array[Double]] = {
    val rng = new StatMath.SplitMix64(seed)
    Array.fill(n)(Array.fill(d) {
      // Box-Muller
      val u1 = math.max(rng.nextDouble(), 1e-12)
      val u2 = rng.nextDouble()
      mean + math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    })
  }

  test("rbf kernel: k(x,x)=1, symmetric, decreasing in distance") {
    val x = Array(1.0, 2.0)
    val y = Array(1.5, 2.5)
    val z = Array(5.0, 5.0)
    assert(rbf(x, x, 1.0) == 1.0)
    assert(math.abs(rbf(x, y, 1.0) - rbf(y, x, 1.0)) < 1e-15)
    assert(rbf(x, y, 1.0) > rbf(x, z, 1.0))
  }

  test("rbf hand value: ||x-y||^2=2, sigma=1 -> exp(-1)") {
    assert(math.abs(rbf(Array(0.0, 0.0), Array(1.0, 1.0), 1.0) - math.exp(-1.0)) < 1e-12)
  }

  test("medianHeuristicSigma on 3 collinear points") {
    // points 0, 1, 3 on a line: pdist = (1, 3, 2), median = 2
    val s = medianHeuristicSigma(Array(Array(0.0), Array(1.0), Array(3.0)))
    assert(math.abs(s - 2.0) < 1e-12)
  }

  test("mmd2 hand-computed on 2+2 points") {
    val x = Array(Array(0.0), Array(1.0))
    val y = Array(Array(0.0), Array(1.0))
    // identical samples: kxx term = kyy term; mmd2 = 2k(0,1)/2*2... compute:
    // kxx = k(x0,x1) = exp(-0.5/sigma^2); terms: 2*kxx/(2*1)=kxx; same kyy.
    // kxy = k00+k01+k10+k11 = 1 + e + e + 1; -2/(4)*kxy = -(2+2e)/2 = -1-e
    // total = e + e - 1 - e = e - 1 where e = exp(-0.5)
    val got = mmd2(x, y, 1.0)
    val e = math.exp(-0.5)
    assert(math.abs(got - (e - 1.0)) < 1e-12)
    assert(distance(x, y, 1.0) == 0.0) // floored at 0
  }

  test("self-comparison gives ~0 distance, high p; shifted gives drift") {
    val ref = gauss(150, 2, 0.0, 1L)
    val same = gauss(150, 2, 0.0, 2L)
    val far = gauss(150, 2, 3.0, 3L)
    val sigma = medianHeuristicSigma(ref)
    val (dSame, pSame) = permutationTest(ref, same, sigma, 100, 31L)
    val (dFar, pFar) = permutationTest(ref, far, sigma, 100, 31L)
    assert(pSame > 0.05, s"self-compare p=$pSame should be high")
    assert(pFar <= 0.01, s"shifted p=$pFar should be tiny")
    assert(dFar > dSame)
  }

  test("permutation test is deterministic") {
    val ref = gauss(80, 2, 0.0, 1L)
    val prod = gauss(80, 2, 0.5, 2L)
    val s = medianHeuristicSigma(ref)
    val r1 = permutationTest(ref, prod, s, 50, 31L)
    val r2 = permutationTest(ref, prod, s, 50, 31L)
    assert(r1 == r2)
  }
}
