package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scaling-protocol measurement machinery that the per-round
  * BENCH artifact is built from (no Spark session involved): the
  * PairResult estimators and JSON surface, and the MemProbe bandwidth
  * instrument Bench's contention retry selects passes by. */
class ScalingProtocolSpec extends AnyFunSuite {

  private def pr(lows: Seq[Double], highs: Seq[Double]) =
    ScalingBench.PairResult(
      nPages = 1000, nEdges = 10000, iters = 4,
      lowCpus = 2, highCpus = 8, lows = lows, highs = highs)

  test("headline efficiency is the MEDIAN of paired per-trial ratios") {
    // trial ratios: (80/25, 80/25, 80/80)/4 = (0.8, 0.8, 0.25) → median 0.8:
    // one arbitrarily-bad high leg does not move the headline
    val p = pr(Seq(80, 80, 80), Seq(25, 25, 80))
    assert(math.abs(p.efficiency - 0.8) < 1e-12)
    // the legacy min-ratio estimator pairs best-low with best-high
    // (80/25)/4 = 0.8 here — both agree when the best samples are clean
    assert(math.abs(p.efficiencyMinRatio - 0.8) < 1e-12)
  }

  test("min-ratio estimator IS skewed by a one-sided outlier, median is not") {
    // a single fast 2-core sample (60s) with ordinary high legs: min-ratio
    // reads (60/25)/4 = 0.6 while the per-trial pairing stays at 0.8
    val p = pr(Seq(80, 60, 80), Seq(25, 25, 25))
    assert(math.abs(p.efficiencyMinRatio - 0.6) < 1e-12)
    assert(math.abs(p.efficiency - 0.8) < 1e-12)
  }

  test("PairResult JSON carries trials, both estimators, load and probe logs") {
    val p = ScalingBench.PairResult(1000, 10000, 4, 2, 8,
      Seq(80.0, 82.0), Seq(21.0, 22.0),
      loadLow = Seq(1.5, 1.6), loadHigh = Seq(8.2, 8.1),
      probeLow = Seq(14.2, 13.9), probeHigh = Seq(14.0, 13.8))
    val j = p.json
    for (k <- Seq("trials_low_sec", "trials_high_sec", "paired_efficiency",
        "efficiency_minratio", "\"efficiency\"", "load1_low", "load1_high",
        "probe_gbps_low", "probe_gbps_high"))
      assert(j.contains(k), s"missing $k in $j")
    // absent logs must not emit empty arrays (older-round JSON shape)
    val bare = pr(Seq(80.0), Seq(21.0)).json
    assert(!bare.contains("load1_low") && !bare.contains("probe_gbps_low"))
  }

  test("MemProbe reads a plausible bandwidth and survives release/re-ensure") {
    val g1 = MemProbe.gbps(passes = 2)
    assert(g1 > 0.1 && g1 < 10000.0 && !g1.isNaN)
    MemProbe.release()
    val g2 = MemProbe.gbps(passes = 1)
    assert(g2 > 0.1 && !g2.isNaN)
    MemProbe.release()
  }
}
