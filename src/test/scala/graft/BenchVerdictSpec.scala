package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench verdict taxonomy over synthetic timings (no Spark): the
  * end-of-suite retest may only CONVICT (`regressed`) when its own CPU
  * probe shows the box delivering quiet-run cycles — a retest executed
  * inside a still-degraded window is evidence, not a conviction
  * (VERDICT r11: `dedup_clusters_star` was stamped `regressed` by a
  * retest that itself ran under sustained host contention; the judge's
  * quiet re-measure cleared it at 1.13×).
  */
class BenchVerdictSpec extends AnyFunSuite {

  test("retest under the 1.5x bar is acquitted regardless of box state") {
    assert(BenchVerdicts.retestVerdict(1.0, Some(0.9),
      hot = false, probe = 0.09, probeFloor = 0.05) == "retested_ok")
    // a row with no quiet reference cannot be over the bar
    assert(BenchVerdicts.retestVerdict(1.0, None,
      hot = false, probe = 0.09, probeFloor = 0.05) == "retested_ok")
  }

  test("over the bar with hot stamps stays suspect (contention, in-artifact evidence)") {
    assert(BenchVerdicts.retestVerdict(2.0, Some(1.0),
      hot = true, probe = 0.09, probeFloor = 0.05) == "suspect")
  }

  test("over the bar, quiet stamps, probe above the conviction band: unresolved, not regressed") {
    // the r11 shape: retest 8.52s vs ref 5.185 (1.64x) while the probe
    // ran 20% over the quiet floor — the box was still degraded
    assert(BenchVerdicts.retestVerdict(8.52, Some(5.185),
      hot = false, probe = 0.06, probeFloor = 0.05) == "suspect_unresolved")
  }

  test("over the bar with the probe at the floor convicts") {
    assert(BenchVerdicts.retestVerdict(2.0, Some(1.0),
      hot = false, probe = 0.0505, probeFloor = 0.05) == "regressed")
  }

  test("a failed retest convicts only on a provably-quiet box") {
    assert(BenchVerdicts.retestVerdict(-1.0, Some(1.0),
      hot = false, probe = 0.05, probeFloor = 0.05) == "regressed")
    assert(BenchVerdicts.retestVerdict(-1.0, Some(1.0),
      hot = false, probe = 0.2, probeFloor = 0.05) == "suspect_unresolved")
  }

  test("the conviction band is exactly 10% over the floor") {
    val floor = 0.04
    val atBand = floor * BenchVerdicts.ProbeConvictionBand
    assert(BenchVerdicts.retestVerdict(2.0, Some(1.0),
      hot = false, probe = atBand, probeFloor = floor) == "regressed")
    assert(BenchVerdicts.retestVerdict(2.0, Some(1.0),
      hot = false, probe = atBand * 1.001, probeFloor = floor)
      == "suspect_unresolved")
  }
}
