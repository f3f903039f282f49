package graft.rdf

import scala.sys.process._

import graft.SparkSpec

/** CI smoke over the three JS-mirror soup sweeps (r17 VERDICT item 4).
  *
  * The multi-seed token-soup sweeps are the mirrors' strongest
  * regression detector — they found the V8 int32 zone-offset wrap, the
  * JS whitespace set, the UTS46 mapping order and the ANSI `conv`
  * overflow — but lived only as manual `Test/runMain` dev harnesses, so
  * a mirror regression could ship and surface at judge time. This spec
  * runs a SMALL FIXED seed set per mirror (a few hundred inputs each,
  * seconds of wall time) inside `sbt test`, gated on node being
  * available (the sweeps are differential: node IS the oracle). The
  * deep sweeps remain available as `Test/runMain graft.rdf.*SoupSweep
  * [nSeeds]` for dev iteration.
  */
class SoupSweepSmokeSpec extends SparkSpec {

  private def nodePresent: Boolean = "which node".! == 0

  // Seeds deliberately DISJOINT from the specs' fixed-seed live fuzz
  // (which covers seed 1's neighborhood) so the smoke adds coverage
  // instead of re-running identical inputs.
  private val smokeSeeds = Seq(11, 23, 37, 41, 53)

  test("date mirror smoke sweep: 5 seeds x 600 token soups agree with node") {
    assume(nodePresent, "node not on PATH — smoke sweep skipped")
    assert(JsDateSoupSweep.sweep(smokeSeeds) == 0)
  }

  test("url mirror smoke sweep: 5 seeds x 500 host soups agree with node") {
    assume(nodePresent, "node not on PATH — smoke sweep skipped")
    assert(JsUrlSoupSweep.sweep(smokeSeeds) == 0)
  }

  test("number mirror smoke sweep: 5 seeds x 400 numeric soups agree with node") {
    assume(nodePresent, "node not on PATH — smoke sweep skipped")
    val (bad, n) = JsNumberSoupSweep.sweep(smokeSeeds, spark)
    assert(n > 1000, s"smoke swept only $n inputs — seed generation changed?")
    assert(bad == 0)
  }
}
