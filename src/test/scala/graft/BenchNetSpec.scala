package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's calib-normalized per-query sanity net: reference artifacts
  * parse with their calibration samples, cross-host normalization scales
  * the bound by the calibration ratio (closing the round-12 blind band
  * where a 2.8× drift escaped both same-host triggers), and the FIRST
  * reference carrying a query wins — later artifacts only fill queries
  * the round boundary lacks (closing the round-14 laundering, where a
  * same-round mid-bench artifact's "tightest wins" shadowed the boundary
  * bound and the net fired zero times against a 1.18× regression).
  */
class BenchNetSpec extends AnyFunSuite {

  test("previousArtifact parses queries + calibration; rejects other-sf artifacts") {
    val dir = java.nio.file.Files.createTempDirectory("bench_net")
    val p = dir.resolve("prev.json")
    java.nio.file.Files.writeString(p,
      """{"metric":"total","value":10.0,"calib_sec":0.4,"calib_scan_sec":1.2,""" +
        """"queries":{"q1":1.5,"q2":0.2},"sf":"/data/sf0.1"}""")
    val art = Bench.previousArtifact(p.toString, "/data/sf0.1").get
    assert(art.times == Map("q1" -> 1.5, "q2" -> 0.2))
    assert(art.calibCpu.contains(0.4) && art.calibScan.contains(1.2))
    assert(Bench.previousArtifact(p.toString, "/data/sf0.01").isEmpty)
    assert(Bench.previousArtifact(dir.resolve("absent.json").toString, "/data/sf0.1").isEmpty)
  }

  test("adjustedPrev: bound scales with the host ratio; first reference wins; floor holds") {
    import Bench.PrevArtifact
    val boundary = PrevArtifact("a", Map("q1" -> 1.0), Some(0.4), Some(1.0))
    // Current host 2x slower on the CPU axis: the bound doubles — a query
    // at 1.9s is NOT flagged (host), one at 4.1s still is (> 2 x 2.0).
    val adj = Bench.adjustedPrev(Seq(boundary), calibCpu = 0.8, calibScan = 1.0)
    assert(math.abs(adj("q1") - 2.0) < 1e-9)
    // POSITIONAL priority: the round-boundary artifact (first) provides q1's
    // bound even though the same-round local artifact (second) is "tighter"
    // after normalization — a mid-round artifact must never launder drift it
    // itself recorded. The local artifact only FILLS q3, which the boundary
    // has no entry for (a query new this round).
    val local = PrevArtifact("b", Map("q1" -> 1.2, "q3" -> 0.5), Some(0.8), Some(1.0))
    val both = Bench.adjustedPrev(Seq(boundary, local), 0.8, 1.0)
    assert(math.abs(both("q1") - 2.0) < 1e-9) // boundary's scaled bound, not local's
    assert(math.abs(both("q3") - 0.5) < 1e-9) // filled from local (boundary lacks it)
    // Corrupt/tiny current calibration cannot collapse bounds below the floor.
    val floored = Bench.adjustedPrev(Seq(boundary), 0.001, 0.001)
    assert(math.abs(floored("q1") - 0.25) < 1e-9)
    // Missing calibration on the reference: ratio falls back to 1 per axis.
    val noCalib = PrevArtifact("c", Map("q1" -> 1.0), None, None)
    assert(math.abs(Bench.adjustedPrev(Seq(noCalib), 5.0, 5.0)("q1") - 1.0) < 1e-9)
  }

  test("tight trigger applies to untouched queries even when shared sources changed") {
    // Round-14 blind spot: ANY shared main-source change disabled tightening
    // wholesale (tight_trigger_count: 0 on every substantive round). The
    // trigger's consequence is only a quiet-gated re-measurement, so an
    // untouched defining file earns it regardless of shared-file changes.
    val defining = graft.queries.Registry.definingFile
    val someQuery = defining.keys.head
    val diff = Some(Set("src/main/scala/graft/ops/Layout.scala")) // shared file
    val tight = Bench.tightTriggerQueries(diff, Seq(someQuery))
    assert(tight(someQuery),
      "a query whose defining file is untouched keeps the 1.25x trigger")
    // A query whose OWN defining file changed stays on the wide 2x band.
    val own = Bench.tightTriggerQueries(Some(Set(defining(someQuery))), Seq(someQuery))
    assert(!own(someQuery))
    // No git boundary: fail closed, nothing tightened.
    assert(Bench.tightTriggerQueries(None, Seq(someQuery)).isEmpty)
  }

  test("rerun candidates: stable drift outranks noisy ratio; stable 1.4x fires, noisy 1.5x does not") {
    val names = Seq("stable14", "noisy23", "noisy15", "small", "fine")
    val prev = Map("stable14" -> 2.0, "noisy23" -> 2.0, "noisy15" -> 2.0,
      "small" -> 0.05, "fine" -> 2.0)
    val results = Map(
      "stable14" -> 3.0, // 1.5x, spread tight → stable-drift trigger fires
      "noisy23" -> 4.6,  // 2.3x, spread ≈ value → ratio trigger fires, ranked LAST
      "noisy15" -> 3.0,  // 1.5x, spread ≈ value, file unchanged? not tight → no fire
      "small" -> 0.2,    // 4x but excess < 0.3s → absolute floor holds
      "fine" -> 2.1)     // no drift
    val spreads = Map("stable14" -> 0.1, "noisy23" -> 4.0, "noisy15" -> 2.8,
      "small" -> 0.0, "fine" -> 0.05)
    val got = Bench.rerunCandidates(names, results, spreads, prev, tight = Set.empty)
    assert(got.map(_._1) == Seq("stable14", "noisy23"),
      s"stable drift first, noisy ratio second, rest quiet: $got")
    val (_, ratio, spread, stable) = got.head
    assert(stable && math.abs(ratio - 1.5) < 1e-9 && spread == 0.1)
    assert(!got(1)._4, "the 2.3x candidate is marked unstable")
    // The tight (1.25x) band still fires ratio-only for unchanged queries.
    val tightGot = Bench.rerunCandidates(Seq("noisy15"), results, spreads,
      prev, tight = Set("noisy15"))
    assert(tightGot.map(_._1) == Seq("noisy15"))
  }

  test("replacement policy is improve-only: a strictly-worse re-measure never replaces") {
    // The round-17 driver artifact's failure case verbatim: first pass
    // 0.895s, end-of-run re-measure 3.103s under accumulated storage
    // pressure. The re-measure exists to refute suspected slow-bias; a
    // worse sample refutes nothing and must be discarded (disclosed), not
    // kept as the number.
    assert(!Bench.acceptRemeasure(standing = 0.895, remeasured = 3.103))
    // A quiet re-measure that clears the suspicion replaces.
    assert(Bench.acceptRemeasure(standing = 0.895, remeasured = 0.574))
    // Equal is acceptable (idempotent re-measure).
    assert(Bench.acceptRemeasure(standing = 1.0, remeasured = 1.0))
  }
}
