package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's calib-normalized per-query sanity net: reference artifacts
  * parse with their calibration samples, cross-host normalization scales
  * the bound by the calibration ratio (closing the round-12 blind band
  * where a 2.8× drift escaped both same-host triggers), and the tightest
  * reference wins.
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

  test("adjustedPrev: bound scales with the host ratio; tightest reference wins; floor holds") {
    import Bench.PrevArtifact
    val slowHostRun = PrevArtifact("a", Map("q1" -> 1.0), Some(0.4), Some(1.0))
    // Current host 2x slower on the CPU axis: the bound doubles — a query
    // at 1.9s is NOT flagged (host), one at 4.1s still is (> 2 x 2.0).
    val adj = Bench.adjustedPrev(Seq(slowHostRun), calibCpu = 0.8, calibScan = 1.0)
    assert(math.abs(adj("q1") - 2.0) < 1e-9)
    // Tightest of two references wins per query.
    val local = PrevArtifact("b", Map("q1" -> 1.2, "q3" -> 0.5), Some(0.8), Some(1.0))
    val both = Bench.adjustedPrev(Seq(slowHostRun, local), 0.8, 1.0)
    assert(math.abs(both("q1") - 1.2) < 1e-9) // local ratio 1.0 beats scaled 2.0
    assert(math.abs(both("q3") - 0.5) < 1e-9)
    // Corrupt/tiny current calibration cannot collapse bounds below the floor.
    val floored = Bench.adjustedPrev(Seq(slowHostRun), 0.001, 0.001)
    assert(math.abs(floored("q1") - 0.25) < 1e-9)
    // Missing calibration on the reference: ratio falls back to 1 per axis.
    val noCalib = PrevArtifact("c", Map("q1" -> 1.0), None, None)
    assert(math.abs(Bench.adjustedPrev(Seq(noCalib), 5.0, 5.0)("q1") - 1.0) < 1e-9)
  }
}
