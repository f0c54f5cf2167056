package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench output line is the round's only perf signal: the driver parses
  * it out of the LAST 2000 characters of captured sbt output (rounds 2 and 3
  * both recorded parsed=null when the full-registry line outgrew that
  * window). These tests pin the headline set to the registry and the worst-
  * case line length to the window, so a registry rename or an over-grown
  * headline set fails CI instead of silently costing the round its number.
  */
class BenchSpec extends AnyFunSuite {

  test("every headline query exists in the registry") {
    val missing = Bench.Headline.filterNot(Queries.all.contains)
    assert(missing.isEmpty, s"headline names not in Queries.all: $missing")
  }

  test("headline names are unique") {
    assert(Bench.Headline.distinct.size == Bench.Headline.size)
  }

  test("anchor subset is timed (⊆ headline), unique, and frozen at 32") {
    val missing = Bench.Anchor.filterNot(Bench.Headline.contains)
    assert(missing.isEmpty, s"anchor names not timed by the headline: $missing")
    assert(Bench.Anchor.distinct.size == Bench.Anchor.size)
    // the longitudinal series only works if the set NEVER changes: 32 is
    // the r4..r7 intersection, frozen — additions would reset the series
    assert(Bench.Anchor.size == 32)
  }

  test("median is the sorted middle (odd) or mid-pair mean (even)") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }

  test("emitted line carries the anchor and rep fields the driver parses") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala")))
    for (field <- Seq("\"anchor_total\":", "\"anchor_n\":", "\"reps\":",
        "\"stat\":\"median\"",
        // round-9 contention defenses: min-of-reps totals + the start/end
        // CPU calibration scalars that make a loaded machine visible from
        // the artifact itself (r6/r8 gate numbers were contaminated)
        "\"value_min\":", "\"anchor_total_min\":",
        "\"cal_start_ms\":", "\"cal_end_ms\":",
        // round-10 (r9 verdict #2): per-rep anchor sums make the min
        // auditable; cal_ms samples the kernel THROUGH the run, closing
        // the endpoint blind spot BENCH_r09 demonstrated
        "\"anchor_reps\":", "\"cal_ms\":"))
      assert(src.contains(field), s"bench line must carry $field")
  }

  test("calibration kernel is repeatable within 3x on this machine") {
    // not an absolute-speed assertion (machines differ) — only that two
    // back-to-back runs of the fixed kernel agree within a loose factor,
    // i.e. the scalar is stable enough to flag 2-4x contention stretches
    val a = Bench.calibrate()
    val b = Bench.calibrate()
    assert(a > 0 && b > 0)
    assert(math.max(a, b) <= 3L * math.min(a, b),
      s"calibration kernel unstable: $a ms vs $b ms")
  }

  test("worst-case bench line fits the driver's 2000-char tail window " +
    "with >500 chars of slack") {
    // value worst case: 4-digit seconds at 3 decimals ("9999.999" = 8 chars);
    // sentinel "-1.0" is shorter. Overhead mirrors Bench.main's template.
    // Budget 1500 = 2000-char driver window − 500 slack: even if the
    // capture window opens mid-line in earlier output, the whole headline
    // line plus a cushion fits.
    val perQuery = Bench.Headline.map(n => n.length + 2 + 1 + 8 + 1).sum
    // fixed template + the round-8 anchor/reps/stat fields (~70 chars)
    // + the round-9 min/calibration fields (~90 chars worst case)
    // + the round-10 anchor_reps (3×8+brackets ≈ 45) and cal_ms array
    //   (⌈|headline|/8⌉+2 samples × ~6 chars ≈ 60 worst case)
    // + the round-14 vmax rep-variance scalar (ratio at 3 decimals,
    //   16 worst case)
    val overhead = 290 + 45 + 60 + 16 + "/root/testdata/sf0.1".length
    val worst = perQuery + overhead
    assert(worst <= 1500, s"estimated worst-case line $worst chars; " +
      "trim Bench.Headline or shorten names — the driver window is 2000 " +
      "and the line needs 500 chars of slack")
  }

  test("bench main emits the headline as the final action, after stop") {
    // nothing may log after the headline: the println must follow
    // spark.stop() (and the log-level OFF) in the source — a structural
    // pin, since the spec can't observe the driver's merged capture
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala")))
    val iStop = src.indexOf("spark.stop()")
    val iPrint = src.indexOf("println(line)")
    val iOff = src.indexOf("setLogLevel(\"OFF\")")
    assert(iStop >= 0 && iPrint >= 0 && iOff >= 0,
      "Bench.main must set log level OFF, stop spark, then println(line)")
    assert(iOff < iStop && iStop < iPrint,
      "headline println must be the final action: OFF -> stop -> println")
  }
}
