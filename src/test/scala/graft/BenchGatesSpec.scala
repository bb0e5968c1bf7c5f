package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchGates]]: the bench adjudication pass must never gate against
  * nothing silently (r15 verdict #1 — the driver artifact shipped two
  * breaching numbers with empty flag lists because a wrong-cwd run
  * parsed zero baseline rows). These tests run the resolution from a
  * SCRATCH directory and assert both the loud zero-rows path and the
  * two anchors (env override, ancestor walk). */
class BenchGatesSpec extends AnyFunSuite {

  private def scratch(prefix: String) =
    Files.createTempDirectory(prefix)

  private val noEnv: String => Option[String] = _ => None

  test("a scratch cwd with no BASELINE.md anywhere resolves to ZERO rows — the loud path") {
    val dir = scratch("graft-benchgates-none")
    val t = BenchGates.load(dir, noEnv)
    assert(t.dir.isEmpty)
    assert(t.rowsGated === 0)
  }

  test("the env anchor wins over the cwd walk and is never second-guessed") {
    val anchored = scratch("graft-benchgates-anchor")
    Files.writeString(anchored.resolve("BASELINE.md"),
      "| scenario | seconds |\n|---|---|\n| q1_agg | 1.50 |\n")
    Files.writeString(anchored.resolve("BASELINE_r3.md"),
      "| q1_agg | 0.80 |\n| q2_new | 0.40 |\n")
    Files.writeString(anchored.resolve("BASELINE_r11.md"),
      "| q1_agg | 0.70 |\n")
    val elsewhere = scratch("graft-benchgates-cwd")
    val t = BenchGates.load(elsewhere,
      k => if (k == BenchGates.AnchorEnv) Some(anchored.toString) else None)
    assert(t.dir === Some(anchored))
    assert(t.ref === Map("q1_agg" -> 1.5))
    // newest BASELINE_r* wins per scenario; absent scenarios inherit
    assert(t.fwd === Map("q1_agg" -> 0.7, "q2_new" -> 0.4))
    assert(t.rowsGated === 3)
    // an env anchor naming a directory with no tables is still the
    // anchor: its emptiness surfaces as rowsGated = 0, loudly
    val empty = scratch("graft-benchgates-emptyanchor")
    val t2 = BenchGates.load(elsewhere,
      k => if (k == BenchGates.AnchorEnv) Some(empty.toString) else None)
    assert(t2.dir === Some(empty))
    assert(t2.rowsGated === 0)
  }

  test("without the env anchor, the walk finds BASELINE.md in an ancestor of the cwd") {
    val root = scratch("graft-benchgates-walk")
    Files.writeString(root.resolve("BASELINE.md"), "| q1_agg | 2.00 |\n")
    Files.writeString(root.resolve("BASELINE_WAIVERS.md"),
      "| slow_thing | 9.00 |\n")
    val nested = root.resolve("a/b/c")
    Files.createDirectories(nested)
    val t = BenchGates.load(nested, noEnv)
    assert(t.dir === Some(root.toAbsolutePath.normalize))
    assert(t.ref === Map("q1_agg" -> 2.0))
    assert(t.waivers === Map("slow_thing" -> 9.0))
    assert(t.rowsGated === 2)
  }

  test("this repo's own root resolves from the repo cwd with hundreds of gate rows") {
    // the real invariant the driver run needs: launched from the repo
    // (or any subdirectory), the pass gates against the committed tables
    val t = BenchGates.load(Paths.get(".").toAbsolutePath, noEnv)
    assert(t.dir.isDefined)
    assert(t.ref.nonEmpty, "BASELINE.md rows must parse")
    assert(t.fwd.size > 200, s"forward baseline rows: ${t.fwd.size}")
  }
}
