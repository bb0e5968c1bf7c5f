package graft

import java.nio.file.{Files, Path, Paths}

/** Baseline-table resolution for [[Bench]]'s self-adjudication pass —
  * extracted so the loud zero-rows path is unit-testable from a
  * scratch working directory (r15 verdict #1).
  *
  * The r15 driver artifact shipped two gate-breaching numbers with
  * EMPTY `breached`/`unadjudicated` lists because the pass read
  * `BASELINE*.md` relative to the bench process's bare cwd: in the
  * driver's working directory the files did not resolve, the parse
  * returned empty maps, and gating against ZERO rows flagged nothing —
  * a silent vacuous pass (`check_bench.py` exited 1 on the same
  * numbers). Resolution is now anchored: an explicit
  * `SPARK_GRAFT_BASELINE_DIR` wins; otherwise the resolver walks UP
  * from the starting directory to the first ancestor containing
  * `BASELINE.md` (the repo root, from any subdirectory the driver
  * launches in). The caller records `rowsGated` in the artifact and,
  * when it is zero, marks EVERY scenario unadjudicated — which
  * `check_bench.py` fails on — instead of proceeding gate-less.
  */
object BenchGates {

  /** The env var that pins the baseline directory explicitly. */
  val AnchorEnv = "SPARK_GRAFT_BASELINE_DIR"

  /** The resolved gate tables. `rowsGated` is what the artifact
    * records: the total number of scenario gate rows the adjudication
    * pass is actually checking against — zero means the pass is
    * vacuous and must fail loudly, never silently. */
  final case class Tables(
      ref: Map[String, Double],
      fwd: Map[String, Double],
      waivers: Map[String, Double],
      dir: Option[Path]) {
    def rowsGated: Int = ref.size + fwd.size + waivers.size
  }

  /** `name -> seconds` from a `| name | 1.23 |` markdown table.
    * Explicit UTF-8: the baseline tables carry en-dashes/multiply
    * signs, and a default-charset read threw MalformedInputException
    * under non-UTF-8 locales (the round-7 failure class). */
  def parseMdTable(p: Path): Map[String, Double] =
    if (!Files.exists(p)) Map.empty
    else {
      val text = new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val row = """\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|""".r
      text.linesIterator.flatMap { line =>
        row.findFirstMatchIn(line).map(m => m.group(1) -> m.group(2).toDouble)
      }.toMap
    }

  /** Anchor the baseline directory: the env override if it names an
    * existing directory (even one without tables — an explicit anchor
    * is never second-guessed, its emptiness surfaces as rowsGated = 0),
    * else the first ancestor of `start` (inclusive) containing
    * `BASELINE.md`. None when neither resolves — the loud path. */
  def resolveBaselineDir(
      start: Path, env: String => Option[String]): Option[Path] =
    env(AnchorEnv).map(Paths.get(_)).filter(Files.isDirectory(_)).orElse {
      Iterator.iterate(start.toAbsolutePath.normalize)(_.getParent)
        .takeWhile(_ != null)
        .take(64) // a filesystem root chain is short; belt over loop bugs
        .find(d => Files.exists(d.resolve("BASELINE.md")))
    }

  /** Load all three gate tables from the anchored directory:
    * `BASELINE.md` (the round-1 reference table, 2x gate), the NEWEST
    * `BASELINE_r*.md` per scenario (forward gate, glob in round order,
    * newest wins — mirrors check_bench.py), and `BASELINE_WAIVERS.md`
    * (adjudicated bounds that replace both gates). */
  def load(start: Path, env: String => Option[String]): Tables =
    resolveBaselineDir(start, env) match {
      case None => Tables(Map.empty, Map.empty, Map.empty, None)
      case Some(dir) =>
        val ref = parseMdTable(dir.resolve("BASELINE.md"))
        val fwd = {
          import scala.jdk.CollectionConverters._
          val rx = """BASELINE_r(\d+)\.md""".r
          val files = Files.list(dir).iterator().asScala
            .flatMap { p =>
              p.getFileName.toString match {
                case rx(n) => Some((n.toInt, p))
                case _ => None
              }
            }.toSeq.sortBy(_._1).map(_._2)
          files.foldLeft(Map.empty[String, Double])(_ ++ parseMdTable(_))
        }
        val waivers = parseMdTable(dir.resolve("BASELINE_WAIVERS.md"))
        Tables(ref, fwd, waivers, Some(dir))
    }
}
