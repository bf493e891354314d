package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Pins the bench self-adjudication canary ENGAGED.
  *
  * `Bench.loadReference` parses the committed reference composite to
  * decide `admissible: true/false` per run. Twice in project history
  * (rounds 8 and 14 — BASELINE.md round 10, VERDICT r14) the composite
  * was re-folded pretty-printed (": " / ", " separators) and the
  * compact-JSON regex silently returned None, so every subsequent run
  * read `admissible: null` and the perf-evidence chain went blind.
  * This spec round-trips the COMMITTED artifact through the exact
  * production parser, and additionally pins tolerance of both compact
  * and pretty separators on synthetic files, so neither a reformat of
  * the artifact nor a regression of the regex can ship green.
  */
class BenchReferenceSpec extends AnyFunSuite {

  private val committed = "bench/BENCH_r15_reference_composite.json"
  private val fallback  = "bench/BENCH_r14_reference_composite.json"

  test("loadReference parses the committed composite artifact (canary engaged)") {
    val path =
      if (Files.exists(Paths.get(committed))) committed
      else fallback
    assert(Files.exists(Paths.get(path)), s"no committed composite at $path")
    val ref = Bench.loadReference(path)
    assert(ref.isDefined,
      s"Bench.loadReference returned None on the committed composite $path — " +
      "the self-adjudication canary is DISENGAGED (this exact bug shipped in " +
      "rounds 8 and 14; see BASELINE.md round 10)")
    val (sf, qs) = ref.get
    assert(sf.startsWith("sf"), s"sf basename expected, got '$sf'")
    assert(qs.size >= 50, s"composite carries only ${qs.size} query rows")
    assert(qs.values.forall(v => v > 0.0 && v < 3600.0),
      "composite rows outside a plausible seconds range")
  }

  private def write(tmpName: String, body: String): String = {
    val p = Files.createTempFile(tmpName, ".json")
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    p.toFile.deleteOnExit()
    p.toString
  }

  test("loadReference tolerates compact separators") {
    val p = write("bench-compact",
      """{"metric":"total","value":1.5,"unit":"sec","queries":{"q1":0.5,"q2":1.0},"sf":"/data/sf0.1"}""")
    assert(Bench.loadReference(p) ===
      Some(("sf0.1", Map("q1" -> 0.5, "q2" -> 1.0))))
  }

  test("loadReference tolerates pretty-printed separators (the round-8/14 regression)") {
    val p = write("bench-pretty",
      """{"metric": "total", "value": 1.5, "unit": "sec", "queries": {"q1": 0.5, "q2": 1.0}, "sf": "/data/sf0.1"}""")
    assert(Bench.loadReference(p) ===
      Some(("sf0.1", Map("q1" -> 0.5, "q2" -> 1.0))))
  }

  test("loadReference returns None on a missing file (fresh-checkout safety)") {
    assert(Bench.loadReference("/nonexistent/path.json").isEmpty)
  }
}
