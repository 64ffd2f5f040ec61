package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's `weak` list (round-13 verdict #6, hardened round 15):
  * >2× the recorded per-query DuckDB baseline, fixed-floor rows (baseline
  * < 0.25 s) excluded. The baseline file is real JSON carrying its own `_sf`
  * scale-factor segment; when no baseline applies (missing/unparseable file,
  * `_sf` not an exact path segment of the bench's sf dir) weakList returns
  * None and the bench line prints "weak":null — distinguishable from a
  * genuinely quiet window's []. Pure function, no Spark. */
class BenchToolingSpec extends AnyFunSuite {

  private def withBaseline(json: String)(body: String => Unit): Unit = {
    val f = java.nio.file.Files.createTempFile("graft_weak", ".json")
    java.nio.file.Files.writeString(f, json)
    try body(f.toString) finally java.nio.file.Files.delete(f)
  }

  private val baseline =
    """{
      | "_comment": "recorded mins; a legacy \"trap_query\": 0.001 mention in prose must not be ingested",
      | "_sf": "sf0.1",
      | "big_query": 0.500,
      | "floor_query": 0.020,
      | "fine_query": 0.300
      |}""".stripMargin

  test("flags only >2x rows whose baseline is above the fixed-floor cutoff") {
    withBaseline(baseline) { path =>
      val results: Seq[(String, Option[Double])] = Seq(
        "big_query" -> Some(1.2),   // 2.4x of 0.5 → flagged
        "floor_query" -> Some(0.4), // 20x but baseline 0.02 < 0.25 → floor, not flagged
        "fine_query" -> Some(0.45), // 1.5x → fine
        "no_baseline" -> Some(9.9), // unknown query → ignored
        "big_query_failed" -> None) // failed queries carry no time
      assert(Bench.weakList(results, path, "/root/testdata/sf0.1") ==
        Some(Seq("big_query")))
    }
  }

  test("quiet window flags nothing (Some(empty), not None)") {
    withBaseline(baseline) { path =>
      val results: Seq[(String, Option[Double])] = Seq(
        "big_query" -> Some(0.9), "floor_query" -> Some(0.1),
        "fine_query" -> Some(0.5))
      assert(Bench.weakList(results, path, "/root/testdata/sf0.1") ==
        Some(Seq.empty))
    }
  }

  test("no applicable baseline reports None, never an empty 'quiet' list") {
    withBaseline(baseline) { path =>
      val hot: Seq[(String, Option[Double])] = Seq("big_query" -> Some(99.0))
      // recorded _sf=sf0.1 vs an sf0.01 run → not applicable
      assert(Bench.weakList(hot, path, "/root/testdata/sf0.01").isEmpty)
      // exact-segment match: sf0.12 must NOT satisfy an sf0.1 baseline
      // (the old contains() check accepted it)
      assert(Bench.weakList(hot, path, "/root/testdata/sf0.12").isEmpty)
      // missing file → None (this is the case the old code reported [])
      assert(Bench.weakList(hot, "/nonexistent/baseline.json",
        "/root/testdata/sf0.1").isEmpty)
    }
  }

  test("baseline values come from JSON structure, not string prose") {
    withBaseline(baseline) { path =>
      // trap_query appears only inside the _comment string; the old regex
      // parser ingested it as a 0.001 baseline and would flag this row
      val results: Seq[(String, Option[Double])] = Seq("trap_query" -> Some(0.9))
      assert(Bench.weakList(results, path, "/root/testdata/sf0.1") ==
        Some(Seq.empty))
    }
  }

  test("a baseline file without _sf never applies") {
    withBaseline("""{"big_query": 0.5}""") { path =>
      val hot: Seq[(String, Option[Double])] = Seq("big_query" -> Some(99.0))
      assert(Bench.weakList(hot, path, "/root/testdata/sf0.1").isEmpty)
    }
  }

  test("the shipped baseline file parses, applies at sf0.1, and covers the headline set") {
    val shipped = "tools/duckdb_per_query_sf0.1.json"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(shipped)))
    val quiet: Seq[(String, Option[Double])] = Bench.headline.map(_ -> Some(0.0))
    assert(Bench.weakList(quiet, shipped, "/root/testdata/sf0.1") ==
      Some(Seq.empty))
    // and it must NOT apply anywhere else
    assert(Bench.weakList(quiet, shipped, "/root/testdata/sf0.01").isEmpty)
  }
}
