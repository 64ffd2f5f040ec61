package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's `weak` list (round-13 verdict #6): >2× the recorded
  * per-query DuckDB baseline, fixed-floor rows (baseline < 0.25 s) excluded,
  * sf0.1-only. Pure function over the results + baseline file — no Spark. */
class BenchToolingSpec extends AnyFunSuite {

  private def withBaseline(json: String)(body: String => Unit): Unit = {
    val f = java.nio.file.Files.createTempFile("graft_weak", ".json")
    java.nio.file.Files.writeString(f, json)
    try body(f.toString) finally java.nio.file.Files.delete(f)
  }

  private val baseline =
    """{
      | "_comment": "recorded mins; fast 0.02 is a floor row",
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
        Seq("big_query"))
    }
  }

  test("quiet window flags nothing") {
    withBaseline(baseline) { path =>
      val results: Seq[(String, Option[Double])] = Seq(
        "big_query" -> Some(0.9), "floor_query" -> Some(0.1),
        "fine_query" -> Some(0.5))
      assert(Bench.weakList(results, path, "/root/testdata/sf0.1").isEmpty)
    }
  }

  test("other scale factors and a missing baseline file report empty, not noise") {
    withBaseline(baseline) { path =>
      val hot: Seq[(String, Option[Double])] = Seq("big_query" -> Some(99.0))
      assert(Bench.weakList(hot, path, "/root/testdata/sf0.01").isEmpty)
      assert(Bench.weakList(hot, "/nonexistent/baseline.json",
        "/root/testdata/sf0.1").isEmpty)
    }
  }
}
