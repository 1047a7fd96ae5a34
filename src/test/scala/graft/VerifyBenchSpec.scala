package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** The failure channel of the round artifacts: a query that throws
  * must surface as an explicit error artifact (Verify) / a "failed"
  * entry (Bench), never as a missing row or a timed throw — the r10
  * q_sessionize regression shipped invisibly through exactly this
  * hole. */
class VerifyBenchSpec extends SparkSpec {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("id")
  private val boom: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).toDF("id").select(org.apache.spark.sql.functions.expr("no_such_fn(id)"))

  test("Verify.dump writes parquet for good queries and an _error.txt marker for failed ones") {
    val out = tmpDir("graft_verify_fail")
    val failures = Verify.dump(spark, "/nonexistent", out,
      Map("q_ok" -> good, "q_broken" -> boom))
    assert(failures.keySet === Set("q_broken"))
    // good query produced readable parquet
    assert(spark.read.parquet(s"$out/q_ok").count() === 3)
    // failed query left a LOUD artifact: a dir that exists but carries
    // only the error marker, so a downstream parquet read errs rather
    // than silently skipping the query
    val qDir = Paths.get(out, "q_broken")
    assert(Files.exists(qDir.resolve("_error.txt")))
    val marker = Files.readString(qDir.resolve("_error.txt"))
    assert(marker.toLowerCase.contains("no_such_fn"))
    import scala.jdk.CollectionConverters._
    assert(!Files.list(qDir).iterator().asScala.exists(_.toString.endsWith(".parquet")),
      "a failed query must not leave partial parquet output")
    intercept[Exception](spark.read.parquet(s"$out/q_broken").collect())
  }

  test("Verify.dump wipes stale parquet when a previously-green query starts failing") {
    val out = tmpDir("graft_verify_stale")
    Verify.dump(spark, "/nonexistent", out, Map("q_flip" -> good))
    assert(spark.read.parquet(s"$out/q_flip").count() === 3)
    val failures = Verify.dump(spark, "/nonexistent", out, Map("q_flip" -> boom))
    assert(failures.contains("q_flip"))
    // yesterday's good answer must not survive as today's fake pass
    intercept[Exception](spark.read.parquet(s"$out/q_flip").collect())
    assert(Files.exists(Paths.get(out, "q_flip", "_error.txt")))
  }

  test("Verify.toJson escapes quotes, backslashes and control chars") {
    val js = Verify.toJson(Map("q" -> "a \"b\"\\\n\tc\u0001"))
    assert(js === "{\"q\": \"a \\\"b\\\"\\\\\\n\\tc\\u0001\"}")
  }

  test("every sf1-tracked name resolves to a registered query") {
    val missing = Bench.Sf1Names.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty,
      s"sf1 tracking would silently lose renamed queries: $missing")
    assert(Bench.Sf1Names.distinct == Bench.Sf1Names, "no duplicate sf1 entries")
  }

  test("Bench.timeQuery returns Right for a working query and Left for a throwing one") {
    val ok = Bench.timeQuery(spark, "q_ok", good, "/nonexistent", 2)
    assert(ok.isRight && ok.toOption.get > 0.0)
    val bad = Bench.timeQuery(spark, "q_broken", boom, "/nonexistent", 2)
    assert(bad.isLeft, "a throwing query must never produce a timed entry")
    assert(Bench.jsonVal(bad) === "\"failed\"")
    assert(Bench.jsonVal(ok) === ok.toOption.get.toString)
  }

  test("resetSessionState clears cached plans AND checkpoint blocks, so gates are hermetic") {
    import spark.implicits._
    // the r14 lesson: checkpoint blocks accumulated across 122 gates
    // and the regression tripwire fired on untouched queries (12.3 s
    // in-sweep vs 0.89 s isolated). The reset must drop BOTH caches —
    // the cache manager and getPersistentRDDs (where localCheckpoint
    // blocks live).
    val cached = (1L to 100L).toDF("x").cache()
    cached.count()
    val cp = (1L to 100L).toDF("y").localCheckpoint(true)
    cp.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Bench.resetSessionState(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "persisted RDDs (incl. localCheckpoint blocks) must be gone")
    // a timed run after the reset still works (recompute from lineage
    // for plain caches; checkpointed frames are per-run rebuilds)
    assert(cached.count() == 100)
  }

  test("regression self-attribution: isolated medians back within 1.5x of prior are labeled noise") {
    // sweep said 12x, isolated says 1.1x -> host contention, noise
    assert(Bench.regressionVerdict(prior = 1.0, isolated = 1.1) === ((1.1, "noise")))
    // isolated confirms the slowdown -> real
    val (r1, v1) = Bench.regressionVerdict(prior = 1.0, isolated = 4.0)
    assert(r1 === 4.0 && v1 === "real")
    // a flagged "speedup" that is really a broken/lost code path stays
    // fast in isolation -> real (deserves a look, not a celebration)
    val (r2, v2) = Bench.regressionVerdict(prior = 3.0, isolated = 0.4)
    assert(math.abs(r2 - 0.4 / 3.0) < 1e-9 && v2 === "real")
    // boundary: exactly 1.5x is NOT noise
    assert(Bench.regressionVerdict(1.0, 1.5)._2 === "real")
  }

  test("parsePriorSection extracts the right section of a prior bench line") {
    val line = """{"metric":"total","queries":{"q_a":1.5,"q_b":0.25},""" +
      """"queries_sf1":{"q_a":12.5,"q_c":3.0},"value":1.75}"""
    assert(Bench.parsePriorSection(line, "queries") === Map("q_a" -> 1.5, "q_b" -> 0.25))
    assert(Bench.parsePriorSection(line, "queries_sf1") === Map("q_a" -> 12.5, "q_c" -> 3.0))
    assert(Bench.parsePriorSection(line, "queries_sf10") === Map.empty)
    assert(Bench.parsePriorSection("not json at all", "queries") === Map.empty)
  }
}
