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
    // isolated confirms the slowdown, FIRST sighting -> suspect (the
    // r16 lesson: end-of-sweep isolated re-runs inherit residual
    // JVM/host state and stamped "real" on an untouched query — one
    // confirmation is no longer enough)
    val (r1, v1) = Bench.regressionVerdict(prior = 1.0, isolated = 4.0)
    assert(r1 === 4.0 && v1 === "suspect")
    // the SECOND consecutive round of isolated confirmation -> real
    assert(Bench.regressionVerdict(1.0, 4.0, priorPending = true)._2 === "real")
    // a flagged "speedup" that is really a broken/lost code path stays
    // fast in isolation -> suspect/real (deserves a look, not a
    // celebration)
    val (r2, v2) = Bench.regressionVerdict(prior = 3.0, isolated = 0.4)
    assert(math.abs(r2 - 0.4 / 3.0) < 1e-9 && v2 === "suspect")
    // boundary: exactly 1.5x is NOT noise
    assert(Bench.regressionVerdict(1.0, 1.5)._2 === "suspect")
  }

  test("regression verdict: the query's own historical band overrides a >1.5x prior ratio") {
    // the q_freq_items r16 false positive: prior 2.09, isolated 3.65
    // (ratio 1.75 -> would read "real"), but the query has measured
    // at 3.0 on unchanged code in an earlier round -> noise_band
    val band = Some((1.8, 3.0))
    assert(Bench.regressionVerdict(2.09, 3.65, band)._2 === "noise_band")
    // clearly past the band x1.5 tolerance -> suspect on first sight
    assert(Bench.regressionVerdict(2.09, 5.0, band)._2 === "suspect")
    // ... and real only when it was already pending from last round
    assert(Bench.regressionVerdict(2.09, 5.0, band, priorPending = true)._2 === "real")
    // band also covers the fast side (a "speedup" the query has
    // legitimately hit before)
    assert(Bench.regressionVerdict(6.0, 1.5, Some((1.4, 6.2)))._2 === "noise_band")
    // priorPending never overrides a noise/band verdict — a pending
    // suspect that measures back inside its band this round is CLEARED
    assert(Bench.regressionVerdict(2.09, 2.2, band, priorPending = true)._2 === "noise")
    assert(Bench.regressionVerdict(2.09, 3.6, band, priorPending = true)._2 === "noise_band")
  }

  test("mergedBands: rolling window over this round + the last 3 rounds' medians; old eras age out") {
    // r19 judge item 2: accumulated bands never re-seed — sf1 q_ann_pq
    // sat at ~1.1 s with band [1.09, 9.38] from its pre-optimization
    // era, so an 8x regression back to the old cost would verdict
    // noise_band forever. The band is now min/max of the RECENT window
    // (now + last 3 rounds' medians); the accumulated prior band is
    // only consulted for excluded/failed queries.
    val results: Seq[(String, Either[String, Double])] = Seq(
      "q_new" -> Right(2.0),            // no history at all -> degenerate band
      "q_roll" -> Right(5.0),           // window spans recent medians + now
      "q_aged" -> Right(1.1),           // stale [0.1, 9.0] band must NOT survive
      "q_broken" -> Left("boom"))       // failed -> prior band kept verbatim
    val bands = Bench.mergedBands(results,
      priorLo = Map("q_aged" -> 0.1, "q_broken" -> 1.0),
      priorHi = Map("q_aged" -> 9.0, "q_broken" -> 1.4),
      recent = Seq(
        Map("q_roll" -> 4.0, "q_aged" -> 1.0) -> Set.empty[String],
        Map("q_roll" -> 3.0, "q_aged" -> 1.2) -> Set.empty[String],
        Map("q_roll" -> 2.0, "q_aged" -> 1.0) -> Set.empty[String])).map(b => b._1 -> ((b._2, b._3))).toMap
    assert(bands("q_new") === ((2.0, 2.0)))
    assert(bands("q_roll") === ((2.0, 5.0)))
    // the PQ case: recent medians 1.0-1.2, stale hi 9.0 forgotten
    assert(bands("q_aged") === ((1.0, 1.2)), s"pre-change era must age out: $bands")
    assert(bands("q_broken") === ((1.0, 1.4)), "failure keeps the prior band verbatim")
    val (loJson, hiJson) = Bench.bandJson(Seq(("q_a", 1.25, 2.5)))
    assert(loJson === """{"q_a":1.250}""" && hiJson === """{"q_a":2.500}""")
  }

  test("a confirmed real verdict re-seeds the band to the confirmed level immediately") {
    // judge item 2 (r19): after a confirmed improvement (this round's
    // q_sketch_distinct 0.45 -> 0.24), the band must collapse to the
    // new level — the 3-round age-out alone leaves a window where a
    // regression back to the old cost reads noise_band
    val results: Seq[(String, Either[String, Double])] = Seq("q_imp" -> Right(0.24))
    val bands = Bench.mergedBands(results,
      priorLo = Map("q_imp" -> 0.4), priorHi = Map("q_imp" -> 2.9),
      recent = Seq(Map("q_imp" -> 0.45) -> Set.empty[String],
        Map("q_imp" -> 0.5) -> Set.empty[String]),
      exclude = Set("q_imp"),                 // real names are always flagged
      reseed = Map("q_imp" -> 0.24)).map(b => b._1 -> ((b._2, b._3))).toMap
    assert(bands("q_imp") === ((0.24, 0.24)),
      s"retired change must leave none of the old era behind: $bands")
  }

  test("a flagged round's median is excluded from the band/hist windows when it ages in (r20b)") {
    // review finding r20b: round N's 12x contention outlier is
    // band-excluded LIVE, but it still lands in the queries section —
    // one round later it would ride h2 into the rolling band max and
    // rubber-stamp a later real regression noise_band. Each round's
    // flagged-name list is carried alongside its medians, and both
    // windows skip (name, flagged-round) values.
    val results: Seq[(String, Either[String, Double])] = Seq("q" -> Right(1.0))
    val recent = Seq(
      Map("q" -> 12.0) -> Set("q"),   // the contention round: flagged
      Map("q" -> 1.1) -> Set.empty[String],
      Map("q" -> 0.9) -> Set.empty[String])
    val bands = Bench.mergedBands(results, Map.empty, Map.empty, recent)
      .map(b => b._1 -> ((b._2, b._3))).toMap
    assert(bands("q") === ((0.9, 1.1)),
      s"the flagged 12.0 must never enter the band: $bands")
    // histMin skips flagged values too (an unexplained fast outlier
    // would deflate the floor and spray spurious hist flags)
    val hist = Bench.histMinOf(Seq(
      Map("q" -> 0.01) -> Set("q"),
      Map("q" -> 1.1) -> Set.empty[String]))
    assert(hist("q") === 1.1, s"flagged speedup outlier must not set the floor: $hist")
    // a query flagged in every carried round has no floor at all
    assert(!Bench.histMinOf(Seq(Map("q" -> 0.01) -> Set("q"))).contains("q"))
    // the name-list round-trip the carry rides on
    assert(Bench.namesJson(Set("b", "a")) === """["a","b"]""")
    assert(Bench.parsePriorNames("""{"flagged":["a","b"],"x":1}""", "flagged") === Set("a", "b"))
    assert(Bench.parsePriorNames("""{"flagged":[]}""", "flagged") === Set.empty[String])
    assert(Bench.parsePriorNames("not json", "flagged") === Set.empty[String])
  }

  test("history carry emit-then-reparse: flagged sets stay slot-aligned with their medians across rounds") {
    // r20c review: the whole window skip rests on flagged_h2 pairing
    // with queries_h2 (the set that flagged WHEN those medians were
    // current) — a one-slot mis-shift in the string assembly would
    // re-admit the outliers the mechanism exists to exclude, while
    // every helper-level test still passed. So the pairing is pinned
    // END TO END: emit round N's carry, reparse it as round N+1's
    // prior file, and verify the outlier round's median stays out of
    // the band at every age.
    // Round N state: q measured 12.0 THIS round and was flagged;
    // its older history is clean (1.1 two rounds back, 0.9 three).
    val emitted = s"""{"queries":{"q":12.000}""" +
      Bench.historyCarryJson("",
        prior = Map("q" -> 1.1),     // round N-1's median (clean)
        h2 = Map("q" -> 0.9),        // round N-2's median (clean)
        fl1 = Set.empty,             // round N-1 flagged nothing
        fl2 = Set.empty,             // round N-2 flagged nothing
        flagged = Set("q"),          // round N flags the 12.0
        confirmed = Map.empty) + "}"
    // Round N+1 reads that file: live queries=12.0 must carry the
    // flag in slot 0; the clean 1.1/0.9 stay usable in slots 1/2
    val recent = Bench.parseRecent(emitted, "", "queries")
    assert(recent(0) === ((Map("q" -> 12.0), Set("q"))), recent.toString)
    assert(recent(1) === ((Map("q" -> 1.1), Set.empty[String])), recent.toString)
    assert(recent(2) === ((Map("q" -> 0.9), Set.empty[String])), recent.toString)
    // the band over that window: now=1.0 + clean history, 12.0 OUT
    val bands = Bench.mergedBands(Seq("q" -> Right(1.0)), Map.empty, Map.empty, recent)
      .map(b => b._1 -> ((b._2, b._3))).toMap
    assert(bands("q") === ((0.9, 1.1)), s"aged-in outlier must stay excluded: $bands")
    // one round later: round N+1 emits with the 12.0 now in the h2
    // slot — its flag must shift WITH it
    val emitted2 = s"""{"queries":{"q":1.000}""" +
      Bench.historyCarryJson("",
        prior = Map("q" -> 12.0), h2 = Map("q" -> 1.1),
        fl1 = Set("q"),              // round N's flag, now one back
        fl2 = Set.empty,
        flagged = Set.empty, confirmed = Map.empty) + "}"
    val recent2 = Bench.parseRecent(emitted2, "", "queries")
    assert(recent2(1) === ((Map("q" -> 12.0), Set("q"))),
      s"the flag must ride its median into the h2 slot: $recent2")
    assert(Bench.histMinOf(recent2) === Map("q" -> 1.0),
      s"hist floor skips the flagged 12.0 but keeps live 1.0: ${Bench.histMinOf(recent2)}")
    // the sf1 spelling round-trips through the same helper
    val sf1 = s"""{"queries_sf1":{"q":2.000}""" +
      Bench.historyCarryJson("_sf1", Map("q" -> 1.9), Map("q" -> 2.1),
        Set.empty, Set("q"), Set.empty, Map.empty) + "}"
    val recentSf1 = Bench.parseRecent(sf1, "_sf1", "queries_sf1")
    assert(recentSf1(2) === ((Map("q" -> 2.1), Set("q"))), recentSf1.toString)
  }

  test("flagged queries keep their PRIOR band — a suspect's regressed median must not absorb into band_hi") {
    // the absorption hole: round N stamps 'suspect' on a 4x regression;
    // if its sweep median entered band_hi, round N+1's pending recheck
    // would read 'noise_band' and the two-round confirmation could
    // structurally never fire. Excluded names keep the prior band
    // verbatim (so next round's recheck still compares against honest
    // history); a flagged query with NO prior band gets none.
    val results: Seq[(String, Either[String, Double])] = Seq(
      "q_reg" -> Right(4.0),   // flagged this round, prior band [0.9, 1.1]
      "q_fresh" -> Right(7.0)) // flagged, no band history
    val bands = Bench.mergedBands(results,
      priorLo = Map("q_reg" -> 0.9), priorHi = Map("q_reg" -> 1.1),
      recent = Seq(Map("q_reg" -> 1.0, "q_fresh" -> 2.0) -> Set.empty[String]),
      exclude = Set("q_reg", "q_fresh")).map(b => b._1 -> ((b._2, b._3))).toMap
    assert(bands("q_reg") === ((0.9, 1.1)), s"prior band must survive untouched: $bands")
    // q_fresh seeds from the prior MEDIAN (honest history), not 7.0
    assert(bands("q_fresh") === ((2.0, 2.0)), s"flagged median must not seed a band: $bands")
    // a TRANSIENT failure must not destroy band history: the window's
    // [1.0, 1.4] survives one OOM'd run verbatim
    val failBands = Bench.mergedBands(
      Seq[(String, Either[String, Double])]("q_flaky" -> Left("oom"), "q_gone" -> Left("oom")),
      priorLo = Map("q_flaky" -> 1.0), priorHi = Map("q_flaky" -> 1.4),
      recent = Seq.empty).map(b => b._1 -> ((b._2, b._3))).toMap
    assert(failBands("q_flaky") === ((1.0, 1.4)), s"failure must keep the prior band: $failBands")
    // ... while a failed query with NO history (or a lopsided prior
    // file) yields nothing rather than a half-band or a crash
    assert(!failBands.contains("q_gone"))
  }

  test("pending recheck: a suspect from last round is re-measured against its CARRIED original prior") {
    // the refreshed prior median would absorb a real regression after
    // one round (ratio ~1 vs the regressed value), so pending entries
    // carry the original prior forward and are re-checked even when
    // the sweep does not re-flag them
    // the name must resolve in SparkEntry.queries (unregistered names
    // are skipped — the recheck would have nothing to run); q1_agg
    // "regressed" last round (original prior 1.0, now ~3.0) and this
    // round's refreshed prior median is already 3.0: ratio 1.0, unflagged
    val results: Seq[(String, Either[String, Double])] = Seq("q1_agg" -> Right(3.0))
    val (json, newPending, _, flagged, _) = Bench.attributedRegressionsJson(
      spark, "/nonexistent", results,
      prior = Map("q1_agg" -> 3.0), floor = 0.1, attribute = false, isolatedRuns = 1,
      pendingPrior = Map("q1_agg" -> 1.0))
    assert(json.contains(""""query":"q1_agg""""), s"pending entry missing: $json")
    assert(json.contains(""""source":"pending_recheck""""), json)
    assert(json.contains(""""prior":1.000"""), s"original prior must be carried: $json")
    // attribute=false (pure-sweep mode) must pass pending through
    // unchanged — only an isolated measurement may clear a suspect
    assert(newPending === Map("q1_agg" -> 1.0))
    // pending-rechecked names are band-excluded like sweep-flagged ones
    assert(flagged === Set("q1_agg"))
  }

  test("attribution clears a pending suspect whose isolated run lands inside prior/band") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // sweep claims 50x on q1_agg; the isolated re-run (a real ~1 s
    // query) lands back near prior / inside the wide band -> cleared
    val results: Seq[(String, Either[String, Double])] = Seq("q1_agg" -> Right(50.0))
    val (json, pend, _, _, _) = Bench.attributedRegressionsJson(spark, dir, results,
      prior = Map("q1_agg" -> 1.0), floor = 0.1, attribute = true, isolatedRuns = 1,
      band = Map("q1_agg" -> ((0.000001, 1000.0))), pendingPrior = Map("q1_agg" -> 1.0))
    assert(json.contains(""""verdict":"noise"""), s"expected a noise verdict: $json")
    assert(pend.isEmpty, s"a cleared suspect must leave pending: $pend")
  }

  test("sweep flag threshold matches regressionVerdict's 1.5x noise bound (no 1.5-3x blind spot)") {
    // r17 post-mortem: the flag trigger was 3x while the verdict
    // semantics were 1.5x, so a 2-3x drift was never isolated AND its
    // median merged into the band — four dedup-family regressions
    // flowed through in one round. The trigger must flag at >1.5x in
    // BOTH directions and band-exclude everything it flags.
    val results: Seq[(String, Either[String, Double])] = Seq(
      "q_drift" -> Right(2.2),   // 2.2x slower — inside the old blind spot
      "q_fast" -> Right(0.5),    // 2x faster — also flagged (lost work?)
      "q_steady" -> Right(1.4),  // 1.4x — legitimate noise, unflagged
      "q_tiny" -> Right(0.4))    // 2x move but sub-floor both sides — never flagged
    val (json, _, _, flagged, _) = Bench.attributedRegressionsJson(
      spark, "/nonexistent", results,
      prior = Map("q_drift" -> 1.0, "q_fast" -> 1.0, "q_steady" -> 1.0, "q_tiny" -> 0.2),
      floor = 0.5, attribute = false, isolatedRuns = 1)
    assert(flagged === Set("q_drift", "q_fast"),
      s"1.5-3x moves must be flagged and band-excluded: $flagged / $json")
    assert(json.contains(""""query":"q_drift"""") && json.contains(""""query":"q_fast""""), json)
    assert(!json.contains("q_steady") && !json.contains("q_tiny"), json)
  }

  test("hist_window: compounding sub-1.5x drifts flag vs min of the last 3 rounds' medians") {
    // r18 post-mortem (judge item 3): two consecutive 1.4x drifts
    // multiply to 1.96x without either round flagging, because each
    // round compares only to the refreshed prior — and each unflagged
    // median extends band_hi, so even a later flag would verdict
    // noise_band. The window compares against min(last 3 priors) and
    // its verdict must ignore the (self-extended) band.
    val results: Seq[(String, Either[String, Double])] = Seq(
      "q_creep" -> Right(1.96),  // 1.4x vs prior (unflagged), 1.96x vs hist floor
      "q_flat" -> Right(1.05),   // inside both windows
      "q_jump" -> Right(3.0))    // plain sweep flag: must NOT double-report as hist
    val prior = Map("q_creep" -> 1.4, "q_flat" -> 1.0, "q_jump" -> 1.0)
    val hist = Bench.histMinOf(Seq(
      prior -> Set.empty[String],
      Map("q_creep" -> 1.0, "q_flat" -> 1.0) -> Set.empty[String],
      Map("q_creep" -> 1.2) -> Set.empty[String]))
    assert(hist("q_creep") == 1.0 && hist("q_flat") == 1.0 && hist("q_jump") == 1.0)
    val (json, _, _, flagged, _) = Bench.attributedRegressionsJson(
      spark, "/nonexistent", results, prior, floor = 0.5,
      attribute = false, isolatedRuns = 1, histMin = hist)
    assert(flagged === Set("q_creep", "q_jump"),
      s"compound drift must flag and band-exclude: $flagged / $json")
    assert(json.contains(""""query":"q_creep","prior":1.000""") &&
      json.contains(""""source":"hist_window""""), json)
    assert(!json.contains("q_flat"), json)
    // the sweep-flagged query keeps its sweep entry only
    assert(json.split("q_jump").length == 2, s"q_jump must appear exactly once: $json")
  }

  test("hist_window verdict ignores the self-extended band; history carry shifts by one round") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // q1_agg "crept" to 50x of its hist floor while the band absorbed
    // the drift: a band covering the regressed value must NOT rescue it
    // — expect suspect (first sighting), never noise_band
    val results: Seq[(String, Either[String, Double])] = Seq("q1_agg" -> Right(50.0))
    val (json, pend, pendHist, _, _) = Bench.attributedRegressionsJson(spark, dir, results,
      prior = Map("q1_agg" -> 40.0), floor = 0.1, attribute = true, isolatedRuns = 1,
      band = Map("q1_agg" -> ((0.000001, 1000.0))),
      histMin = Map("q1_agg" -> 0.001))
    assert(json.contains(""""source":"hist_window""""), json)
    assert(!json.contains("noise_band"), s"band must be ignored for hist flags: $json")
    // isolated ~1 s vs hist floor 0.001 stays >1.5x -> suspect; the
    // HIST pending set carries the floor so next round's band-exempt
    // recheck can confirm (sweep pending stays empty)
    assert(json.contains(""""verdict":"suspect""""), json)
    assert(pend.isEmpty && pendHist === Map("q1_agg" -> 0.001), s"$pend / $pendHist")
    // the carry: this round's medians become next round's h2, prior h2 -> h3
    assert(Bench.mapJson(Map("q_b" -> 1.0, "q_a" -> 2.5)) == """{"q_a":2.500,"q_b":1.000}""")
  }

  test("hist-origin pending rechecks stay band-exempt, so a compound drift CAN confirm real") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // review finding r19: a hist suspect's recheck used to run as a
    // band-consulting pending_recheck — band_hi had self-extended
    // through the unflagged creep, so the confirmation round stamped
    // noise_band and cleared the pending; the drift could NEVER
    // confirm. Hist pendings now carry separately and their recheck
    // ignores the band: same crept band, real isolated ~1 s vs the
    // 0.001 hist floor -> "real".
    val results: Seq[(String, Either[String, Double])] = Seq("q1_agg" -> Right(1.0))
    val (json, pend, pendHist, flagged, confirmed) = Bench.attributedRegressionsJson(
      spark, dir, results,
      prior = Map("q1_agg" -> 1.0), floor = 0.1, attribute = true, isolatedRuns = 1,
      band = Map("q1_agg" -> ((0.000001, 1000.0))), // absorbed the creep
      pendingHistPrior = Map("q1_agg" -> 0.001))
    assert(json.contains(""""source":"pending_recheck_hist""""), json)
    assert(json.contains(""""verdict":"real""""),
      s"band-exempt confirm must fire despite the self-extended band: $json")
    assert(pend.isEmpty && pendHist.isEmpty, "confirmed real is reported and retired")
    assert(flagged === Set("q1_agg"), "rechecked names stay band-excluded")
    // r20 (judge item 2 + ADVICE): retirement surfaces the confirmed
    // isolated level, which the caller uses to re-seed the band AND
    // lift the queries_h2/h3 carry — histMin must not re-flag the
    // accepted change with the pre-change median for 2 more rounds
    assert(confirmed.keySet === Set("q1_agg"),
      s"a real verdict must surface its confirmed level: $confirmed")
    assert(confirmed("q1_agg") > 0.0 && confirmed("q1_agg") < 60.0)
    // and a hist suspect lands in the HIST pending set, not the sweep one
    val (_, pend2, pendHist2, _, _) = Bench.attributedRegressionsJson(
      spark, dir, results,
      prior = Map("q1_agg" -> 0.9), floor = 0.1, attribute = true, isolatedRuns = 1,
      histMin = Map("q1_agg" -> 0.001))
    assert(pend2.isEmpty && pendHist2 === Map("q1_agg" -> 0.001), s"$pend2 / $pendHist2")
    // attribute=false passes BOTH pending sets through unchanged
    val (_, p3, ph3, _, _) = Bench.attributedRegressionsJson(
      spark, "/nonexistent", results,
      prior = Map("q1_agg" -> 1.0), floor = 0.1, attribute = false, isolatedRuns = 1,
      pendingPrior = Map("q_a" -> 1.0), pendingHistPrior = Map("q_b" -> 2.0))
    assert(p3 === Map("q_a" -> 1.0) && ph3 === Map("q_b" -> 2.0))
  }

  test("a pending name that also trips the sweep rechecks as pending, keeping origin and floor") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    // review finding r19b: the sweep entry used to swallow the recheck
    // — verdicted against the refreshed (crept) prior WITH the band,
    // so a contention spike in the confirmation round retired the
    // suspect on noise_band and lost the carried floor forever
    val results: Seq[(String, Either[String, Double])] = Seq("q1_agg" -> Right(3.0))
    val (json, pend, pendHist, _, _) = Bench.attributedRegressionsJson(
      spark, dir, results,
      prior = Map("q1_agg" -> 1.0), floor = 0.1, attribute = true, isolatedRuns = 1,
      band = Map("q1_agg" -> ((0.000001, 1000.0))),
      pendingHistPrior = Map("q1_agg" -> 0.001))
    assert(json.split("\"query\":\"q1_agg\"").length == 2,
      s"exactly one entry for a pending+sweep name: $json")
    assert(json.contains(""""source":"pending_recheck_hist"""") &&
      json.contains(""""prior":0.001"""), json)
    assert(json.contains(""""verdict":"real""""), s"band-exempt confirm: $json")
    assert(pend.isEmpty && pendHist.isEmpty)
  }

  test("a pending whose query never measured this round carries forward unresolved") {
    // review finding r19b: a failed/deselected query's pending used to
    // fall into max(origPrior, origPrior) >= floor with the getOrElse
    // fallback — a sub-floor HIST floor silently deleted the suspect
    // without the second isolated measurement the contract requires
    val results: Seq[(String, Either[String, Double])] = Seq("q1_agg" -> Left("boom"))
    val (json, pend, pendHist, _, _) = Bench.attributedRegressionsJson(
      spark, "/nonexistent", results,
      prior = Map("q1_agg" -> 1.0), floor = 0.1, attribute = true, isolatedRuns = 1,
      pendingPrior = Map("q1_agg" -> 0.05),
      pendingHistPrior = Map("q_gone_forever" -> 0.02))
    assert(pend === Map("q1_agg" -> 0.05), s"unmeasured pending must survive: $pend")
    // unregistered names DO drop - nothing could ever recheck them
    assert(pendHist.isEmpty, pendHist.toString)
    assert(!json.contains("q1_agg"), s"no recheck entry without a measurement: $json")
  }

  test("stdout compact line: live medians only, failed entries kept, value LAST, no history sections") {
    // r21 (verdict item 2): stdout carries a short parseable line — the
    // full history line lives in bench.json only. The capture channel
    // keeps a ~2 KB stdout tail, so the compact line must never grow
    // the history carry / band / regression sections back.
    val results: Seq[(String, Either[String, Double])] = Seq(
      "q_a" -> Right(1.23456), "q_b" -> Left("boom"))
    val cg = ""","codegen_failures":{"total":0,"queries":{}}"""
    val line = Bench.compactLine(results, runs = 3, nFailed = 1,
      sfDir = "/d", cgJson = cg, totalJson = "null")
    assert(line.startsWith("""{"metric":"total""""), line)
    assert(line.endsWith(""""value":null}"""), s"value must ride the tail: $line")
    assert(line.contains(""""q_a":1.235"""), line)
    assert(line.contains(""""q_b":"failed""""), line)
    assert(!line.contains("queries_h2") && !line.contains("band_lo") &&
      !line.contains("regressions") && !line.contains("pending_real"),
      s"history sections must stay out of stdout: $line")
    // the line is parseable by the same section parser the prior file uses
    assert(Bench.parsePriorSection(line, "queries") === Map("q_a" -> 1.235))
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
