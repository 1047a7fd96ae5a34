package graft

import graft.expr.DateExpr
import graft.offset.OffsetValue
import graft.pipeline.Schedule
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

/** Property-based checks over the pure-logic components: invariants
  * that hold for ALL (sampled) inputs, not just hand-picked cases.
  * Uses raw ScalaCheck generators with a deterministic seed (the
  * scalatestplus bridge isn't in the offline artifact cache). */
class PropertySpec extends AnyFunSuite {

  private val Cases = 200

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to Cases).foreach { _ =>
      f(ga.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val genDate: Gen[LocalDate] =
    Gen.choose(0L, 40000L).map(LocalDate.ofEpochDay)

  private val genRecord: Gen[graft.kafka.KafkaWire.OutRecord] = for {
    key <- Gen.option(Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))))
    value <- Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    ts <- Gen.choose(0L, 1L << 42)
  } yield graft.kafka.KafkaWire.OutRecord(key.map(_.toArray).orNull, value.toArray, ts)

  test("Kafka wire: encode/decode round-trips any record list under every codec and both formats") {
    import graft.kafka.KafkaWire._
    forAll(Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, genRecord)),
           Gen.choose(0, 4), Gen.choose(0L, 1L << 40)) { (recs, codec, baseOff) =>
      def check(decoded: Seq[KafkaRecord], offsetBase: Long): Unit = {
        assert(decoded.size == recs.size)
        decoded.zip(recs).zipWithIndex.foreach { case ((got, want), i) =>
          assert(got.offset == offsetBase + i)
          assert(got.timestamp == want.timestamp)
          assert(java.util.Arrays.equals(got.value, want.value))
          assert((got.key == null) == (want.key == null))
          if (want.key != null) assert(java.util.Arrays.equals(got.key, want.key))
        }
      }
      check(decodeRecordSet(encodeRecordBatch(recs, baseOff, codec)), baseOff)
      if (codec <= 3) // producer sets write relative offsets from 0
        check(decodeMessageSet(encodeMessageSet(recs, codec)), 0L)
    }
  }

  test("Kafka wire: decoding corrupted or truncated bytes terminates - clean result or a thrown error") {
    import graft.kafka.KafkaWire._
    val base = encodeRecordBatch(Seq(
      OutRecord("k".getBytes, "value-payload".getBytes, 5L),
      OutRecord(null, "second".getBytes, 6L)), 3L, codec = 1) ++
      encodeMessageSet(Seq(OutRecord("a".getBytes, "b".getBytes, 1L)))
    forAll(Gen.choose(0, base.length - 1), Gen.choose(Byte.MinValue, Byte.MaxValue),
           Gen.choose(0, base.length)) { (flipAt, newByte, cutAt) =>
      // single-byte mutation
      val mutated = base.clone(); mutated(flipAt) = newByte
      try { decodeRecordSet(mutated); () } catch { case _: Exception => }
      // truncation: either decodes a prefix or fails loudly, never hangs
      try { decodeRecordSet(base.take(cutAt)); () } catch { case _: Exception => }
    }
  }

  test("DateExpr: plus/minus days round-trip for any date and offset") {
    forAll(genDate, Gen.choose(-5000, 5000)) { (d, n) =>
      val ev = DateExpr("d" -> d)
      assert(ev.evalDate(s"@d + $n - $n") == d)
      assert(ev.evalDate(s"plusDays(minusDays(@d, $n), $n)") == d)
    }
  }

  test("DateExpr: date difference is the inverse of addition") {
    forAll(genDate, Gen.choose(-5000, 5000)) { (d, n) =>
      val other = d.plusDays(n.toLong)
      assert(DateExpr("a" -> other, "b" -> d).evalInt("@a - @b") == n)
    }
  }

  test("DateExpr: beginOfMonth <= any date <= endOfMonth, same month") {
    forAll(genDate) { d =>
      val ev = DateExpr("d" -> d)
      val bom = ev.evalDate("beginOfMonth(@d)")
      val eom = ev.evalDate("endOfMonth(@d)")
      assert(!bom.isAfter(d) && !d.isAfter(eom))
      assert(bom.getDayOfMonth == 1 && bom.getMonth == d.getMonth)
      assert(eom.getMonth == d.getMonth && eom.plusDays(1).getDayOfMonth == 1)
    }
  }

  test("DateExpr: lastDayOfWeek is previous-or-same and within 6 days") {
    val fns = Seq("lastMonday", "lastTuesday", "lastWednesday", "lastThursday",
      "lastFriday", "lastSaturday", "lastSunday")
    forAll(genDate, Gen.oneOf(fns)) { (d, fn) =>
      val r = DateExpr("d" -> d).evalDate(s"$fn(@d)")
      val gap = java.time.temporal.ChronoUnit.DAYS.between(r, d)
      assert(gap >= 0 && gap <= 6)
    }
  }

  test("Schedule.Monthly fires exactly once per month for any single day spec") {
    forAll(Gen.choose(1, 31), Gen.choose(2000, 2030), Gen.choose(1, 12)) { (day, y, m) =>
      val s = Schedule.Monthly(Seq(day))
      val first = LocalDate.of(y, m, 1)
      val fires = (0 until first.lengthOfMonth())
        .map(first.plusDays(_).asInstanceOf[LocalDate])
        .count(s.isEnabled)
      assert(fires == 1, s"day=$day $y-$m fired $fires times")
    }
  }

  test("Schedule.Weekly fires exactly |days| times per week") {
    val genDays = Gen.someOf(1 to 7).suchThat(_.nonEmpty)
    forAll(genDays, genDate) { (days, start) =>
      val s = Schedule.Weekly(days.map(java.time.DayOfWeek.of).toSeq)
      val fires = (0 until 7).map(start.plusDays(_)).count(s.isEnabled)
      assert(fires == days.toSet.size)
    }
  }

  test("OffsetValue: ordering is consistent with the underlying values") {
    forAll(Gen.long, Gen.long) { (a, b) =>
      assert((OffsetValue.IntegralValue(a) < OffsetValue.IntegralValue(b)) == (a < b))
      assert((OffsetValue.DateTimeValue(a) compare OffsetValue.DateTimeValue(b)).sign == a.compareTo(b).sign)
    }
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      assert((OffsetValue.StringValue(a) compare OffsetValue.StringValue(b)).sign == a.compareTo(b).sign)
    }
  }

  test("OffsetValue: fromString/asString round-trips") {
    forAll(Gen.long) { n =>
      val v = OffsetValue.IntegralValue(n)
      assert(OffsetValue.fromString(v.typeName, v.asString) == v)
    }
    forAll(Gen.alphaNumStr) { s =>
      val v = OffsetValue.StringValue(s)
      assert(OffsetValue.fromString(v.typeName, v.asString) == v)
    }
  }

  test("ScheduleStrategy: fill-gaps ∪ already-ran tiles the range exactly, disjointly") {
    import graft.pipeline._
    forAll(genDate, Gen.choose(1, 30), Gen.choose(0L, Long.MaxValue)) { (from, span, mask) =>
      val to = from.plusDays(span.toLong)
      val all = ScheduleStrategy.infoDateRange(from, to, "@runDate", Schedule.Daily())
      val ran = all.zipWithIndex.collect { case (d, i) if (mask >> (i % 60) & 1L) == 1L => d }
      val bk = new Bookkeeper()
      ran.foreach(d => bk.record(RunRecord("out", d, 1, "succeeded", 0, 1)))
      val job = JobDef("j", "out", new IdentityTransformer)
      val fill = ScheduleStrategy.daysToRun(job, bk,
        RunParams.Historical(from, to)).map(_.infoDate)
      assert(fill.intersect(ran).isEmpty, "fill-gaps must never re-run completed dates")
      assert((fill ++ ran).sorted == all.sorted, "gaps + completed must tile the range")
      // force-rerun covers everything regardless of bookkeeping
      val force = ScheduleStrategy.daysToRun(job, bk,
        RunParams.Historical(from, to, RunMode.ForceRun)).map(_.infoDate)
      assert(force.sorted == all.sorted)
    }
  }

  test("ScheduleStrategy: late catch-up + new slot leave no gap after last processed") {
    import graft.pipeline._
    forAll(genDate, Gen.choose(1, 40)) { (lp, gap) =>
      val runDate = lp.plusDays(gap.toLong)
      val late = ScheduleStrategy.lateDates(runDate, Schedule.Daily(), "@runDate",
        "@runDate", Some(lp)).map(_.infoDate)
      // every date strictly between lastProcessed and runDate is late
      assert(late == (1 until gap).map(i => lp.plusDays(i.toLong)).toList)
      assert(late.forall(d => d.isAfter(lp) && d.isBefore(runDate)))
    }
  }

  test("SqlGenerator: single-day window collapses to equality for every dialect") {
    import graft.sql.{SqlConfig, SqlDialect, SqlGenerator}
    val dialects = Seq(SqlDialect.Generic, SqlDialect.Postgres, SqlDialect.MySql,
      SqlDialect.Oracle, SqlDialect.SqlServer)
    forAll(genDate, Gen.oneOf(dialects)) { (d, dia) =>
      val g = new SqlGenerator(dia, SqlConfig("dt"))
      val q = g.getDataQuery("t", d, d)
      assert(q.contains("dt = ") && !q.contains(">="))
    }
  }

  test("Packing next-fit: never overflows, keeps every chunk, stays 2-competitive") {
    val genTokens = Gen.nonEmptyListOf(Gen.choose(1L, 600L))
    val genCap = Gen.choose(64L, 512L)
    forAll(genTokens, genCap) { (tokens, cap) =>
      val chunks = tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val packed = graft.operators.Packing
        .packPartition(chunks.iterator, pid = 3L, capacity = cap).toList
      // every chunk present exactly once, in order, tokens untouched
      assert(packed.map(p => (p._1, p._2)) == chunks)
      val byBin = packed.groupBy(_._3)
      byBin.foreach { case (_, members) =>
        val total = members.map(_._2).sum
        // a bin only exceeds capacity when a SINGLE oversized chunk owns it
        if (total > cap)
          assert(members.size == 1 && members.head._2 > cap,
            s"overflowing bin with ${members.size} members (cap $cap): $members")
      }
      // bins are contiguous ids starting at pid<<40
      val ids = byBin.keys.toList.sorted
      assert(ids == (0L until ids.size).map(b => (3L << 40) | b).toList)
      // next-fit is 2-competitive vs the LP bound ceil(sum/cap) when
      // no chunk is oversized
      if (tokens.forall(_ <= cap)) {
        val opt = (tokens.sum + cap - 1) / cap
        assert(byBin.size <= 2 * opt, s"${byBin.size} bins for optimal $opt")
      }
    }
  }
}
