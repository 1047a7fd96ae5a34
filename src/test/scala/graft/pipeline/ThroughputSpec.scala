package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Throughput (records/second) warning policy (reference:
  * PipelineNotificationBuilderHtml.getRpsText + warn.throughput.rps). */
class ThroughputSpec extends AnyFunSuite {

  test("sub-threshold throughput produces a warning naming both numbers") {
    // 100k records in 100s = 1000 r/s, threshold 2000
    val w = Throughput.warning(100_000L, 100_000L, warnMinRps = 2000)
    assert(w.isDefined)
    assert(w.get.contains("1000 r/s") && w.get.contains("2000"))
  }

  test("at-or-above-threshold throughput is quiet") {
    assert(Throughput.warning(200_000L, 100_000L, warnMinRps = 2000).isEmpty)
    assert(Throughput.warning(1_000_000L, 100_000L, warnMinRps = 2000).isEmpty)
  }

  test("short tasks and tiny record counts are guarded out (rps would be overhead noise)") {
    // 59s duration: under the 60s guard even though rps is terrible
    assert(Throughput.warning(1500L, 59_000L, warnMinRps = 2000).isEmpty)
    // 999 records: under the record guard
    assert(Throughput.warning(999L, 120_000L, warnMinRps = 2000).isEmpty)
    // both guards passed → warning fires
    assert(Throughput.warning(1000L, 61_001L, warnMinRps = 2000).isDefined)
  }

  test("threshold 0 disables the check") {
    assert(Throughput.warning(10L, 1_000_000L, warnMinRps = 0).isEmpty)
  }

  test("rps computes whole records/second under the guards") {
    assert(Throughput.rps(250_000L, 100_000L).contains(2500L))
    assert(Throughput.rps(100L, 100_000L).isEmpty)
  }

  test("config: global warn.throughput.rps with per-job override") {
    val parsed = PipelineConfig.parse(
      """pipeline.name = rps
        |table.a.path = /tmp/na
        |table.b.path = /tmp/nb
        |warn.throughput.rps = 2000
        |job.1.transformer = identity
        |job.1.output = a
        |job.1.option.input.table = a
        |job.2.transformer = identity
        |job.2.output = b
        |job.2.option.input.table = b
        |job.2.warn.throughput.rps = 9999
        |""".stripMargin)
    assert(parsed.jobs.map(_.warnMinRps) == Seq(2000, 9999))
  }
}
