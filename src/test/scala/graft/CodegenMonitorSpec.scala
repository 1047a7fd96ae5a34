package graft

/** The r17 lesson institutionalized: a stage past janino's 64 KB
  * method limit silently drops to interpreted eval (correct, slow,
  * one ERROR log line — q_frontier ran that way for rounds). The
  * monitor's contract is "count exactly those log events"; the gate
  * that used to emit one must now count zero. */
class CodegenMonitorSpec extends SparkSpec {

  test("counts compile-failure events from the Catalyst CodeGenerator logger, nothing else") {
    CodegenMonitor.install()
    val before = CodegenMonitor.count
    val name = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
    // both logging front-ends Spark code reaches log4j2 through
    org.apache.logging.log4j.LogManager.getLogger(name)
      .error("Failed to compile the generated Java code.", new RuntimeException("boom"))
    org.slf4j.LoggerFactory.getLogger(name)
      .error("Failed to compile the generated Java code. (via slf4j)")
    assert(CodegenMonitor.count == before + 2, "both events must count")
    // non-matching events: wrong message, wrong level, wrong logger
    org.apache.logging.log4j.LogManager.getLogger(name).error("some other error")
    org.apache.logging.log4j.LogManager.getLogger(name).info("Failed to compile (INFO)")
    org.slf4j.LoggerFactory.getLogger("graft.SomewhereElse")
      .error("Failed to compile the generated Java code.")
    assert(CodegenMonitor.count == before + 2, "only CodeGenerator ERROR events count")
  }

  test("q_frontier compiles clean: the canonicalize stage stays under the codegen limit") {
    CodegenMonitor.install()
    val before = CodegenMonitor.count
    val n = SparkEntry.queries("q_frontier")(spark, "/root/testdata/sf0.001").collect().length
    assert(n > 0)
    assert(CodegenMonitor.count == before,
      "q_frontier regrew a stage past the 64 KB codegen limit (interpreted fallback)")
  }
}
