package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/**
 * Counter for whole-stage-codegen compile failures.
 *
 * Why (r17): Spark logs "Failed to compile the generated Java code"
 * at ERROR through the `CodeGenerator` logger and then SILENTLY falls
 * back to interpreted execution for the whole stage — results stay
 * correct, performance quietly goes. That is exactly how q_frontier
 * ran for rounds with its canonicalize stage past janino's 64 KB
 * method limit: every gate green, one needle in megabytes of logs.
 * This monitor turns the needle into a counted metric — Bench ships
 * `codegen_failures` (total + per-query attribution for the sf0.1
 * sweep) in its JSON line, and Verify writes `codegen_failures.json`
 * next to the dumps — so a plan that grows past the codegen limit
 * fails a ROUND ARTIFACT read instead of hiding in stderr.
 *
 * Mechanism: one log4j2 appender on the root logger config, filtering
 * to ERROR events from the Catalyst CodeGenerator with the compile-
 * failure message prefix. Counting, not parsing — the event is the
 * signal.
 */
object CodegenMonitor {
  private val failures = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var installed = false

  /** Attach the counting appender (idempotent; safe before or after
    * SparkSession creation — the root LoggerConfig survives Spark's
    * setLogLevel, which only moves the level). */
  def install(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val appender = new CountingAppender
      appender.start()
      cfg.addAppender(appender)
      // root config: the CodeGenerator class has no dedicated logger
      // config, and the loggerName + message-prefix filter keeps the
      // count specific regardless of where it is attached
      cfg.getRootLogger.addAppender(appender, Level.ERROR, null)
      ctx.updateLoggers()
      installed = true
    }
  }

  /** Compile failures observed since JVM start (monotonic; callers
    * diff snapshots for per-query attribution). */
  def count: Long = failures.get()

  private final class CountingAppender extends AbstractAppender(
      "graft-codegen-monitor", null, null, true, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      val fromCodegen = event.getLoggerName != null &&
        event.getLoggerName.endsWith(".CodeGenerator")
      if (fromCodegen && event.getLevel == Level.ERROR) {
        val msg = event.getMessage
        val txt = if (msg == null) "" else String.valueOf(msg.getFormattedMessage)
        if (txt.startsWith("Failed to compile")) { failures.incrementAndGet(); () }
      }
    }
  }
}
