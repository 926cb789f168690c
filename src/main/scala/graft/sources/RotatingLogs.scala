package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.logging.log4j.{Level, Logger}
import org.apache.logging.log4j.core.LoggerContext

/** Settings-driven rotating file logging (SURVEY §2 O1).
  *
  * Reference parity: both ETL entrypoints push a size-rotated file handler
  * before any work — `email_mapping/email_mapping.py:20-21` with library
  * defaults, and `mitx/mitx_etl.py:27-35` sized entirely from the
  * settings file (`Logs.logfile`, `Logs.max_size`, `Logs.backup_count`,
  * `Logs.level`). The Spark-native counterpart is log4j2 (the logging
  * backend Spark itself ships): this loader builds a RollingFileAppender
  * with a size-based trigger and an indexed rollover strategy — rotate
  * when the live file exceeds `maxBytes`, keep `backupCount` backups
  * named `<logfile>.1..<backupCount>` with `.1` newest, exactly the
  * rotated-file layout the reference's handler produces.
  *
  * The declarative twin (for operators who configure Spark via
  * `-Dlog4j2.configurationFile`) is committed at
  * `src/main/resources/log4j2-graft.properties` with the same appender
  * shape; this programmatic path exists because the reference sizes
  * rotation from the SETTINGS FILE at startup, which a static config
  * cannot do.
  */
object RotatingLogs {

  /** The `Logs` settings section (`mitx/mitx_etl.py:28-33` field-for-field).
    * `level` accepts a log4j2 name ("INFO") or a logbook numeric level —
    * the reference stores ints (`int(settings['Logs']['level'])`). */
  final case class LogSettings(
      logfile: String,
      maxBytes: Long,
      backupCount: Int,
      level: String = "INFO")

  /** logbook numeric levels → log4j2 (logbook/base.py public constants:
    * CRITICAL=6 ERROR=5 WARNING=4 NOTICE=3 INFO=2 DEBUG=1 TRACE=9, 0=NOTSET).
    * log4j2 has no NOTICE tier, so "3" maps to the CONSERVATIVE neighbor
    * WARN (ADVICE r15): a settings file pinning level=3 must not record
    * INFO-level lines logbook's NOTICE threshold would suppress — a
    * too-quiet log loses a notch of detail, a too-verbose one silently
    * violates the operator's retention/volume expectations. */
  private[graft] def levelOf(s: String): Level = s.trim match {
    case "6" => Level.FATAL
    case "5" => Level.ERROR
    case "4" | "3" => Level.WARN
    case "2" => Level.INFO
    case "1" => Level.DEBUG
    case "9" => Level.TRACE
    case "0" => Level.ALL
    case name => Level.toLevel(name, Level.INFO)
  }

  /** Load the `Logs` section from a mitx-style `settings.json`. Fail-fast
    * on a missing file or section — the reference `sys.exit`s before any
    * pipeline work when its settings are unreadable (`mitx_etl.py:22-25`). */
  def loadSettings(path: String): LogSettings = {
    if (!Files.exists(Paths.get(path)))
      throw new IllegalArgumentException(s"settings file not found: $path")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(path)))
    val logs = root.path("Logs")
    if (logs.isMissingNode)
      throw new IllegalArgumentException(s"settings file has no 'Logs' section: $path")
    def req(k: String): com.fasterxml.jackson.databind.JsonNode = {
      val n = logs.path(k)
      if (n.isMissingNode)
        throw new IllegalArgumentException(s"missing required setting 'Logs.$k' in $path")
      n
    }
    LogSettings(
      logfile = req("logfile").asText(),
      maxBytes = req("max_size").asLong(),
      backupCount = req("backup_count").asInt(),
      level = req("level").asText())
  }

  /** Install the rotating appender on logger `name` (additivity off — ETL
    * log lines go to the rotated file, not Spark's console). Idempotent
    * per (context, name): a reconfigure replaces the previous appender.
    * Returns the configured logger. Builder plumbing lives in
    * [[Log4jRotation]] (Java — log4j2's F-bounded builders defeat Scala 2
    * inference). */
  def configure(s: LogSettings, name: String = "graft.etl"): Logger = {
    require(s.maxBytes > 0, s"max_size must be positive: ${s.maxBytes}")
    require(s.backupCount >= 1, s"backup_count must be >= 1: ${s.backupCount}")
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[LoggerContext]
    Log4jRotation.install(ctx, name, s.logfile, s.maxBytes, s.backupCount,
      levelOf(s.level))
  }
}
