package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RotatingLogs
import graft.sources.RotatingLogs.LogSettings

/** O1 parity: settings-driven size rotation with a bounded backup count —
  * the reference's RotatingFileHandler semantics (`mitx/mitx_etl.py:27-35`)
  * reproduced on log4j2, with a real rollover exercised. */
class RotatingLogsSpec extends AnyFunSuite {

  private def writeSettings(dir: Path, logfile: String): Path = {
    val p = dir.resolve("settings.json")
    Files.writeString(p,
      s"""{"Logs": {"logfile": "$logfile", "max_size": 2000,
         |          "backup_count": 3, "level": "2"},
         | "Paths": {"courses": "/tmp/c", "csv_folder": "/tmp/v"}}""".stripMargin)
    p
  }

  test("settings loader: mitx-shape Logs section, fail-fast on absence") {
    val dir = Files.createTempDirectory("graft-logs")
    val logfile = dir.resolve("etl.log").toString
    val s = RotatingLogs.loadSettings(writeSettings(dir, logfile).toString)
    assert(s == LogSettings(logfile, 2000L, 3, "2"))
    val e1 = intercept[IllegalArgumentException](
      RotatingLogs.loadSettings(dir.resolve("nope.json").toString))
    assert(e1.getMessage.contains("not found"))
    val noLogs = dir.resolve("nologs.json")
    Files.writeString(noLogs, """{"Paths": {}}""")
    val e2 = intercept[IllegalArgumentException](
      RotatingLogs.loadSettings(noLogs.toString))
    assert(e2.getMessage.contains("'Logs'"))
    val partial = dir.resolve("partial.json")
    Files.writeString(partial, """{"Logs": {"logfile": "x.log"}}""")
    val e3 = intercept[IllegalArgumentException](
      RotatingLogs.loadSettings(partial.toString))
    assert(e3.getMessage.contains("max_size"))
  }

  test("logbook numeric levels map to log4j2") {
    import org.apache.logging.log4j.Level
    assert(RotatingLogs.levelOf("5") == Level.ERROR)
    assert(RotatingLogs.levelOf("4") == Level.WARN)
    // NOTICE (3) maps to the conservative neighbor — log4j2 has no NOTICE
    // tier and INFO would be one notch MORE verbose than logbook (ADVICE r15)
    assert(RotatingLogs.levelOf("3") == Level.WARN)
    assert(RotatingLogs.levelOf("2") == Level.INFO)
    assert(RotatingLogs.levelOf("1") == Level.DEBUG)
    assert(RotatingLogs.levelOf("WARN") == Level.WARN)
    assert(RotatingLogs.levelOf("garbage") == Level.INFO) // safe default
  }

  test("size rotation: live file bounded, exactly backup_count backups, .1 newest, level filter applied") {
    val dir = Files.createTempDirectory("graft-logs-rot")
    val logfile = dir.resolve("etl.log").toString
    val log = RotatingLogs.configure(
      RotatingLogs.loadSettings(writeSettings(dir, logfile).toString),
      name = "graft.etl.rotspec")
    // level "2" = logbook INFO: debug lines must not reach the file
    log.debug("SUPPRESSED-DEBUG-LINE")
    val payload = "x" * 100
    for (i <- 1 to 120) log.info(s"line $i $payload")
    // ~120 lines × ~150 B ≈ 18 kB through a 2 kB trigger → many rollovers;
    // only backup_count=3 backups may survive
    val live = new java.io.File(logfile)
    assert(live.exists, "live logfile missing")
    assert(live.length <= 2000 + 200,
      s"live file ${live.length} B exceeds max_size + one-line slop")
    for (i <- 1 to 3)
      assert(new java.io.File(s"$logfile.$i").exists, s"backup .$i missing")
    assert(!new java.io.File(s"$logfile.4").exists,
      "backup .4 exists — backup_count not enforced")
    // fileIndex=min: .1 holds NEWER lines than .3 (logbook's layout)
    def lastLineNum(f: String): Int = {
      val ls = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(java.nio.file.Paths.get(f))).asScala
      ls.reverseIterator.collectFirst {
        case l if l.contains("line ") => l.split("line ")(1).split(" ")(0).toInt
      }.getOrElse(-1)
    }
    assert(lastLineNum(s"$logfile.1") > lastLineNum(s"$logfile.3"),
      ".1 is not the newest backup")
    val all = (1 to 3).map(i => Files.readString(java.nio.file.Paths.get(s"$logfile.$i")))
      .mkString + Files.readString(java.nio.file.Paths.get(logfile))
    assert(!all.contains("SUPPRESSED-DEBUG-LINE"), "level filter not applied")
    assert(all.contains("line 120"), "newest line lost")
  }
}
