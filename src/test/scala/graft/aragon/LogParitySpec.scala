package graft.aragon

import org.scalatest.funsuite.AnyFunSuite

/** S8 rotating-log parity smoke: the shipped log4j2-graft.properties
  * reproduces the reference's RotatingFileHandler shape
  * (logging_module.py:5-15) — log_output.txt at DEBUG, lines formatted
  * "asctime - LEVELNAME - message", size-rotated with numbered
  * backups. Runs in a dedicated LoggerContext so the suite's (Spark's)
  * own logging is untouched.
  */
class LogParitySpec extends AnyFunSuite {

  test("rolling appender writes the reference's line shape and rotates by size") {
    val dir = java.nio.file.Files.createTempDirectory("graftlog").toFile
    System.setProperty("graft.log.dir", dir.toString)
    val ctx = new org.apache.logging.log4j.core.LoggerContext("graft-log-parity")
    try {
      ctx.setConfigLocation(
        new java.io.File("src/main/resources/log4j2-graft.properties").toURI)
      ctx.start()
      val log = ctx.getLogger("graft.aragon.HhsLoad")
      log.debug("inserted 4996 rows into hospitals")
      log.info("load complete")

      val main = new java.io.File(dir, "log_output.txt")
      val lines = java.nio.file.Files.readAllLines(main.toPath)
      // '%(asctime)s - %(levelname)s - %(message)s', DEBUG level enabled
      assert(lines.get(0).matches(
        """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} - DEBUG - inserted 4996 rows into hospitals"""),
        lines.get(0))
      assert(lines.get(1).matches(
        """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} - INFO - load complete"""),
        lines.get(1))

      // size rotation: push past 1 MB and expect a numbered backup
      val filler = "x" * 200
      (1 to 8000).foreach(i => log.debug(s"row $i $filler"))
      assert(new java.io.File(dir, "log_output.txt.1").exists(),
        dir.listFiles().map(_.getName).mkString(","))
      // backups are capped (DefaultRolloverStrategy max=5)
      assert(!new java.io.File(dir, "log_output.txt.6").exists())
    } finally {
      ctx.stop()
      System.clearProperty("graft.log.dir")
    }
  }
}
