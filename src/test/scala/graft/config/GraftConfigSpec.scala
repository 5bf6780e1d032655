package graft.config

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Config parity with the reference's helpers: INI parsing with
  * ConfigParser quirks (`%%` escape, quoted values), the two logger
  * failure messages kept verbatim, size-rotating file logging, and the
  * config-driven execute dispatch over all three query modes — the
  * behaviors `tests/helpers/test_py_functions.py:29-87` and
  * `tests/helpers/test_py_logger.py:52-180` pin in the reference.
  */
class GraftConfigSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private val referenceIni =
    """[solar_debugger]
      |;Logging levels: DEBUG, INFO, WARNING, ERROR, CRITICAL
      |debug_level     = INFO
      |file_logging    = true
      |; Log rotation can be set to time_based or size_based
      |log_rotation    = size_based
      |file_location   = output/
      |file_name       = solar_logs.log
      |format          = %%(asctime)s, %%(name)s, %%(threadName)s, %%(levelname)s, %%(message)s
      |dateformat      = %%d/%%m/%%Y, %%H:%%M:%%S
      |mode            = "a"
      |max_file_no     = 5
      |time_cutover    = "midnight"
      |max_file_bytes  = 5242880
      |
      |[query_settings]
      |; Can be either 'csv, 'flux' or 'stream'
      |query_mode      = flux
      |csv_location    = output/
      |csv_name        = query_result.csv
      |csv_mode        = w
      |""".stripMargin

  test("reference-shaped ini parses: sections, %% escapes, quoted values") {
    val ini = IniConfig.parse(referenceIni)
    val qs = QuerySettings.from(ini)
    assert(qs.queryMode === "flux")
    assert(qs.csvPath === "output/query_result.csv")
    val ls = LogSettings.from(ini, "solar_debugger")
    assert(ls.debugLevel === "INFO")
    assert(ls.fileFormat === "%(asctime)s, %(name)s, %(threadName)s, %(levelname)s, %(message)s")
    assert(ls.dateFormat === "%d/%m/%Y, %H:%M:%S")
    assert(ls.mode === Some("a"))           // quotes stripped
    assert(ls.timeCutover === Some("midnight"))
    assert(ls.maxFileBytes === Some(5242880L))
    assert(ls.maxFileNo === Some(5))
  }

  test("missing/invalid logger configs raise the reference's two messages") {
    val noFormat = IniConfig.parse(
      "[d]\ndebug_level = INFO\nfile_logging = false\ndateformat = %%H\n")
    val e1 = intercept[MissingConfigurationError](LogSettings.from(noFormat, "d"))
    assert(e1.msg === "Failed to read basic logger configs")

    val badLevel = IniConfig.parse(
      "[d]\ndebug_level = LOUD\nfile_logging = false\nformat = x\ndateformat = %%H\n")
    assert(intercept[MissingConfigurationError](LogSettings.from(badLevel, "d")).msg
      === "Failed to read basic logger configs")

    val noRotation = IniConfig.parse(
      "[d]\ndebug_level = INFO\nfile_logging = true\nformat = x\ndateformat = %%H\n")
    val e2 = intercept[MissingConfigurationError](LogSettings.from(noRotation, "d"))
    assert(e2.msg === "Failed to read file logger settings in configs")
  }

  test("csv query_mode requires the csv triple") {
    val ini = IniConfig.parse("[query_settings]\nquery_mode = csv\ncsv_location = out/\n")
    intercept[MissingConfigurationError](QuerySettings.from(ini))
  }

  test("size-rotating file logger writes formatted lines at the configured level") {
    val dir = java.nio.file.Files.createTempDirectory("graftlog").toString
    val ini = IniConfig.parse(referenceIni.replace("output/", s"$dir/"))
    val ls = LogSettings.from(ini, "solar_debugger")
    val log = GraftLogger.create("graft-test", ls)
    log.fine("debug line that must be filtered at INFO")
    log.info("hello from the config spec")
    log.getHandlers.foreach(_.flush())
    val f = new java.io.File(s"$dir/solar_logs.log.0")
    assert(f.exists, s"expected rotating log file at $f")
    val content = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(content.contains("INFO, hello from the config spec"))
    assert(content.contains("graft-test"))
    assert(!content.contains("debug line"))
  }

  test("execute dispatch: flux records, stream iterator, csv write + append") {
    import graft.query.{QueryBuilder, QueryExec, CsvWritten, Records, RecordStream}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val points = Seq(
      ("fx-1", java.sql.Timestamp.valueOf("2023-01-01 00:00:00"), "volts", 24.5),
      ("mx-1", java.sql.Timestamp.valueOf("2023-01-01 00:01:00"), "amps", 3.25))
      .toDF("measurement", "time", "field", "value")
    def qb = QueryBuilder.fromDataFrame(spark, () => points).appendSort("_time")

    QueryExec.execute(qb, QuerySettings("flux", None, None, None)) match {
      case Records(rows) =>
        assert(rows.size === 2)
        assert(rows.head.keySet === Set("_measurement", "_timestamp", "_field", "_value"))
      case other => fail(s"expected Records, got $other")
    }
    QueryExec.execute(qb, QuerySettings("stream", None, None, None)) match {
      case RecordStream(it) => assert(it.size === 2)
      case other => fail(s"expected RecordStream, got $other")
    }

    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString
    val w = QuerySettings("csv", Some(s"$dir/sub/"), Some("result.csv"), Some("w"))
    QueryExec.execute(qb, w) match {
      case CsvWritten(path, rows) =>
        assert(rows === 2)
        val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
        assert(lines.size === 3) // header + 2 rows
        assert(lines.get(0).contains("_measurement"))
      case other => fail(s"expected CsvWritten, got $other")
    }
    // append mode: data rows accumulate, header stays single
    val a = w.copy(csvMode = Some("a"))
    QueryExec.execute(qb, a)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/sub/result.csv"))
    assert(lines.size === 5) // header + 2 + 2
    assert(lines.asScala.count(_.contains("_measurement")) === 1)
  }

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}
