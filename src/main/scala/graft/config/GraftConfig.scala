package graft.config

/** INI-backed configuration parity with the reference's helpers
  * (`/root/reference/src/helpers/py_functions.py:13-45` reads
  * `config.ini` for query mode + CSV location/name/mode;
  * `src/helpers/py_logger.py` reads the `*_debugger` sections for
  * console/file logging with size- or time-based rotation;
  * `src/config/config.ini:34-40` is the shipped shape).
  *
  * The parser is deliberately tiny and dependency-free: `[section]`
  * headers, `key = value` pairs, `;`/`#` comments, ConfigParser's `%%`
  * escape for literal `%`, and surrounding single/double quotes stripped
  * (the reference's ini quotes `"midnight"` and `"a"`).
  */
final case class MissingConfigurationError(msg: String) extends RuntimeException(msg)

final case class IniConfig(sections: Map[String, Map[String, String]]) {
  def get(section: String, key: String): Option[String] =
    sections.get(section).flatMap(_.get(key))

  def require(section: String, key: String, context: String): String =
    get(section, key).getOrElse(throw MissingConfigurationError(context))

  def getBoolean(section: String, key: String): Option[Boolean] =
    get(section, key).map(_.toLowerCase match {
      case "true" | "yes" | "on" | "1" => true
      case _ => false
    })
}

object IniConfig {
  def parse(text: String): IniConfig = {
    var section = ""
    val out = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith(";") && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          out.getOrElseUpdate(section, scala.collection.mutable.Map())
        } else if (line.contains("=")) {
          val Array(k, v) = line.split("=", 2)
          val cleaned = unquote(v.trim.replace("%%", "%"))
          out.getOrElseUpdate(section, scala.collection.mutable.Map())
            .update(k.trim, cleaned)
        }
      }
    }
    IniConfig(out.view.mapValues(_.toMap).toMap)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  def load(path: String): IniConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}

/** `[query_settings]` — `query_mode` is always required; the CSV triple
  * only when the mode is `csv` (the reference's comment: "Following three
  * values are only required for CSV's"). */
final case class QuerySettings(
    queryMode: String,
    csvLocation: Option[String],
    csvName: Option[String],
    csvMode: Option[String]) {
  def csvPath: String =
    csvLocation.getOrElse(throw MissingConfigurationError("csv_location")) +
      csvName.getOrElse(throw MissingConfigurationError("csv_name"))
}

object QuerySettings {
  val Section = "query_settings"

  def from(ini: IniConfig, section: String = Section): QuerySettings = {
    val mode = ini.require(section, "query_mode", s"$section.query_mode")
    val s = QuerySettings(
      queryMode = mode,
      csvLocation = ini.get(section, "csv_location"),
      csvName = ini.get(section, "csv_name"),
      csvMode = ini.get(section, "csv_mode"))
    if (mode == "csv" && (s.csvLocation.isEmpty || s.csvName.isEmpty || s.csvMode.isEmpty))
      throw MissingConfigurationError(s"csv query_mode needs csv_location/csv_name/csv_mode")
    s
  }
}

/** One `*_debugger` section — basic console settings plus the rotation
  * block required when `file_logging` is on, with the reference's two
  * failure messages kept verbatim (`py_logger.py:51-117`). */
final case class LogSettings(
    debugLevel: String,
    fileFormat: String,
    dateFormat: String,
    fileLogging: Boolean,
    logRotation: Option[String],
    fileLocation: Option[String],
    fileName: Option[String],
    maxFileBytes: Option[Long],
    maxFileNo: Option[Int],
    timeCutover: Option[String],
    mode: Option[String])

object LogSettings {
  private val basicErr = "Failed to read basic logger configs"
  private val extraErr = "Failed to read file logger settings in configs"
  private val levels = Set("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")

  def from(ini: IniConfig, section: String): LogSettings = {
    val level = ini.require(section, "debug_level", basicErr)
    if (!levels.contains(level)) throw MissingConfigurationError(basicErr)
    val base = LogSettings(
      debugLevel = level,
      fileFormat = ini.require(section, "format", basicErr),
      dateFormat = ini.require(section, "dateformat", basicErr),
      fileLogging = ini.getBoolean(section, "file_logging")
        .getOrElse(throw MissingConfigurationError(basicErr)),
      logRotation = ini.get(section, "log_rotation"),
      fileLocation = ini.get(section, "file_location"),
      fileName = ini.get(section, "file_name"),
      maxFileBytes = ini.get(section, "max_file_bytes").flatMap(_.toLongOption),
      maxFileNo = ini.get(section, "max_file_no").flatMap(_.toIntOption),
      timeCutover = ini.get(section, "time_cutover"),
      mode = ini.get(section, "mode"))
    if (base.fileLogging &&
      (base.logRotation.isEmpty || base.fileLocation.isEmpty || base.fileName.isEmpty ||
        base.maxFileBytes.isEmpty || base.maxFileNo.isEmpty))
      throw MissingConfigurationError(extraErr)
    base
  }
}

/** Logger factory over `java.util.logging` (no extra dependencies):
  * console handler always; a size-rotating `FileHandler` for
  * `size_based` (JUL's limit/count rotation is the direct analogue of
  * `RotatingFileHandler`); a day-stamped file for `time_based` (JUL has
  * no timed rotation — a midnight-cutover filename gives the same
  * one-file-per-day layout `TimedRotatingFileHandler` produces). */
object GraftLogger {
  import java.util.logging._

  /** DEBUG→FINE …CRITICAL→SEVERE, the JUL equivalents of `debug_dict`. */
  def julLevel(name: String): Level = name match {
    case "DEBUG" => Level.FINE
    case "INFO" => Level.INFO
    case "WARNING" => Level.WARNING
    case "ERROR" | "CRITICAL" => Level.SEVERE
    case _ => throw MissingConfigurationError("Failed to read basic logger configs")
  }

  /** The reference's `%(asctime)s, %(name)s, %(threadName)s,
    * %(levelname)s, %(message)s` line shape, with its strftime dateformat
    * tokens translated. */
  private final class LineFormatter(s: LogSettings) extends Formatter {
    private val dateFmt = java.time.format.DateTimeFormatter.ofPattern(
      s.dateFormat
        .replace("%d", "dd").replace("%m", "MM").replace("%Y", "yyyy")
        .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss"))
    override def format(r: LogRecord): String = {
      val ts = java.time.LocalDateTime
        .ofInstant(r.getInstant, java.time.ZoneOffset.UTC).format(dateFmt)
      s.fileFormat
        .replace("%(asctime)s", ts)
        .replace("%(name)s", Option(r.getLoggerName).getOrElse(""))
        .replace("%(threadName)s", Thread.currentThread().getName)
        .replace("%(levelname)s", r.getLevel.getName)
        .replace("%(message)s", formatMessage(r)) + System.lineSeparator()
    }
  }

  def create(name: String, s: LogSettings): Logger = {
    val logger = Logger.getLogger(name)
    logger.setUseParentHandlers(false)
    logger.getHandlers.foreach(logger.removeHandler)
    logger.setLevel(julLevel(s.debugLevel))
    val console = new ConsoleHandler
    console.setFormatter(new LineFormatter(s))
    console.setLevel(julLevel(s.debugLevel))
    logger.addHandler(console)
    if (s.fileLogging) {
      val dir = java.nio.file.Paths.get(s.fileLocation.get)
      java.nio.file.Files.createDirectories(dir)
      val append = s.mode.forall(_ == "a")
      val handler = s.logRotation.get match {
        case "size_based" =>
          // %g = generation index: file.log.0 .. file.log.{maxFileNo-1}
          new FileHandler(
            dir.resolve(s.fileName.get).toString + ".%g",
            s.maxFileBytes.get, s.maxFileNo.get, append)
        case "time_based" =>
          val day = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
          new FileHandler(dir.resolve(s"$day-${s.fileName.get}").toString, append)
        case other =>
          throw MissingConfigurationError(s"unknown log_rotation: $other")
      }
      handler.setFormatter(new LineFormatter(s))
      handler.setLevel(julLevel(s.debugLevel))
      logger.addHandler(handler)
    }
    logger
  }
}
