package graft.query

import graft.config.{IniConfig, MissingConfigurationError, QuerySettings}
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** Config-driven query execution — parity with the reference's
  * `execute_query` (`/root/reference/src/app/influx_query.py:65-85`):
  * `query_mode` from `[query_settings]` picks the yield mode, and `csv`
  * mode writes ONE file at `csv_location + csv_name` honoring `csv_mode`
  * (`w` replace / `a` append), creating the directory when missing —
  * `write_results_to_csv` (`py_functions.py:13-35`) behavior, including
  * the single-file layout its `csv.writer` produces.
  */
sealed trait QueryResult
final case class CsvWritten(path: String, rows: Long) extends QueryResult
final case class Records(rows: Seq[Map[String, Any]]) extends QueryResult
final case class RecordStream(it: Iterator[org.apache.spark.sql.Row]) extends QueryResult

object QueryExec {

  def execute(qb: QueryBuilder, ini: IniConfig): QueryResult =
    execute(qb, QuerySettings.from(ini))

  def execute(qb: QueryBuilder, settings: QuerySettings): QueryResult =
    settings.queryMode match {
      case "flux" => Records(qb.records())
      case "stream" => RecordStream(qb.iterator())
      case "csv" =>
        val target = Paths.get(settings.csvPath)
        Option(target.getParent).foreach(Files.createDirectories(_))
        // Spark's csv sink writes a directory of parts; the reference's
        // contract is one file at location+name, so write the (already
        // coalesce(1)) result to a scratch dir and splice the single part
        // into place
        val tmp = Files.createTempDirectory("graft_csv")
        val outDir = tmp.resolve("out").toString
        qb.csv(outDir)
        val part = new java.io.File(outDir).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
          .getOrElse(throw new IllegalStateException(s"no csv part written in $outDir"))
        val lines = Files.readAllLines(part.toPath)
        val appending = settings.csvMode.contains("a") && Files.exists(target)
        if (appending) {
          // append data rows only — the header is already in the file
          Files.write(target, lines.subList(1, lines.size), StandardOpenOption.APPEND)
        } else {
          Files.move(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
        }
        // best-effort scratch cleanup (deepest-first so dirs empty out)
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        CsvWritten(target.toString, (lines.size - 1).max(0).toLong)
      case other =>
        throw MissingConfigurationError(s"unknown query_mode: $other")
    }
}
