package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Persisted derived-artifact store: bucketed parquet layouts (ANN
  * indexes, compaction fixtures) that are built ONCE and then served to
  * many queries — the shape a 100 TB corpus actually uses, where an
  * index build is amortized over millions of searches instead of being
  * recomputed inline per query.
  *
  * Layout per artifact: `<dir>/<table>/` parquet (optionally
  * partition-bucketed), plus a `<dir>/_meta/` parquet holding the source
  * row count and a source CONTENT STAMP (size+mtime fold of the source
  * parquet — regenerated data changes mtime even when row counts
  * collide, and checking it scans no data). Freshness = meta exists AND
  * its stamp matches the source's current one; the meta is deleted
  * FIRST and re-written LAST on publish, so a crash mid-build always
  * reads as stale and rebuilds. Reads take an explicit schema so an
  * empty-corpus artifact (a `_SUCCESS`-only directory) still loads as an
  * empty frame instead of failing schema inference.
  */
object IndexStore {

  /** Artifact root: JVM temp space, keyed by source dir + artifact kind. */
  def dirFor(sfDir: String, kind: String): String = {
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_store")
    new java.io.File(new java.io.File(root, sfDir.replaceAll("[^A-Za-z0-9.]+", "_")), kind).getPath
  }

  private def metaPath(dir: String) = s"$dir/_meta"

  /** Content stamp of a source parquet file/directory: folds every
    * file's length and mtime. Regenerated testdata changes mtime even
    * when row counts collide, so a stale artifact can never be served
    * after the source is rewritten — and no data is scanned to check. */
  def sourceStamp(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).foldLeft(f.getName.hashCode.toLong)(_ * 31 + _)
      else f.length * 1000003L + f.lastModified
    val f = new java.io.File(path)
    if (f.exists()) walk(f) else -1L
  }

  /** Source row count recorded at publish time, None if never published
    * (or a publish crashed before the meta write). */
  def publishedCount(s: SparkSession, dir: String): Option[Long] =
    try {
      val m = s.read.schema("n LONG").parquet(metaPath(dir)).collect()
      m.headOption.map(_.getLong(0))
    } catch { case _: Throwable => None }

  /** Freshness check against a source stamp: true only when a meta
    * exists AND its recorded stamp matches the source's current one. */
  def isFresh(s: SparkSession, dir: String, stamp: Long): Boolean =
    try {
      val m = s.read.schema("n LONG, stamp LONG").parquet(metaPath(dir)).collect()
      m.headOption.exists(r => !r.isNullAt(1) && r.getLong(1) == stamp)
    } catch { case _: Throwable => false }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(); ()
  }

  /** Drop the freshness marker: the artifact reads as stale until the
    * next [[writeMeta]] — bracket any multi-step mutation with this. */
  def invalidate(dir: String): Unit = rm(new java.io.File(metaPath(dir)))

  /** Publish the freshness marker (LAST step of any build/update). */
  def writeMeta(s: SparkSession, dir: String, sourceCount: Long, stamp: Long = -1L): Unit =
    s.range(1).select(lit(sourceCount).as("n"), lit(stamp).as("stamp")).coalesce(1)
      .write.mode("overwrite").parquet(metaPath(dir))

  /** Write one artifact table (overwrite). */
  def write(df: DataFrame, dir: String, table: String, parts: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(s"$dir/$table")
  }

  /** APPEND rows into an existing artifact table — incremental index
    * maintenance: new partition files accrete next to the existing ones,
    * nothing is rewritten. Caller must [[invalidate]] first and
    * [[writeMeta]] after, so a crash mid-append reads as stale. */
  def append(df: DataFrame, dir: String, table: String, parts: Seq[String]): Unit = {
    val w = df.write.mode("append")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(s"$dir/$table")
  }

  /** Write the artifact tables, then the meta marker. `tables` maps a
    * table name to its frame and (possibly empty) partition columns. */
  def publish(
      s: SparkSession,
      dir: String,
      sourceCount: Long,
      tables: Seq[(String, DataFrame, Seq[String])],
      stamp: Long = -1L): Unit = {
    invalidate(dir) // stale-on-crash: meta dies first
    tables.foreach { case (name, df, parts) => write(df, dir, name, parts) }
    writeMeta(s, dir, sourceCount, stamp)
  }

  /** Read an artifact table with an explicit schema (empty-safe). */
  def read(s: SparkSession, dir: String, table: String, schema: StructType): DataFrame =
    s.read.schema(schema).parquet(s"$dir/$table")

  /** Read with a DDL-string schema. */
  def read(s: SparkSession, dir: String, table: String, ddl: String): DataFrame =
    read(s, dir, table, StructType.fromDDL(ddl))
}
