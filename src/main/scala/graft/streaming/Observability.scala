package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability — the Spark-native form of the reference's
  * connection/status callbacks (SURVEY §2.1 S2: on_connect/disconnect/
  * subscribe logging, `/root/reference/src/classes/mqtt_classes.py:124-185`).
  * A `StreamingQueryListener` sees lifecycle (start/terminate ≈ connect/
  * disconnect) and per-batch progress (rows/sec ≈ message callbacks).
  */
class IngestListener extends StreamingQueryListener {
  final case class BatchStat(batchId: Long, numInputRows: Long, source: String)

  val started = new ConcurrentLinkedQueue[String]()
  val batches = new ConcurrentLinkedQueue[BatchStat]()
  val terminated = new ConcurrentLinkedQueue[String]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    started.add(e.name match { case null => e.id.toString; case n => n })

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val src = if (p.sources.nonEmpty) p.sources.head.description else ""
    batches.add(BatchStat(p.batchId, p.numInputRows, src))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    terminated.add(e.id.toString)
}

object Observability {
  /** Register a fresh listener on the session; caller keeps the handle. */
  def attach(spark: SparkSession): IngestListener = {
    val l = new IngestListener
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: IngestListener): Unit =
    spark.streams.removeListener(l)
}
