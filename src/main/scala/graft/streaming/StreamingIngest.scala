package graft.streaming

import graft.solar.{PointStore, SolarIngest, Topics}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming form of the reference pipeline (SURVEY §3.1): MQTT-shaped
  * source → stateful status gate → decode/explode → checkpointed append
  * sink. One `StreamingQuery` replaces the reference's three threads +
  * bounded queue; the sink upgrade is exactly-once-per-batch via
  * checkpoint + idempotent parquet append (T7 — the reference is
  * at-most-once with point drops).
  */
object StreamingIngest {

  final case class RawMsg(topic: String, payload: Array[Byte], arrival: java.sql.Timestamp)

  /** Gate state per key: latest online/offline flag (T4). */
  final case class GateState(online: Boolean)

  /** Mate sentinel key — the global gate is inherently serial (matches the
    * reference's single-threaded callback semantics). At real scale the
    * mate changelog would instead be broadcast as a slowly-changing
    * dimension; for a single broker's telemetry the volume through this
    * key is the broker's own message rate. */
  private val MateKey = "__mate__"

  private def gateKeyOf(topic: String): String = topic match {
    case Topics.MateStatus => MateKey
    case t if Topics.statusTopicFor.contains(t) => Topics.statusTopicFor(t) // data topic
    case t if Topics.statusTopicFor.values.exists(_ == t) => t // status topic
    case _ => "__other__"
  }

  private val online = "online".getBytes("US-ASCII").toSeq
  private val offline = "offline".getBytes("US-ASCII").toSeq

  /** Replay one group's micro-batch in arrival order against carried state.
    * Status rows flip state (exact payload matches only); data rows pass
    * when the current state is online. Emits the surviving data rows.
    * Passthrough keys (mate rows in the device stage, unknown topics)
    * flow through untouched so the next stage can see them. */
  private def gateFn(isStatusRow: String => Boolean, passthroughKeys: Set[String])(
      key: String,
      rows: Iterator[RawMsg],
      state: GroupState[GateState]): Iterator[RawMsg] = {
    if (passthroughKeys.contains(key)) return rows
    var on = state.getOption.exists(_.online) // unknown devices start offline
    val out = Vector.newBuilder[RawMsg]
    rows.toVector.sortBy(_.arrival.getTime).foreach { r =>
      if (isStatusRow(r.topic)) {
        val p = r.payload.toSeq
        if (p == online) on = true else if (p == offline) on = false
      } else if (on) out += r
    }
    state.update(GateState(on))
    out.result().iterator
  }

  private val deviceStatusTopics: Set[String] = Topics.statusTopicFor.values.toSet

  /** Device gate then mate gate, both carrying state across micro-batches. */
  def gated(raw: Dataset[RawMsg]): Dataset[RawMsg] = {
    import raw.sparkSession.implicits._
    val afterDevice = raw
      .groupByKey(r => gateKeyOf(r.topic))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        gateFn(deviceStatusTopics.contains, passthroughKeys = Set(MateKey, "__other__")))
    // mate gate: every surviving row plus the mate changelog through one key
    afterDevice
      .groupByKey(_ => MateKey)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        gateFn(_ == Topics.MateStatus, passthroughKeys = Set.empty))
  }

  /** The full streaming pipeline: subscribe → gate → decode → append.
    * Undecodable payloads land in `<bucket>_deadletter` with their raw
    * bytes (T6: the reference logs-and-drops; here nothing is lost). */
  def start(
      spark: SparkSession,
      broker: String,
      bucketPath: String,
      checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .format("graft.streaming.MqttSimSourceProvider")
      .option("broker", broker)
      .load()
      .as[RawMsg]

    gated(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[RawMsg], _: Long) =>
        val df = batch.toDF()
        val pts = SolarIngest.points(df)
        if (!pts.isEmpty) PointStore.write(pts, bucketPath)
        val dead = SolarIngest.deadLetter(df).select("topic", "payload", "arrival")
        if (!dead.isEmpty)
          dead.write.mode("append").parquet(s"${bucketPath}_deadletter")
      }
      .start()
  }
}
