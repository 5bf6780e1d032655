package graft.streaming

import graft.GraftSession
import graft.solar.{SolarSynth, Topics}
import org.scalatest.funsuite.AnyFunSuite

/** T5 backpressure: maxPerTrigger caps each micro-batch's admission from
  * the backlog; S2 observability: the listener sees lifecycle + batches.
  */
class BackpressureSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("maxPerTrigger drains a backlog in bounded batches; listener observes") {
    val broker = s"bp-${System.nanoTime()}"
    for (i <- 0 until 10)
      MqttSimBroker.publish(broker, Topics.FxData, SolarSynth.encodeFx(1700000000L + i, i), i.toLong)

    val listener = Observability.attach(spark)
    val raw = spark.readStream
      .format("graft.streaming.MqttSimSourceProvider")
      .option("broker", broker)
      .option("maxPerTrigger", "3")
      .load()
    val q = raw.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(s"bp_out_${System.nanoTime()}")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.streams.awaitAnyTermination(1000)

    import scala.jdk.CollectionConverters._
    val stats = listener.batches.asScala.toVector.filter(_.numInputRows > 0)
    assert(stats.map(_.numInputRows).sum === 10)
    assert(stats.forall(_.numInputRows <= 3), stats.map(_.numInputRows))
    assert(stats.size >= 4) // 10 rows at <=3/batch → at least 4 batches
    assert(listener.started.size() >= 1)
    Observability.detach(spark, listener)
  }
}
