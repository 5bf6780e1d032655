package graft.solar

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests (SURVEY §5 plan): for arbitrary inputs, the byte
  * encoder and the Spark-side decoder are exact inverses through the
  * full distributed pipeline — every field, every measurement, any
  * epoch in int32 range.
  */
class CodecPropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private val genCase = for {
    userId <- Gen.choose(0L, 1000L)
    epoch <- Gen.choose(1L, Int.MaxValue.toLong - 1)
    value <- Gen.choose(0.0, 500.0).map(v => math.floor(v * 100) / 100) // 2-decimal like events
  } yield (userId, epoch, value)

  test("encode→decode roundtrip matches the closed-form spec for all packets") {
    // sample a batch of random cases, run them through ONE spark job
    val cases = Gen.listOfN(300, genCase).sample.get
    val raw = cases
      .map { case (u, t, v) =>
        (SolarSynth.topicOf(u), SolarSynth.encode(u, t, v), new java.sql.Timestamp(0L), u, t, v)
      }
      .toDF("topic", "payload", "arrival", "u", "t", "v")

    val pts = SolarIngest.points(raw.select("topic", "payload", "arrival"))
    val got = pts.collect()
      .groupBy(r => (r.getString(0), r.getTimestamp(1).toInstant.getEpochSecond))
      .view.mapValues(_.map(r => r.getString(2) -> r.getDouble(3)).toMap).toMap

    for ((u, t, v) <- cases) {
      val m = SolarSynth.measurementOf(u)
      val base = math.floor(v * 10).toLong
      val specs = m match {
        case Topics.DcName => SolarSynth.dcSpecs
        case Topics.FxName => SolarSynth.fxSpecs
        case _ => SolarSynth.mxSpecs
      }
      val fields = got((m, t))
      assert(fields.size === specs.size, s"$m field count")
      for (spec <- specs)
        assert(fields(spec.name) === SolarSynth.expectedValue(spec, base), s"$m.${spec.name} base=$base")
    }
  }

}
