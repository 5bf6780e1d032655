package graft.solar

import graft.GraftSession
import graft.expressions.DecodePacket
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The single-call [[graft.expressions.DecodePacket]] expression must be
  * value-identical (including per-field NULLs on truncated buffers) to the
  * per-field column form in [[Packets]] that the golden fixtures pin.
  */
class DecodeParitySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private def fieldMap(fields: Seq[(String, Column)]): Column =
    map(fields.flatMap { case (n, c) => Seq(lit(n), c) }: _*)

  private val genBytes: Gen[Array[Byte]] = for {
    // lengths from empty through full DC message (4 + 72 + pad and beyond)
    n <- Gen.oneOf(Gen.choose(0, 20), Gen.choose(0, 90))
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  private def compare(
      kind: String,
      expr: Column => Column,
      cols: (Column, Int) => Seq[(String, Column)]): Unit = {
    val bufs = Gen.listOfN(250, genBytes).sample.get ++
      // and well-formed packets
      (0 until 50).flatMap { i =>
        Seq(
          SolarSynth.encodeDc(1700000000L + i, i * 13L),
          SolarSynth.encodeFx(1700000000L + i, i * 13L),
          SolarSynth.encodeMx(1700000000L + i, i * 13L))
      }
    val df = bufs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("id", "payload")
    val got = df
      .select(
        col("id"),
        map_keys(expr(col("payload"))).as("fast_k"),
        map_values(expr(col("payload"))).as("fast_v"),
        map_keys(fieldMap(cols(col("payload"), Packets.TimeSize))).as("slow_k"),
        map_values(fieldMap(cols(col("payload"), Packets.TimeSize))).as("slow_v"))
      .collect()
    got.foreach { r =>
      val id = r.getInt(0)
      assert(r.getSeq[String](1) == r.getSeq[String](3), s"$kind key order, id=$id")
      val fast = r.getSeq[java.lang.Double](2)
      val slow = r.getSeq[java.lang.Double](4)
      assert(fast.length == slow.length, s"$kind value count, id=$id")
      fast.indices.foreach { i =>
        assert(fast(i) == slow(i), s"$kind.${r.getSeq[String](1)(i)} id=$id")
      }
    }
  }

  test("DecodePacket.dc == per-field column decode on arbitrary buffers") {
    compare("dc", DecodePacket.dc(_, Packets.TimeSize), Packets.dcFields)
  }
  test("DecodePacket.fx == per-field column decode on arbitrary buffers") {
    compare("fx", DecodePacket.fx(_, Packets.TimeSize), Packets.fxFields)
  }
  test("DecodePacket.mx == per-field column decode on arbitrary buffers") {
    compare("mx", DecodePacket.mx(_, Packets.TimeSize), Packets.mxFields)
  }
}
