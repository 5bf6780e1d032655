package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming KMV sketch must (a) carry state across micro-batches,
  * (b) end at exactly the batch sketch of the union of everything seen —
  * independent of how arrivals were split into batches — and (c) engage
  * the estimator branch once a day exceeds K distinct users.
  */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def batchSketch(users: Seq[Long]): (Int, Double) = {
    val sorted = users.distinct.map(u => md5hex(u.toString)).sorted
      .take(StreamingSketch.K).toList
    (sorted.size, StreamingSketch.estimate(sorted))
  }

  test("state carries across batches and matches the batch sketch of the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val out = StreamingSketch.kmvPerDay(in.toDF().toDF("ts", "user_id"), "ts", "user_id")
    val name = s"kmv_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("update").start()

    val day1 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val day2 = java.sql.Timestamp.valueOf("2024-03-02 09:00:00")
    // batch 1: 40 users on day 1 (sketch not full), 10 on day 2
    in.addData((1L to 40L).map(u => (day1, u)) ++ (1L to 10L).map(u => (day2, u + 1000)): _*)
    q.processAllAvailable()
    val afterB1 = spark.sql(
        s"SELECT in_sketch, est_distinct FROM $name WHERE day = timestamp'2024-03-01 00:00:00'")
      .collect().last
    assert(afterB1.getInt(0) == 40 && afterB1.getDouble(1) == 40.0,
      "below K the estimate must be exact")

    // batch 2: 60 MORE day-1 users (overlapping 31..40 — dedup by hash),
    // pushing day 1 past K so the estimator branch engages
    in.addData((31L to 100L).map(u => (day1, u)): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql(s"SELECT day, in_sketch, est_distinct FROM $name").collect()
    // memory sink in update mode appends every update — take the LAST row per day
    val last = rows.groupBy(_.getTimestamp(0)).map { case (d, rs) => d -> rs.last }
    val d1 = last(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    val d2 = last(java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))

    val (k1, est1) = batchSketch(1L to 100L)
    assert(d1.getInt(1) == k1, "day-1 sketch size")
    assert(d1.getDouble(2) == est1,
      s"day-1 estimate ${d1.getDouble(2)} != batch-formula $est1 — state did not merge")
    assert(k1 == StreamingSketch.K && est1 != 100.0, "estimator branch must have engaged")

    val (k2, est2) = batchSketch((1L to 10L).map(_ + 1000))
    assert(d2.getInt(1) == k2 && d2.getDouble(2) == est2, "day-2 sketch untouched by batch 2")
  }

  test("the final sketch is split-invariant: one batch vs many") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = java.sql.Timestamp.valueOf("2024-05-05 12:00:00")
    def run(batches: Seq[Seq[Long]]): (Int, String, Double) = {
      val in = MemoryStream[(java.sql.Timestamp, Long)]
      val out = StreamingSketch.kmvPerDay(in.toDF().toDF("ts", "user_id"), "ts", "user_id")
      val name = s"kmv_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
      batches.foreach { b => in.addData(b.map(u => (day, u)): _*); q.processAllAvailable() }
      q.stop()
      val r = spark.sql(s"SELECT in_sketch, kth, est_distinct FROM $name").collect().last
      (r.getInt(0), r.getString(1), r.getDouble(2))
    }
    val users = (1L to 90L)
    val oneShot = run(Seq(users))
    val trickled = run(users.grouped(7).toSeq.map(_.toSeq))
    assert(oneShot == trickled, s"sketch depends on batch split: $oneShot vs $trickled")
  }

  /** driver-side HLL of a user set via the same slotting. */
  private def batchHll(users: Seq[Long]): (Int, Long) = {
    val regs = new Array[Byte](StreamingSketch.HllM)
    users.distinct.foreach { u =>
      val (b, rho) = StreamingSketch.hllSlot(md5hex(u.toString).take(12))
      if (rho > regs(b)) regs(b) = rho
    }
    (regs.count(_ > 0), StreamingSketch.hllEstimate(regs))
  }

  test("HLL state merges across batches, is split-invariant, and matches the batch registers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = java.sql.Timestamp.valueOf("2024-06-01 08:00:00")
    def run(batches: Seq[Seq[Long]]): (Int, Long) = {
      val in = MemoryStream[(java.sql.Timestamp, Long)]
      val out = StreamingSketch.hllPerDay(in.toDF().toDF("ts", "user_id"), "ts", "user_id")
      val name = s"hll_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
      batches.foreach { b => in.addData(b.map(u => (day, u)): _*); q.processAllAvailable() }
      q.stop()
      val r = spark.sql(s"SELECT registers, hll_est FROM $name").collect().last
      (r.getInt(0), r.getLong(1))
    }
    val users = (1L to 3000L)
    val want = batchHll(users)
    val oneShot = run(Seq(users))
    // overlapping trickle: duplicates across batches must not perturb registers
    val trickled = run(users.grouped(500).toSeq.map(_.toSeq) :+ (1L to 400L).toSeq)
    assert(oneShot === want, s"streaming registers $oneShot != batch $want")
    assert(trickled === want, s"split/overlap changed the sketch: $trickled vs $want")
    // 3000 distinct with m=256: estimate within 5 sigma (~32%)
    assert(math.abs(want._2 - 3000.0) / 3000.0 < 5 * 1.04 / math.sqrt(256.0))
  }
}
