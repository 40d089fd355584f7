package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** ScalaCheck guards for the streaming surface — the last operator family
  * that only had fixture tests. Values are small integers (stored as
  * doubles) so every sum is exact regardless of Spark's aggregation order,
  * making all comparisons bit-exact.
  *
  *   1. the two sessionization twins (native session_window; custom
  *      flatMapGroupsWithState) and an independent driver fold (sort per
  *      user, split at silence > gap) agree on random event sets — the gap
  *      boundary (exactly 30 min stays in-session) is generated at high
  *      density;
  *   2. the watermarked 10-minute windowed aggregation equals a driver
  *      bucket fold on random batch input;
  *   3. incremental correctness: feeding the SAME events through a real
  *      MemoryStream in random micro-batch splits (time-ordered, so the
  *      30-min watermark never classifies anything late) and complete-mode
  *      state merging yields the batch answer exactly. */
object StreamingPropertySpec extends Properties("StreamingProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  lazy val spark = SparkTestSession.spark

  private val MIN = 60000L

  /** (user, ts_ms, value): ts gaps cluster around the 30-min session gap so
    * the ==gap / >gap boundary is exercised constantly */
  val genEvents: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(0L, 3L)
      t <- Gen.frequency(
        3 -> Gen.chooseNum(0L, 200L).map(_ * MIN),          // exact-minute grid
        2 -> Gen.chooseNum(0L, 200L * MIN),                 // arbitrary ms
        1 -> Gen.oneOf(30L * MIN, 60L * MIN, 90L * MIN))    // gap multiples
      v <- Gen.chooseNum(0, 9)
    } yield (u, t, v.toDouble))
  } yield rows

  private def mkDf(rows: List[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "ts_ms", "value")
      .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"), col("value"))
  }

  /** driver sessionize: per user, sort by ts, split when silence > gap */
  private def driverSessions(rows: List[(Long, Long, Double)])
      : Set[(Long, Long, Long, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.map(e => (e._2, e._3)).sorted
      val sessions = scala.collection.mutable.ArrayBuffer[List[(Long, Double)]]()
      sorted.foreach { e =>
        if (sessions.nonEmpty && e._1 - sessions.last.last._1 <= EventSessions.gapMs)
          sessions(sessions.size - 1) = sessions.last :+ e
        else sessions += List(e)
      }
      sessions.map(s => (u, s.head._1, s.last._1, s.size.toLong, s.map(_._2).sum))
    }.toSet

  private def collectSessions(df: DataFrame): Set[(Long, Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet

  property("session_window == custom-state == driver fold on random event sets") =
    forAll(genEvents) { rows =>
      val df = mkDf(rows)
      val want = driverSessions(rows)
      collectSessions(EventSessions.sessionize(spark, df)) == want &&
        collectSessions(EventSessions.sessionizeCustomState(spark, df)) == want
    }

  /** driver 10-min windowed aggregation keyed by (window start, type) */
  private def driverWindows(rows: List[(Long, Long, String, Double)])
      : Set[(Long, String, Long, Double)] =
    rows.groupBy(e => (e._2 / (10 * MIN), e._3)).map { case ((w, t), g) =>
      (w * 10 * MIN, t, g.size.toLong, g.map(_._4).sum)
    }.toSet

  val genTyped: Gen[List[(Long, Long, String, Double)]] = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(0L, 3L)
      t <- Gen.chooseNum(0L, 120L * MIN)
      ty <- Gen.oneOf("view", "click", "buy")
      v <- Gen.chooseNum(0, 9)
    } yield (u, t, ty, v.toDouble))
  } yield rows

  private def collectWindows(df: DataFrame): Set[(Long, String, Long, Double)] =
    df.select(unix_millis(col("window.start")).as("w"), col("event_type"),
        col("n_events"), col("value_sum"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

  property("windowedCounts == driver 10-min bucket fold on batch input") =
    forAll(genTyped) { rows =>
      import spark.implicits._
      val df = rows.toDF("user_id", "ts_ms", "event_type", "value")
        .select(timestamp_millis(col("ts_ms")).as("ts"), col("event_type"), col("value"))
      collectWindows(EventSessions.windowedCounts(df)) == driverWindows(rows)
    }

  private val qid = new AtomicInteger(0)

  property("streaming windowedCounts over random time-ordered micro-batch splits == batch") =
    forAll(genTyped, Gen.chooseNum(1, 4)) { (rows, nBatches) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      // time-ordered feed: the 30-min watermark then never drops anything,
      // so streaming state merging must reproduce the batch answer exactly
      val sorted = rows.sortBy(_._2)
      val cut = math.max(1, sorted.size / nBatches)
      val batches = sorted.grouped(cut).toList
      val input = MemoryStream[(Long, Long, String, Double)]
      val events = input.toDF().toDF("user_id", "ts_ms", "event_type", "value")
        .select(timestamp_millis(col("ts_ms")).as("ts"), col("event_type"), col("value"))
      val name = s"stream_win_prop_${qid.incrementAndGet()}"
      val q = EventSessions.windowedCounts(events)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        collectWindows(spark.table(name)) == driverWindows(rows)
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
      }
    }
}
