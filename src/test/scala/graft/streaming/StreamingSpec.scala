package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Sessionization twins: the scalable session_window path and the
  * custom-state flatMapGroupsWithState path must agree (same 30-minute gap
  * semantics: a session closes only when the silence EXCEEDS 30min — an
  * exactly-30min gap stays in-session, matching session_window). */
class StreamingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("user_id", "ts_ms", "value")
      .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"), col("value"))

  test("session_window sessionize == custom-state sessionize, incl. exact-gap boundary") {
    val m = 60000L
    val events = mkEvents(Seq(
      (1L, 0L, 1.0), (1L, 10 * m, 2.0), (1L, 39 * m, 3.0),   // gaps < 30m: one session
      (1L, 69 * m, 4.0),                                      // exactly 30m → SAME session
      (1L, 100 * m, 5.0),                                     // 31m → new session
      (2L, 5 * m, 1.5), (2L, 200 * m, 2.5),                   // two singleton sessions
      (3L, 7 * m, 9.0)))                                      // single event
    val a = EventSessions.sessionize(spark, events)
      .orderBy("user_id", "session_start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val b = EventSessions.sessionizeCustomState(spark, events)
      .orderBy("user_id", "session_start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(a.toSeq == b.toSeq)
    // pinned expectations: the exact-30m gap stays in-session, 31m splits
    assert(a.toSeq == Seq(
      (1L, 0L, 69 * m, 4L, 10.0), (1L, 100 * m, 100 * m, 1L, 5.0),
      (2L, 5 * m, 5 * m, 1L, 1.5), (2L, 200 * m, 200 * m, 1L, 2.5),
      (3L, 7 * m, 7 * m, 1L, 9.0)))
  }

  test("streaming dedup keeps the first-seen row per fingerprint with " +
    "watermark-bounded state (dropDuplicatesWithinWatermark)") {
    // Spark 4 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDF().toDF("doc_id", "ts_ms", "text")
      .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"), col("text"))
    val q = graft.pipeline.Dedup.streamDedupFirstSeen(docs)
      .writeStream.format("memory").queryName("stream_dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 0L, "aaa"), (2L, 1000L, "bbb"), (3L, 2000L, "aaa"))
      q.processAllAvailable()
      // a later duplicate in a NEW micro-batch is still dropped (keyed state)
      input.addData((4L, 3000L, "aaa"), (5L, 4000L, "ccc"))
      q.processAllAvailable()
      val kept = spark.table("stream_dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // exactly ONE representative of the "aaa" family (which of docs 1/3
      // survives within the first batch is arbitrary, like batch
      // dropDuplicates); doc 4's later-batch duplicate MUST be dropped by
      // the keyed state, and the unique texts must both survive
      assert(kept.size == 3 && kept.contains(2L) && kept.contains(5L) &&
        kept.intersect(Set(1L, 3L)).size == 1 && !kept.contains(4L), s"kept $kept")
      // the streaming query ran with exactly one stateful dedup operator
      val prog = q.lastProgress
      assert(prog != null && prog.stateOperators.length == 1 &&
        prog.stateOperators(0).operatorName.toLowerCase.contains("dedup"),
        s"state operators: ${if (prog == null) "none" else prog.stateOperators.map(_.operatorName).mkString(",")}")
    } finally q.stop()
    val analyzed = graft.pipeline.Dedup.streamDedupFirstSeen(docs)
      .queryExecution.analyzed.toString
    assert(analyzed.contains("dropDuplicatesWithinWatermark") ||
      analyzed.toLowerCase.contains("deduplicatewithinwatermark"), analyzed)
  }

  test("session_window plan has no per-user buffering operator") {
    val events = mkEvents(Seq((1L, 0L, 1.0)))
    val plan = EventSessions.sessionize(spark, events)
      .queryExecution.executedPlan.toString
    // the scale path must be an aggregation (partial-merge capable), not a
    // FlatMapGroupsWithState that buffers a user's events
    assert(!plan.contains("FlatMapGroupsWithState"), plan)
    assert(plan.contains("Aggregate"), plan)
  }
}
