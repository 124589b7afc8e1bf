package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("stream-events").toString
    Seq(
      Streaming.Event(1, ts("2024-01-01 00:05:00"), 7, "click", 1.5),
      Streaming.Event(2, ts("2024-01-01 00:25:00"), 7, "click", 2.5),
      Streaming.Event(3, ts("2024-01-01 01:10:00"), 7, "view", 4.0),
      Streaming.Event(4, ts("2024-01-01 00:45:00"), 9, "click", 8.0))
      .toDF().write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling-window agg matches the batch expression") {
    val out = Streaming.runOnce(spark, eventsDir,
      df => Streaming.hourlyCounts(df), "hourly_test")
      .select("hour_start", "event_type", "n_events", "total_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out == Set(
      (ts("2024-01-01 00:00:00"), "click", 3L, 12.0),
      (ts("2024-01-01 01:00:00"), "view", 1L, 4.0)))
  }

  test("stream-static enrichment join: broadcast dim against the stream") {
    import org.apache.spark.sql.functions.broadcast
    val dims = Seq(("click", "interaction"), ("view", "content"))
      .toDF("event_type", "category")
    val out = Streaming.runOnce(spark, eventsDir,
      df => df.join(broadcast(dims), Seq("event_type"))
        .groupBy("category").count(), "enriched_test")
      .as[(String, Long)].collect().toMap
    assert(out == Map("interaction" -> 3L, "content" -> 1L))
  }

  test("streaming dedup keeps one row per content fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("stream-docs").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 00:05:00"), "the quick brown fox"), // dup content
      (3L, ts("2024-01-01 00:10:00"), "an entirely different doc"))
      .toDF("doc_id", "ts", "text").write.mode("overwrite").parquet(dir)
    val out = Streaming.runOnce(spark, dir,
      df => Streaming.dedupStream(df, "text", "ts"), "dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select("text").as[String].collect().toSeq
    assert(out.length == 2)
    assert(out.toSet ==
      Set("the quick brown fox", "an entirely different doc"))
  }

  test("stateful sessionization closes sessions after the inactivity gap") {
    val events = Seq(
      Streaming.Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Streaming.Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0),
      // 50-minute gap → new session
      Streaming.Event(3, ts("2024-01-01 01:00:00"), 7, "view", 3.0),
      Streaming.Event(4, ts("2024-01-01 00:00:00"), 9, "view", 5.0)).toDS()
    // batch-mode flatMapGroupsWithState: closed sessions are emitted; the
    // still-open tail session stays in (discarded) state
    val closed = Streaming.sessionize(events, gapMinutes = 30)
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(closed == Set((7L, 2L, 3.0)))
  }
}
