package graft

import graft.sources.Tables
import graft.streaming.StreamOps

/** Streaming ≡ batch: the same expressions over the same files must agree
  * (Spark's unified model; SURVEY §2.8). */
class StreamingSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("tumbling window counts: AvailableNow stream equals batch") {
    val streamed = StreamOps.tumblingCounts(StreamOps.eventsStream(spark, dir))
    val got = StreamOps.runAvailableNowComplete(spark, streamed,
        "t_tumbling", tmpDir("ckpt"))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val expected = StreamOps.tumblingCounts(Tables(spark, dir, "events"))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming dedup keeps one row per (user_id, event_type)") {
    val streamed = StreamOps.dedupStream(StreamOps.eventsStream(spark, dir))
    val got = StreamOps.runAvailableNow(spark, streamed, "t_dedup", tmpDir("ckpt"))
    val expectedKeys = Tables(spark, dir, "events")
      .select("user_id", "event_type").distinct().count()
    assert(got.count() === expectedKeys)
    assert(got.select("user_id", "event_type").distinct().count() === expectedKeys)
  }

  test("stream-stream interval join: AvailableNow stream equals batch") {
    val streamed = StreamOps.purchaseErrorJoin(StreamOps.eventsStream(spark, dir))
    val order = Seq("user_id", "e_id", "p_id")
    val got = StreamOps.runAvailableNow(spark, streamed,
        "t_ssjoin", tmpDir("ckpt"))
      .orderBy(order.head, order.tail: _*)
      .collect().map(_.toSeq).toSeq
    val expected = StreamOps.purchaseErrorJoin(Tables(spark, dir, "events"))
      .orderBy(order.head, order.tail: _*)
      .collect().map(_.toSeq).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("session windows produce plausible per-user sessions") {
    val streamed = StreamOps.sessionCounts(StreamOps.eventsStream(spark, dir))
    val got = StreamOps.runAvailableNowComplete(spark, streamed,
      "t_session", tmpDir("ckpt"))
    assert(got.count() > 0)
    // every event lands in exactly one session
    val totalEvents = got.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(totalEvents === Tables(spark, dir, "events").count())
  }
}
