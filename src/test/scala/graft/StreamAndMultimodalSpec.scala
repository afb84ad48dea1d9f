package graft

import org.apache.spark.sql.functions._

import graft.etl.Tables
import graft.ext.{DocFixtures, Multimodal}
import graft.streaming.Streams

/** Streaming replay vs. in-Spark batch equivalents, and the multimodal
  * decode plumbing.
  */
class StreamAndMultimodalSpec extends SparkSpec {

  test("streamed tumbling counts equal the batch window aggregation") {
    val streamed = Streams.tumblingByType(spark, sf)
      .orderBy("event_type", "window_start").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Tables.Money)).as("total_dec"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("n_events"), col("total_dec").cast("double").as("total_value"))
      .orderBy("event_type", "window_start").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streamed session windows equal batch gap-islands (up to watermark)") {
    val streamed = Streams.sessionWindows(spark, sf)
    // batch islands with Spark's session merge rule (new session iff gap >= 30m)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts"))
    val newSess = when(lag(us, 1).over(w).isNull ||
      us - lag(us, 1).over(w) >= 1800L * 1000000L, 1).otherwise(0)
    val ev = Tables.events(spark, sf)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = (maxUs / 1000 - 1800000L) * 1000
    val batch = ev
      .withColumn("sess_id", sum(newSess)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min("ts").as("session_start"),
        (unix_micros(max(col("ts"))) + 1800L * 1000000L).as("end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("end_us") <= wmUs)
      .select(col("user_id"), col("session_start"),
        timestamp_micros(col("end_us")).as("session_end"), col("n_events"))
    assert(streamed.orderBy("user_id", "session_start").collect().toSeq ==
      batch.orderBy("user_id", "session_start").collect().toSeq)
  }

  test("multimodal decode is deterministic and schema-stable") {
    val media = Multimodal.asMedia(DocFixtures.docs(spark, sf))
    val d1 = Multimodal.decode(media).orderBy("doc_id").collect()
    val d2 = Multimodal.decode(media).orderBy("doc_id").collect()
    assert(d1.length == 500)
    assert(d1.map(_.doc_id).toSeq == d2.map(_.doc_id).toSeq)
    assert(d1.map(_.mean_byte).toSeq == d2.map(_.mean_byte).toSeq)
    val first = d1.head
    assert(first.features.length == 8)
    assert(first.n_bytes > 0)
  }
}
