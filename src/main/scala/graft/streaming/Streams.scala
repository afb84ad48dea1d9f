package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.etl.Tables

/** Structured Streaming surface: tumbling/sliding windows, watermarked
  * append aggregation, and session windows over the `events` stream,
  * replayed deterministically for the batch-comparable driver harness
  * (SURVEY §7.10).
  *
  * Determinism contract: the stream runs with `Trigger.AvailableNow` over a
  * staged copy of `events` with NO per-trigger rate limit, so all data lands
  * in one micro-batch — the watermark is 0 while data is processed (nothing
  * is late-dropped), then Spark's closing no-data micro-batch advances the
  * watermark to max(event time) − delay and flushes every finalized window.
  * Appended output is therefore exactly "windows with end ≤ max_ts − delay",
  * which the DuckDB oracle states in SQL. In production the same plans run
  * unchanged with a real trigger; only the replay staging is test scaffolding.
  */
object Streams {

  private val ctr = new AtomicInteger(0)
  private val staged =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, StructType)]

  /** Stage events (ts normalized to micros) as parquet for readStream —
    * memoized per (session, dir) so the four streaming queries share one
    * staging write.
    */
  def stageEvents(spark: SparkSession, dir: String): (String, StructType) =
    staged.getOrElseUpdate((spark, dir), {
      val tmp = Files.createTempDirectory("graft_stream_").toString
      Tables.events(spark, dir).write.mode("overwrite").parquet(tmp)
      (tmp, spark.read.parquet(tmp).schema)
    })

  /** Run `transform` over a file stream of the staged events with
    * AvailableNow, collect into an in-memory sink, return the batch result.
    */
  def replay(spark: SparkSession, dir: String, outputMode: String)(
      transform: DataFrame => DataFrame): DataFrame = {
    val (staged, schema) = stageEvents(spark, dir)
    val name = s"graft_stream_${ctr.incrementAndGet()}"
    val src = spark.readStream.schema(schema).parquet(staged)
    val q = transform(src).writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Tumbling 1-hour window counts + exact-decimal sums per event_type
    * (complete mode — no watermark needed, every window emitted).
    */
  def tumblingByType(spark: SparkSession, dir: String): DataFrame =
    replay(spark, dir, "complete") { src =>
      src.groupBy(col("event_type"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(Tables.Money)).as("total_dec"))
    }.select(col("event_type"), col("window.start").as("window_start"),
      col("n_events"), col("total_dec").cast("double").as("total_value"))

  /** Watermarked tumbling aggregation in append mode: only windows the
    * 1-hour watermark has passed are emitted (late-data handling surface).
    */
  def watermarkedTumbling(spark: SparkSession, dir: String): DataFrame =
    replay(spark, dir, "append") { src =>
      src.withWatermark("ts", "1 hour")
        .groupBy(col("event_type"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(Tables.Money)).as("total_dec"))
    }.select(col("event_type"), col("window.start").as("window_start"),
      col("n_events"), col("total_dec").cast("double").as("total_value"))

  /** Sliding 1-hour windows every 15 minutes per event_type (complete). */
  def slidingByType(spark: SparkSession, dir: String): DataFrame =
    replay(spark, dir, "complete") { src =>
      src.groupBy(col("event_type"), window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"))
    }.select(col("event_type"), col("window.start").as("window_start"),
      col("n_events"))

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * profile (event count, total value, last seen). The GroupState API is
    * the escape hatch when built-in window aggs can't express the state
    * machine; under AvailableNow single-batch replay each key sees its full
    * history once and emits its final profile — batch-equivalent and
    * oracle-checkable.
    */
  def userProfiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble, Encoders.scalaLong)
    replay(spark, dir, "update") { src =>
      src.selectExpr("user_id", "event_id", "CAST(value AS DECIMAL(12,2)) AS v", "ts")
        .groupByKey((r: Row) => r.getAs[Long]("user_id"))(Encoders.scalaLong)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
          (user: Long, rows: Iterator[Row], state: GroupState[(Long, Long)]) => {
            var (n, cents) = state.getOption.getOrElse((0L, 0L))
            var lastUs = 0L
            rows.foreach { r =>
              n += 1
              cents += r.getAs[java.math.BigDecimal]("v")
                .movePointRight(2).longValueExact()
              val t = r.getAs[java.sql.Timestamp]("ts")
              lastUs = math.max(lastUs, t.getTime / 1000 * 1000000L + t.getNanos / 1000)
            }
            state.update((n, cents))
            Iterator((user, n, cents / 100.0, lastUs))
          })(stateEnc, outEnc)
        .toDF("user_id", "n_events", "total_value", "last_us")
    }.selectExpr("user_id", "n_events", "total_value",
      "timestamp_micros(last_us) AS last_ts")
  }

  /** Stream-stream interval join: purchases within one hour after a signup
    * by the same user. Inner joins emit as both sides arrive; the single
    * AvailableNow batch sees everything, so output equals the batch join.
    */
  def signupPurchaseJoin(spark: SparkSession, dir: String): DataFrame =
    replay(spark, dir, "append") { src =>
      val signups = src.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"),
          col("event_id").as("signup_id"))
        .withWatermark("signup_ts", "2 hours")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("purchase_ts", "2 hours")
      signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("signup_ts") &&
          col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("signup_id"), col("purchase_id"),
          col("signup_ts"), col("purchase_ts"))
    }

  /** Session windows (30-minute gap) per user, append mode behind a
    * 30-minute watermark. Session end = last event + gap (Spark semantics);
    * emitted sessions are those the watermark has closed.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    replay(spark, dir, "append") { src =>
      src.withWatermark("ts", "30 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
    }.select(col("user_id"),
      col("session_window.start").as("session_start"),
      col("session_window.end").as("session_end"),
      col("n_events"))
}
