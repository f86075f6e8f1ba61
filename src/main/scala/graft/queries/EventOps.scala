package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.ld

/** Event-stream analytics over the `events` table: windowed aggregation,
  * sessionization, pivot — batch semantics here, with a true Structured
  * Streaming twin (q74) that runs the same hourly window through
  * readStream → watermark → writeStream(memory) and returns its sink.
  * (The reference has no streaming surface at all — SURVEY §2.8.)
  */
object EventOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_events_hourly" -> ((s, d) =>
      ld(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 2).as("tot_value"),
          round(avg("value"), 4).as("avg_value"))
        .orderBy("hr", "event_type")),

    // Sessionization: 30-min inactivity gap, one pass with window functions;
    // scale shape = single shuffle on user_id, per-user ordered scan.
    "q71_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ld(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") >= 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("tot_value"),
          (max("us") - min("us")).as("dur_us"))
        .orderBy("user_id", "sess_id")
    }),

    // Pivot columns are prefixed n_ (bare `view` is a DuckDB reserved word).
    "q72_events_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val piv = ld(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .pivot("event_type", types)
        .count()
        .na.fill(0L)
      types.foldLeft(piv)((df, t) => df.withColumnRenamed(t, s"n_$t"))
        .orderBy("hr")
    }),

    // Structured Streaming twin of q70: parquet readStream → event-time
    // window + watermark → complete-mode memory sink. Trigger.AvailableNow
    // processes the whole backlog then terminates the query on its own —
    // no processAllAvailable/stop race (r1's bench logged an aborted-task
    // from stop() interrupting an in-flight no-op microbatch). In production
    // this is writeStream.trigger(...).toTable with the identical plan.
    "q74_stream_hourly" -> ((s, d) => {
      ld(s, d, "events") // sets the nanosAsLong conf for the raw schema read
      val rawSchema = s.read.parquet(s"$d/events.parquet").schema
      // The streaming file source wants a directory: list the sf dir but
      // glob-filter down to the single events file.
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      val name = "graft_stream_hourly"
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("window.start").as("hr"), col("event_type"), col("n"),
          round(col("sum_value"), 2).as("tot_value"))
        .orderBy("hr", "event_type")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q70_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n,
                round(sum(value), 2) AS tot_value, round(avg(value), 4) AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY hr, event_type""",
    "q71_sessionize" ->
      """WITH t AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
                           lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                    FROM events),
              s AS (SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
                                            OR us - prev_us >= 1800000000
                                       THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS sess_id
                    FROM t)
         SELECT user_id, sess_id, count(*) AS n_events,
                round(sum(value), 2) AS tot_value, max(us) - min(us) AS dur_us
         FROM s GROUP BY 1, 2 ORDER BY user_id, sess_id""",
    "q72_events_pivot" ->
      """SELECT date_trunc('hour', ts) AS hr,
                count(*) FILTER (WHERE event_type = 'click') AS n_click,
                count(*) FILTER (WHERE event_type = 'error') AS n_error,
                count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                count(*) FILTER (WHERE event_type = 'view') AS n_view
         FROM events GROUP BY 1 ORDER BY hr""",
    "q74_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n,
                round(sum(value), 2) AS tot_value
         FROM events GROUP BY 1, 2 ORDER BY hr, event_type""",
  )
}
