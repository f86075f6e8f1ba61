package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.ld

/** Event-stream analytics over the `events` table: windowed aggregation,
  * sessionization, pivot — batch semantics here, with a true Structured
  * Streaming twin (q74) that runs the same hourly window through
  * readStream → watermark → writeStream(memory) and returns its sink.
  * (The reference has no streaming surface at all — SURVEY §2.8.)
  */
object EventOps {

  /** q326's protocol DFA — one Scala literal rendered both as the Spark
    * broadcast frame and the oracle's VALUES (the q319/q324
    * generated-both-sides discipline). */
  private[queries] val dfaAllowed: Seq[(String, String)] = Seq(
    "signup" -> "view", "signup" -> "error",
    "view" -> "view", "view" -> "click", "view" -> "error",
    "click" -> "view", "click" -> "click", "click" -> "purchase",
    "click" -> "error",
    "purchase" -> "view", "purchase" -> "signup",
    "error" -> "view", "error" -> "signup")

  private[queries] lazy val dfaAllowedValues: String = dfaAllowed
    .map { case (f, t) => s"('$f', '$t')" }.mkString(", ")

  /** Streaming state-store provider selector (r16): `rocksdb` (default —
    * the 100 TB production provider, and what every committed bench number
    * was measured with) or `hdfs` (Spark's in-heap store — lower fixed
    * startup cost per query at toy state sizes, unsafe once state outgrows
    * executor heap). Read from the parent session's runtime conf inside
    * [[withStreamSession]]. */
  private[graft] val StateStoreProviderConf =
    "spark.graft.streaming.stateStore"

  /** Run `f` against a CLONED session (`s.newSession()`: shared
    * SparkContext and persistent catalog, ISOLATED runtime conf and temp
    * views) whose spark.sql.shuffle.partitions is fixed at `n`. Stateful
    * streaming operators allocate one state store per shuffle partition
    * (per stateful op, ×2 for a stream-stream join), and every
    * AvailableNow microbatch pays a fixed per-store maintenance cost — at
    * this corpus (100k events) the fixed costs dominate. Measured isolated
    * at sf0.1 going 32 → 8 partitions (min-of-2): q85 10.4 → 8.8, q76
    * 6.0 → 4.1, q74 within noise. q85 — the only TWO-sided stateful op
    * (a stream-stream join keeps a store per side per partition) — pays
    * double the per-store cost, so it runs at 4 (r12 re-measure: 8 → 4
    * gives 5.8 → 2.8 s; 2 regresses to 3.2 s as parallelism loss wins).
    * At production volume the same knob sizes state partitions to
    * throughput, per query. Cloning instead of the old
    * mutate-and-restore means a concurrently running query on the parent
    * session can never observe the temporary value and there is no restore
    * to race (r4 advice). The memory sink registers its temp view in the
    * session that STARTS the query, so `f` receives the clone and must
    * build the source, start the stream, and read the sink through it. */
  private def withStreamSession[T](s: SparkSession, n: Int)
                                  (f: SparkSession => T): T = {
    val ss = s.newSession()
    // newSession starts from builder-time defaults: re-pin the runtime
    // confs this corpus depends on (Tables.ld's nanos-parquet read).
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss.conf.set("spark.sql.shuffle.partitions", n.toString)
    // RocksDB state store: the production provider for large state — the
    // default HDFS-backed store keeps every key in executor heap, which is
    // the wrong store the moment state outgrows memory (stream-stream join
    // buffers, dedup sets at 100 TB). RocksDB spills to local disk,
    // snapshots incrementally, and bounds heap by block cache instead of
    // state size. Set per cloned session so batch queries are untouched.
    // Measured trade-off at THIS corpus (100k events, r7 isolated
    // median-of-3): q85 HDFS 2.18 s → RocksDB 2.61 s → +changelog 2.53 s;
    // q85 at 4 partitions regressed to 2.93 s (8 kept). The ~0.3 s is
    // fixed native-store startup across 16 tiny stores — the price of the
    // config that survives state > heap; at real volume it inverts.
    //
    // r16: the provider is now a conf (`spark.graft.streaming.stateStore`,
    // read from the PARENT session so callers can set it with
    // spark.conf.set) — `rocksdb` (default, the production choice and the
    // committed bench configuration) or `hdfs` (Spark's in-heap default
    // store: ~0.3-0.4 s less fixed cost per streaming query at THIS corpus,
    // the right pick only when total state provably fits executor heap).
    // The default keeps every bench/oracle run on the 100 TB-honest
    // provider — this knob documents the trade-off, it does not move the
    // committed numbers.
    val provider = s.conf.getOption(StateStoreProviderConf)
      .getOrElse("rocksdb")
    provider match {
      case "rocksdb" =>
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
        // Changelog checkpointing: commit the per-batch delta instead of a
        // full RocksDB snapshot upload — the production default for
        // frequent microbatches, and it trims the per-batch fixed cost
        // that dominates at this corpus size.
        ss.conf.set("spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled", "true")
      case "hdfs" => // Spark's built-in default provider; nothing to set
      case other => throw new IllegalArgumentException(
        s"$StateStoreProviderConf must be 'rocksdb' or 'hdfs', got '$other'")
    }
    f(ss)
  }

  /** Typed rows for q77's Dataset path (Encoders need stable classes). */
  final case class SessEvent(user_id: Long, event_id: Long, us: Long,
                             value: Double)
  final case class Session(user_id: Long, sess_id: Long, n_events: Long,
                           tot_value: Double, dur_us: Long)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // `value` is 2-decimal money: summed as exact BIGINT cents (row-side
    // decimal→cents cast, long agg buffer — the q05 pattern), which is
    // order-independent — a plain double sum drifted in the last rounded
    // digit on 3 of 10,800 cells at sf0.1 (parallel partial aggregation
    // reorders the float adds; rounding can't hide a value sitting on the
    // .xxxx5 boundary). The 4-decimal average is rounded in exact INTEGER
    // arithmetic — (2t+n) div 2n is round-half-up of t/n — because
    // round(double, 4) itself disagrees across engines exactly at those
    // boundaries (Spark rounds the shortest decimal repr HALF_UP, DuckDB
    // rounds the raw binary double: 58.47375 → 58.4738 vs 58.4737).
    // The final /10000.0 yields a ≤4-decimal rational, identical doubles.
    "q70_events_hourly" -> ((s, d) =>
      ld(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
            .as("tvc"))
        .selectExpr("hr", "event_type", "n",
          "CAST(tvc AS DOUBLE) / 100 AS tot_value",
          """CAST((2 * tvc * 100 + n) DIV (2 * n) AS DOUBLE)
             / 10000 AS avg_value""")
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
    "q74_stream_hourly" -> ((s, d) => withStreamSession(s, 8) { ss =>
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      // The streaming file source wants a directory: list the sf dir but
      // glob-filter down to the single events file.
      val stream = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .transform(Tables.normalizeEventsTs)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        // exact cents sum — order-independent across microbatch/partition
        // splits, same reasoning as q70
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
            .as("sum_value"))
      val name = "graft_stream_hourly"
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(name)
        .select(col("window.start").as("hr"), col("event_type"), col("n"),
          (col("sum_value").cast("double") / 100).as("tot_value"))
        .orderBy("hr", "event_type")
    }),
  )

  // --- additions beyond the reference: as-of join, session windows,
  //     streaming dedup, JSON column ops ---

  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SESSION TRANSITION MATRIX (sequence mining): within-session
    // event-type bigram counts — the first-order Markov model behind
    // funnel discovery and bot/anomaly detection ("what follows what,
    // how often"). Reuses q71's exact session boundary (30-min
    // inactivity gap): a transition exists between consecutive events
    // of the SAME user iff the gap is under the threshold (new_sess=0
    // rows pair with their lag — no session-id materialization even
    // needed). Scale shape: ONE shuffle on user_id for the ordered
    // window, then a type²-sized (≤25 rows) groupBy — the transition
    // matrix is a fixed-size mergeable state no matter the corpus size.
    // Outgoing share per from-state in exact basis points (half-up
    // integer rounding, the q143 recipe) — no float anywhere.
    "q149_session_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = ld(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("from_type", lag("event_type", 1).over(w))
        .filter(col("prev_us").isNotNull &&
          col("us") - col("prev_us") < 1800L * 1000000L)
        .select(col("from_type"), col("event_type").as("to_type"))
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val wtot = Window.partitionBy("from_type")
      trans.withColumn("tot", sum("n").over(wtot))
        .selectExpr("from_type", "to_type", "n",
          "CAST((2 * n * 10000 + tot) DIV (2 * tot) AS BIGINT) AS share_bp")
        .orderBy("from_type", "to_type")
    }),

    // Time-RANGE rolling aggregates: per event, stats over the SAME user's
    // trailing hour — burst/rate-limit detection and the feature-engineering
    // staple q58's ROWS-frame suite can't express (peers are picked by
    // timestamp distance, not row count). One shuffle on user_id, then a
    // per-user ordered scan with a sliding range frame — no self-join, no
    // point-in-interval explosion; at 100 TB this is the canonical shape
    // (a time-range self-join would be quadratic per user). Frame bounds
    // are integral microseconds (unix_micros ↔ epoch_us) so both engines
    // cut the frame at identical points; the money sum uses the exact
    // BIGINT-cents recipe (q70) so no result depends on float order; ties
    // on ts share one frame (RANGE peers), making n_1h/cents_1h
    // order-independent; gap_us orders by (ts, event_id) — unique — so
    // lag is deterministic too.
    "q103_rolling_time_window" -> ((s, d) => {
      val wr = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3599999999L, 0)
      val wl = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      ld(s, d, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(wr).as("n_1h"),
          sum("cents").over(wr).as("cents_1h"),
          max("cents").over(wr).as("max_cents_1h"),
          (col("us") - lag("us", 1).over(wl)).as("gap_us"))
        .orderBy("event_id")
    }),

    // As-of join: each purchase matched to the user's most recent click at
    // or before it. Spark has no ASOF operator; the scalable composition is
    // union-tag → ONE window pass per user (last click ts carried forward)
    // → filter purchases. One shuffle on user_id, no range cross-join.
    // DuckDB's native ASOF JOIN is the oracle.
    "q49_asof_join" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "purchase").cast("int").as("is_p"))
      // clicks sort before purchases at equal ts, so an equal-ts click is
      // visible to the purchase (ASOF semantics: p.ts >= c.ts).
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_click_ts",
          last(when(col("is_p") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("is_p") === 1)
        .select(col("event_id"), col("user_id"), col("last_click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_click_ts")))
            .as("gap_us"))
        .orderBy("event_id")
    }),

    // Built-in session windows (30-min inactivity gap) — the declarative
    // twin of q71's window-function sessionization; same session boundaries.
    "q75_session_window" -> ((s, d) =>
      ld(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("tot_value"))
        .select(col("user_id"), col("sw.start").as("sess_start"),
          col("n_events"), col("tot_value"))
        .orderBy("user_id", "sess_start")),

    // Streaming exact dedup with BOUNDED state: watermark + the dedicated
    // dropDuplicatesWithinWatermark operator, which evicts a key's state
    // once the watermark passes its event time + delay. The delay here
    // (200 days) deliberately covers the whole test corpus (~141 days) so
    // the result is the exact distinct set and the batch oracle still
    // hash-matches; in production the delay is the real duplicate horizon
    // (e.g. 24 h) and state is O(keys-per-horizon) instead of O(all keys
    // ever seen) — the fix for r2's unbounded-state flag.
    // First-seen row is arrival-order-dependent; the (user_id, event_type)
    // SET is not — so the rollup is deterministic and oracle-checkable.
    "q76_stream_dedup" -> ((s, d) => withStreamSession(s, 8) { ss =>
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      val name = "graft_stream_dedup"
      val q = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .transform(Tables.normalizeEventsTs)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withWatermark("ts", "200 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(name).groupBy("event_type")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("event_type")
    }),

    // Typed Dataset surface: KeyValueGroupedDataset.flatMapGroups with case
    // classes + Encoders — the idiomatic Spark replacement for the
    // reference's per-group accumulator loop (`aggregate/mod.rs:76-97`),
    // here running imperative per-user sessionization. Scale shape: one
    // shuffle on the group key; each group's events fit an executor (a
    // user's events), sorted in-memory. Same output contract as q71, so
    // the same oracle verifies the typed path against DuckDB.
    "q77_typed_sessionize" -> ((s, d) => {
      import s.implicits._
      val ev = ld(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .as[SessEvent]
      ev.groupByKey(_.user_id)
        .flatMapGroups { (uid: Long, it: Iterator[SessEvent]) =>
          val evs = it.toArray.sortBy(e => (e.us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var sessId = 0L
          var n = 0L; var tot = 0.0; var minUs = 0L; var maxUs = 0L
          def flush(): Unit = if (n > 0) {
            val rounded = java.math.BigDecimal.valueOf(tot)
              .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
            out += Session(uid, sessId, n, rounded, maxUs - minUs)
          }
          var prevUs = Long.MinValue
          evs.foreach { e =>
            if (prevUs == Long.MinValue || e.us - prevUs >= 1800L * 1000000L) {
              flush(); sessId += 1; n = 0; tot = 0.0; minUs = e.us
            }
            n += 1; tot += e.value; maxUs = e.us; prevUs = e.us
          }
          flush()
          out
        }
        .toDF()
        .orderBy("user_id", "sess_id")
    }),

    // Streaming custom state: mapGroupsWithState maintains a per-user
    // running event count across microbatches (Update mode). The memory
    // sink accumulates every per-batch emission, so the final per-user
    // count is the MAX across emissions. State is BOUNDED by an
    // EVENT-time timeout: a key whose last event is 200 days behind the
    // watermark is evicted (the timeout branch emits its final count and
    // removes state), so at 100 TB the RocksDB store holds the active
    // working set, not every user ever seen — the fix for r2's
    // unbounded-state flag. Event-time (not processing-time) timeouts on
    // purpose: with Trigger.AvailableNow a processing-time timeout keeps
    // the query alive waiting for wall-clock to pass (measured: hang);
    // the watermark clock stops with the data, so termination is clean.
    // The timeout is anchored to DATA time — max(watermark, this batch's
    // last event) + 200 days — never the bare watermark: the watermark is 0
    // during the first data batch, so watermark+horizon would give batch-1
    // keys a timeout of epoch+200d, far behind the corpus's event times,
    // and any multi-batch split (several part files, maxFilesPerTrigger)
    // would evict live keys mid-backlog and silently restart their counts.
    // Anchored to each key's last event, no key can time out until the
    // watermark passes its last event + 200 days — beyond the corpus span
    // (~141 days) — so the result matches the batch oracle regardless of
    // how AvailableNow splits the backlog.
    "q78_stream_state" -> ((s, d) => withStreamSession(s, 8) { ss =>
      import ss.implicits._
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      val name = "graft_stream_state"
      val counts = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .transform(Tables.normalizeEventsTs)
        .withWatermark("ts", "1 hour")
        .select(col("user_id"), col("ts"))
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .mapGroupsWithState[Long, (Long, Long)](
          org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
           state: org.apache.spark.sql.streaming.GroupState[Long]) =>
            if (state.hasTimedOut) {
              val n = state.getOption.getOrElse(0L)
              state.remove() // evict idle key — this is the state bound
              (uid, n)
            } else {
              var n = state.getOption.getOrElse(0L)
              var lastMs = Long.MinValue
              rows.foreach { r =>
                n += 1
                val t = r._2.getTime
                if (t > lastMs) lastMs = t
              }
              state.update(n)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), lastMs) +
                  200L * 24 * 3600 * 1000)
              (uid, n)
            }
        }
        .toDF("user_id", "n")
      val q = counts.writeStream.outputMode("update")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(name).groupBy("user_id").agg(max("n").as("n_events"))
        .orderBy("user_id")
    }),

    // Unpivot (wide → long): the inverse of q72's pivot, via stack().
    "q73_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = ld(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .pivot("event_type", types).count().na.fill(0L)
      wide.selectExpr("hr",
        s"stack(${types.size}, ${types.map(t => s"'$t', `$t`").mkString(", ")}) AS (event_type, n)")
        .filter(col("n") > 0)
        .orderBy("hr", "event_type")
    }),

    // Stream-static join: the streaming fact joins a batch dimension
    // (high-value users derived once) — the dim is broadcast per
    // microbatch; no stream-side state. The canonical enrichment shape.
    "q79_stream_static_join" -> ((s, d) => withStreamSession(s, 8) { ss =>
      // the static dim is built on the SAME (cloned) session as the stream
      // — mixing DataFrames across sessions in one query is unsupported
      val ev = ld(ss, d, "events")
      val bigSpenders = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(sum("value").as("spent"))
        .filter(col("spent") > 500)
        .select("user_id")
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      val name = "graft_stream_static"
      val q = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .select(col("user_id"), col("event_type"))
        .join(broadcast(bigSpenders), "user_id")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(name).orderBy("event_type")
    }),

    // STREAMING incremental dedup — q94's per-ingest anti-join run the way
    // a recurring-crawl pipeline actually deploys it: the "new batch"
    // arrives as a STREAM of documents, the accumulated snapshot's content
    // fingerprints are the static side, and each microbatch left-anti
    // joins against them, admitting only never-seen content. No stream
    // state at all (the seen-set lives outside the stream, refreshed per
    // ingest cycle) — the stateful alternative (dropDuplicates over the
    // fingerprint, q76's shape) would hold the ENTIRE historical digest
    // set in the state store forever; the stream-static anti-join keeps
    // the stream stateless and the seen-set where it belongs, in a
    // (bucketed, at 100 TB) table. Same rows as q94 by construction, so
    // it shares q94's oracle semantics; the digest is computed per
    // microbatch row — pure projection, no shuffle on the stream side
    // until the (broadcast-suppressed in batch; per-microbatch here)
    // anti-join. ISOLATED MEDIAN (BenchSome, r8, calm host): 0.64 s at
    // sf0.1 (ratio 2.1× cal) — the cheapest streaming query, because it
    // carries zero state.
    "q122_stream_incremental_dedup" -> ((s, d) =>
      withStreamSession(s, 8) { ss =>
        val docs = graft.Tables.ld(ss, d, "documents")
        val seen = docs.filter(col("doc_id") % 5 =!= 0)
          .select(md5(col("text")).as("fp"))
        val rawSchema = ss.read.parquet(s"$d/documents.parquet").schema
        val name = "graft_stream_incr_dedup"
        val q = ss.readStream.schema(rawSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(d)
          .filter(col("doc_id") % 5 === 0)
          .withColumn("fp", md5(col("text")))
          // shuffle_hash: the seen-set is the whole historical corpus at
          // scale — Spark would broadcast the 400-row toy version per
          // microbatch and hide that (the q94 hint, same reasoning)
          .join(seen.hint("shuffle_hash"), Seq("fp"), "left_anti")
          .select("doc_id", "source", "n_chars")
          .writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        ss.table(name).orderBy("doc_id")
      }),

    // Streaming NEAR-dup — the fuzzy counterpart of q122's exact
    // incremental dedup, and the rung that makes the streaming dedup
    // story complete: new documents are probed against the accumulated
    // snapshot's simhash BAND-BUCKET index (q67's 8×8 banding over the
    // native SimHash64 kernel — the demo config; the r14 ×8 curve
    // measured fixed 8-bit bands superlinear at corpus scale, where the
    // q105 4×16 pairing is the config a production snapshot index would
    // carry, same join shape), candidates confirmed by exact Hamming
    // ≤ 6 — per microbatch, STATELESS on the stream. The snapshot index
    // is the static join side (at 100 TB a bucket-keyed table the stream
    // shuffles against per batch — shuffle_hash-hinted, never broadcast,
    // same honesty as q122's seen-set). The multi-band dedup that batch
    // q67 does with distinct() would be STATEFUL here (dropDuplicates
    // holds every emitted pair forever); instead the join emits each
    // pair exactly once statelessly: both signatures are in hand after
    // the band join, so only the row whose band_idx equals the MINIMAL
    // matching band (first zero byte of the XOR) survives the confirm
    // filter. Oracle: the batch q67 pair scan restricted to
    // stream-slice × snapshot-slice by construction. ISOLATED MEDIAN
    // (BenchSome, r9, cal 0.40 s): 1.23 s at sf0.1 (ratio 3.1×) —
    // streaming fixed cost over a stateless plan, the cheap end of the
    // streaming family, because it carries zero state.
    "q126_stream_neardup" -> ((s, d) =>
      withStreamSession(s, 8) { ss =>
        val docs = graft.Tables.ld(ss, d, "documents")
        val snapIdx = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id").as("dup_id"),
            graft.functions.TextExprs.simhash64(col("text")).as("snap64"))
          .selectExpr("dup_id", "snap64",
            s"stack(8, ${(0 until 8).map(j =>
              s"$j, cast(shiftright(snap64, ${8 * j}) & 255 as int)")
              .mkString(", ")}) AS (band_idx, band_val)")
        val rawSchema = ss.read.parquet(s"$d/documents.parquet").schema
        val name = "graft_stream_neardup"
        val q = ss.readStream.schema(rawSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(d)
          .filter(col("doc_id") % 5 === 0)
          .withColumn("new64",
            graft.functions.TextExprs.simhash64(col("text")))
          .select(col("doc_id"), col("new64"),
            explode(expr("""transform(sequence(0, 7),
              j -> struct(CAST(j AS INT) AS band_idx,
                CAST(shiftright(new64, j * 8) & 255 AS INT) AS band_val))"""))
              .as("bk"))
          .select(col("doc_id"), col("new64"),
            col("bk.band_idx"), col("bk.band_val"))
          .join(snapIdx.hint("shuffle_hash"), Seq("band_idx", "band_val"))
          .withColumn("xr", col("new64").bitwiseXOR(col("snap64")))
          .filter(bit_count(col("xr")) <= 6)
          // stateless pair dedup: emit only on the first matching band
          .filter(col("band_idx") === expr(
            "array_min(filter(sequence(0, 7), j -> (shiftright(xr, j * 8) & 255) = 0))"))
          .select(col("doc_id"), col("dup_id"),
            bit_count(col("xr")).cast("int").as("hamming"))
          .writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        ss.table(name).orderBy("doc_id", "dup_id")
      }),

    // Stream-stream inner join: purchases ⋈ clicks on user within a 30-min
    // event-time window, BOTH sides watermarked — Spark derives state
    // eviction from the watermarks + the time-range condition (each side
    // keeps ~90 min of events per user, not the whole history), the
    // canonical bounded stream-stream join. Inner join output is the
    // deterministic matched-pair SET regardless of how AvailableNow
    // batches the backlog (outer variants would need the watermark to
    // advance past eviction to emit unmatched rows — not guaranteed in a
    // finite run, so inner is the honest choice here). The range condition
    // stays on the watermarked TIMESTAMP columns (required for state
    // eviction analysis); the oracle mirrors it in epoch_us arithmetic.
    "q85_stream_stream_join" -> ((s, d) => withStreamSession(s, 4) { ss =>
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      def src = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .transform(Tables.normalizeEventsTs)
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      val name = "graft_stream_stream"
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(name).groupBy("p_id")
        .agg(count(lit(1)).as("n_clicks"))
        .select(col("p_id").as("event_id"), col("n_clicks"))
        .orderBy("event_id")
    }),

    // JSON column: parse props ({"k": int}) with a JSON path, aggregate.
    "q82_json_props" -> ((s, d) =>
      ld(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type").agg(
          sum("k").as("sk"), count("k").as("nk"),
          max("k").as("max_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
        // integer-exact half-up rounding of the int-sum quotient: an avg of
        // ints can land exactly on a .xxxx5 boundary (sum 1, count 32 →
        // 0.03125), where round(double,4) splits across engines (q70 class)
        .selectExpr("event_type",
          "CAST((2 * sk * 10000 + nk) DIV (2 * nk) AS DOUBLE) / 10000 AS avg_k",
          "max_k", "n_high")
        .orderBy("event_type")),

    // INTERVAL-OVERLAP self-join via a time-grid bucket equi-join — the
    // scalable range-join recipe Spark lacks natively (q49 covers ASOF;
    // this is the symmetric-overlap case: "which activity intervals of the
    // same user overlap?"). Naive overlap is a per-user theta-join (BNLJ,
    // quadratic per user); instead each interval [s, e] (event start +
    // `value` minutes) explodes to the 6-hour grid cells it spans (≤ 3
    // cells: max duration 490 min), pairs equi-join on (user_id, cell) —
    // a keyed shuffle bounded by per-cell occupancy — and each surviving
    // pair is emitted EXACTLY ONCE with no distinct(): only in the cell
    // containing max(s_a, s_b), the unique first cell both intervals
    // occupy (both contain that instant, and neither occupies an earlier
    // shared cell since one interval starts in this one). Epochs stay in
    // integral microseconds (unix_micros ↔ epoch_us, the q103 recipe) and
    // cell ids use integer DIV, so both engines cut identically; the
    // oracle is the plain quadratic range join — same semantics, different
    // algorithm. At 100 TB the grid width trades fan-out (cells per
    // interval) against cell occupancy (join fan-out) — sized so typical
    // intervals span ~1-2 cells; heavy users are still bounded by the
    // per-(user, cell) product, the quantity to salt if one user dominates.
    "q132_interval_join" -> ((s, d) => {
      val g = 21600000000L // 6 h in micros
      val iv = ld(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("s0"), col("value"))
        .withColumn("e0",
          col("s0") + floor(col("value") * 60).cast("long") * 1000000L)
        .drop("value")
      val cells = iv.withColumn("cell",
        explode(sequence(expr(s"s0 DIV ${g}L"), expr(s"e0 DIV ${g}L"))))
      cells.as("a").join(cells.as("b").hint("shuffle_hash"),
          col("a.user_id") === col("b.user_id") &&
            col("a.cell") === col("b.cell") &&
            col("a.event_id") < col("b.event_id") &&
            col("a.s0") <= col("b.e0") && col("b.s0") <= col("a.e0") &&
            col("a.cell") ===
              expr(s"greatest(a.s0, b.s0) DIV ${g}L"))
        .select(col("a.event_id").as("ea"), col("b.event_id").as("eb"),
          col("a.user_id").as("user_id"),
          expr("(least(a.e0, b.e0) - greatest(a.s0, b.s0)) DIV 1000000")
            .as("overlap_s"))
        .orderBy("ea", "eb")
    }),

    // ORDERED FUNNEL (view → click → purchase): per user, the first view,
    // the first click AT OR AFTER that view, and the first purchase at or
    // after that click — the product-analytics staple that needs event
    // ORDER, not just presence (a user who purchases before ever viewing
    // does not convert). Three stage aggregates all keyed on user_id, so
    // the plan reuses ONE hash partitioning across every stage (no
    // re-shuffle between stages at 100 TB — stage k's frame is one min()
    // over the co-partitioned join of stage k−1 with the typed slice);
    // left joins keep non-converting users with NULL stage times. Epochs
    // in integral micros (unix_micros ↔ epoch_us), so gaps are exact.
    "q137_funnel" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t_view"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("us") >= col("t_view"))
        .groupBy("user_id").agg(min("us").as("t_click"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("us") >= col("t_click"))
        .groupBy("user_id").agg(min("us").as("t_purchase"))
      t1.join(t2, Seq("user_id"), "left")
        .join(t3, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (col("t_click") - col("t_view")).as("view_to_click_us"),
          (col("t_purchase") - col("t_click")).as("click_to_purchase_us"))
        .orderBy("user_id")
    }),

    // COHORT RETENTION: users grouped by first-activity day, activity
    // counted per (cohort, day-offset) cell — the retention-matrix query
    // behind every engagement dashboard. Two keyed shuffles total: the
    // first-day aggregate and the join back ride the SAME user_id
    // partitioning; the cell aggregate shuffles on (cohort, offset) whose
    // cardinality is days² — tiny forever, no skew concern. countDistinct
    // dedups a user's multiple same-day events inside the aggregate
    // (partial distinct map-side) rather than with a separate distinct
    // pass.
    "q138_cohort" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // TOUCH ATTRIBUTION — which earlier view gets credit for each
    // purchase? The assignment table both classic models read: FIRST-
    // touch (the view that opened the journey) and LAST-touch (the view
    // immediately preceding conversion), resolved in ONE user_id-keyed
    // window pass — first()/last() with ignoreNulls over a strictly-
    // preceding frame (rows BETWEEN unbounded AND 1 PRECEDING, so a
    // purchase never attributes to itself or to later views; purchases
    // with no prior view keep NULL attribution — the left-edge case a
    // real report must surface, not drop). Revenue in exact BIGINT
    // cents. Beside q137 (aggregate funnel timings) this is the per-
    // conversion assignment feed. One corpus shuffle (the user window);
    // at 100 TB identical — attribution never joins, it carries forward.
    "q162_attribution" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
            .as("cents"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("first_view",
          first(when(col("event_type") === "view", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("last_view",
          last(when(col("event_type") === "view", col("event_id")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("cents"), col("first_view"), col("last_view"))
        .orderBy("purchase_id")
    }),

    // Bot / automation detection by inter-event regularity: humans are
    // bursty, schedulers are metronomes — a crawler firing every N
    // seconds has near-zero variance in its gap distribution, and THIS
    // is the signal crawl-corpus curation uses to drop machine traffic
    // before training. Per user: consecutive-event gaps (one user_id
    // window, q103's deterministic (us, event_id) ordering), then the
    // squared-CV test kept EXACT by clearing denominators — CV < 0.5 ⟺
    // 4·n·Σd² < 5·(Σd)², all BIGINT (gaps floored to whole seconds keep
    // Σd² ≪ 2⁶³ up to ~10⁶ events/user). One shuffle on user_id, the
    // verdict is a per-user aggregate — at 100 TB this rides the same
    // partitioning every other per-user pass uses.
    "q175_bot_regularity" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"),
        col("event_id"))
      ld(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag("us", 1).over(w))
        .filter(col("prev").isNotNull)
        .selectExpr("user_id", "(us - prev) DIV 1000000 AS gap_s")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("sum_gap"),
          sum(expr("gap_s * gap_s")).as("sumsq_gap"))
        .select(col("user_id"), col("n_gaps"), col("sum_gap"),
          col("sumsq_gap"),
          (col("n_gaps") >= 5 && col("sum_gap") > 0 &&
            lit(4) * col("n_gaps") * col("sumsq_gap") <
              lit(5) * col("sum_gap") * col("sum_gap")).as("is_regular"))
        .orderBy("user_id")
    }),

    // transformWithState — Spark 4's arbitrary-stateful-processing API
    // (the successor to q78's mapGroupsWithState): state lives in NAMED,
    // individually-typed handles (ValueState/ListState/MapState) created
    // through a StatefulProcessor lifecycle, with per-state TTL and
    // timers — the shape long-running production pipelines need (q78's
    // single opaque state value can't expire one sub-state or add a new
    // one without a full state migration). Same determinism recipe as
    // q78: the per-user fold (count + max event id) is order-independent
    // and monotone, emitted per batch in update mode, rolled up by max —
    // so the result matches the batch oracle no matter how AvailableNow
    // splits the backlog. Runs on the cloned RocksDB-backed session like
    // every stateful demo here.
    "q186_transform_with_state" -> ((s, d) => withStreamSession(s, 8) { ss =>
      import ss.implicits._
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      val name = "graft_tws"
      val q = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .select(col("user_id"), col("event_id"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new UserFoldProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("user_id", "n", "max_event")
        .writeStream.outputMode("update").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(name).groupBy("user_id")
        .agg(max("n").as("n_events"), max("max_event").as("max_event"))
        .orderBy("user_id")
    }),

    // VARIANT (Spark 4's semi-structured type): nested JSON parsed ONCE
    // into the binary variant encoding, then typed-path extraction with
    // variant_get — the open-lakehouse answer to "schema-on-read without
    // re-parsing strings per access" (each get_json_object call re-parses
    // the full text; variant parses once and navigates offsets). The
    // nested document is synthesized in-plan from the event columns
    // (deterministic), so the oracle can verify the variant round-trip
    // against the SAME values computed directly from the columns —
    // proving extraction fidelity without relying on cross-engine JSON
    // text equality. All extracted fields are integers; aggregates are
    // exact BIGINT sums.
    "q187_variant_props" -> ((s, d) =>
      ld(s, d, "events")
        .selectExpr("event_type",
          "to_json(named_struct('k', CAST(get_json_object(props, '$.k')" +
            " AS INT), 'ids', array(event_id, user_id)," +
            " 'meta', named_struct('uid', user_id))) AS jdoc")
        .selectExpr("event_type", "parse_json(jdoc) AS v")
        .selectExpr("event_type",
          "variant_get(v, '$.k', 'int') AS k",
          "variant_get(v, '$.ids[0]', 'bigint') AS e0",
          "variant_get(v, '$.meta.uid', 'bigint') AS uid")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          max("e0").as("max_event"), sum("uid").as("sum_uid"))
        .orderBy("event_type")),

    // USER-HISTORY SEQUENCE PACKING — the behavioral-data twin of q139's
    // document packing: each user's event stream, in event-time order,
    // cut into fixed 16-event context windows and serialized as the
    // ordered event-type sequence a sequential model (SASRec-style
    // recommenders, session LLM fine-tuning) trains on. Everything rides
    // ONE user_id shuffle: the ordering window partitions by user_id,
    // and the (user_id, window_id) aggregate reuses that partitioning
    // (hash(user_id) already co-locates every (user_id, window_id) group
    // — Spark's subset rule, no second Exchange; the committed plan
    // pins it). Per-group state is ≤ 16 structs by construction, so the
    // collect_list is bounded — never a whole-history buffer. Ordering
    // is deterministic via the (ts, event_id) tiebreak (the q103
    // recipe); array_sort on (rn, type) structs makes the serialized
    // sequence order-exact on both engines.
    "q177_history_pack" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ld(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
        .withColumn("rn", row_number().over(w))
        .withColumn("window_id", expr("(rn - 1) DIV 16"))
        .groupBy("user_id", "window_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("t_start"), max("ts").as("t_end"),
          expr("array_join(transform(array_sort(collect_list(" +
            "struct(rn, event_type))), x -> x.event_type), '>')")
            .as("seq"))
        .orderBy("user_id", "window_id")
    }),

    // TIME-DECAY ENGAGEMENT (exact-float EWMA head): per event, the
    // decayed activity score over the user's last four events with
    // weights 1, ½, ¼, ⅛ — the recency feature every engagement model
    // consumes, computed so the DOUBLES are engine-bit-identical: the
    // three divisors are powers of two (an exponent decrement in IEEE
    // 754, never a rounding), and the sum is a FIXED-ASSOCIATION
    // expression tree (((v+l1)+l2)+l3 — both engines parse left-
    // associative), so there is no float-summation-order freedom at
    // all — the q70 drift lesson applied to a computation that is
    // inherently fractional instead of being pushed to integers. A
    // windowed SUM over lagged values would NOT have this property
    // (frame accumulation order is an engine choice); four explicit
    // lags do. Rides the family's ONE user_id Exchange; the (ts,
    // event_id) tiebreak makes the lag sequence deterministic.
    "q193_time_decay" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ld(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("decayed",
          col("value") +
            coalesce(lag("value", 1).over(w), lit(0.0)) / 2 +
            coalesce(lag("value", 2).over(w), lit(0.0)) / 4 +
            coalesce(lag("value", 3).over(w), lit(0.0)) / 8)
        .select("event_id", "user_id", "decayed")
        .orderBy("event_id")
    }),

    // A/B TEST verdict (two-proportion chi-square, the q170 posture
    // applied to the experiment readout): users split into arms by id
    // parity (the deterministic stand-in for assignment), per event type
    // the share of users who performed it, and the 2×2 chi-square
    // χ² = n·det²/(n0·n1·r·s) with det = c0·(n1−c1) − c1·(n0−c0) —
    // compared against the α=0.05 critical value 3.8416 ENTIRELY in
    // DECIMAL(38,0) cross-multiplication (10000·n·det² > 38416·n0·n1·r·s),
    // so the reject/accept verdict can never flip on a cross-engine
    // float boundary. Scale: one (user, type) distinct (map-side
    // combined), one user distinct for the arm totals broadcast as a
    // single row — the readout is two shuffles over the event log
    // regardless of corpus size; delta_bp is the half-up effect size the
    // dashboard shows beside the verdict.
    "q195_ab_chi2" -> ((s, d) => {
      val ev = ld(s, d, "events")
      val users = ev.select("user_id").distinct()
        .groupBy().agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"))
      val dec18 = (c: Column) => c.cast("decimal(18,0)")
      ev.select("user_id", "event_type").distinct()
        .groupBy("event_type").agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("c1"))
        .crossJoin(broadcast(users))
        .withColumn("det",
          expr("c0 * (n1 - c1) - c1 * (n0 - c0)"))
        .select(col("event_type"), col("n0"), col("c0"), col("n1"),
          col("c1"),
          expr("(2 * c1 * 10000 + n1) DIV (2 * n1)" +
            " - (2 * c0 * 10000 + n0) DIV (2 * n0)").as("delta_bp"),
          (dec18(lit(10000) * (col("n0") + col("n1"))) *
            dec18(col("det")) * dec18(col("det")) >
            dec18(lit(38416)) * dec18(col("n0") * col("n1")) *
              dec18((col("c0") + col("c1")) *
                ((col("n0") - col("c0")) + (col("n1") - col("c1")))))
            .as("reject_h0"))
        .orderBy("event_type")
    }),

    // STREAMING session windows — the dynamic-gap rung of the streaming
    // family (q74's fixed windows merge state by key+window; session
    // windows must MERGE ADJACENT STATE RANGES as late events bridge two
    // sessions — the hard part Spark's session_window state store does
    // natively). Complete output mode: every trigger re-emits the full
    // session table, so the AvailableNow batch-replay equals q75's batch
    // sessionization exactly — which is the oracle (append mode would
    // hold back any session the final watermark hasn't sealed, silently
    // dropping the corpus tail; a correctness trap this query documents
    // by NOT using it). Money in exact cents: microbatch boundaries
    // reorder float addition, integer cents don't care — the q74 stance.
    "q205_stream_session_window" -> ((s, d) =>
      withStreamSession(s, 8) { ss =>
        val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
        val name = "graft_stream_sessw"
        val q = ss.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(d)
          .transform(graft.Tables.normalizeEventsTs)
          .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
              .as("cents"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        ss.table(name)
          .select(col("user_id"), col("sw.start").as("sess_start"),
            col("n_events"),
            (col("cents").cast("double") / 100).as("tot_value"))
          .orderBy("user_id", "sess_start")
      }),

    // Watermark-lateness audit — the measurement that DECIDES the
    // `withWatermark` delay q74/q75/q205 hardcode: how far behind the
    // maximum event-time already seen (in ARRIVAL order, proxied by the
    // monotonic ingest id) does each event land? "Running max over
    // arrival order" is a global prefix scan, so it runs as the two-stage
    // distributed pattern (the q209 cumsum, in max form): per-4096-block
    // maxima (map-side), a tiny block-offset window, then the fine
    // running max PARTITIONED by block — no corpus-sized single-partition
    // window. Lateness lands in log2 buckets (length of the binary
    // string — exact, no float log) with per-bucket counts and maxima:
    // read the bucket where the tail mass ends, that is the watermark.
    // On this fixture ingest order equals event-time order, so the whole
    // corpus lands in bucket 0 — i.e. the audit (correctly) certifies a
    // zero-delay watermark and, as a test, that the running max raises
    // no FALSE lateness on ordered data.
    "q222_watermark_audit" -> ((s, d) => {
      val e = ld(s, d, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("blk", expr("event_id DIV 4096"))
        .localCheckpoint() // block maxima + fine pass share one read
      val blk = e.groupBy("blk").agg(max("us").as("bmax"))
        .withColumn("pmax", max("bmax").over(Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)))
        .select("blk", "pmax")
      val wIn = Window.partitionBy("blk").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.join(broadcast(blk), "blk")
        .withColumn("inmax", max("us").over(wIn))
        // greatest() skips nulls, so `seen` is null only for the very
        // first arrival — handled by the CASE (a MinValue sentinel would
        // overflow the ANSI subtraction)
        .withColumn("seen", greatest(col("pmax"), col("inmax")))
        .withColumn("late_s",
          expr("CASE WHEN seen IS NULL OR seen <= us THEN 0L" +
            " ELSE (seen - us) DIV 1000000 END"))
        .withColumn("bkt", when(col("late_s") === 0, lit(0))
          .otherwise(length(bin(col("late_s")))).cast("long"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n"), max("late_s").as("max_late_s"))
        .orderBy("bkt")
    }),

    // Session-gap calibration — the empirical basis for q71/q75/q205's
    // 30-minute timeout: the distribution of consecutive same-user
    // inter-event gaps, log2-bucketed with an exact cumulative share.
    // The right cut sits where the cumulative curve plateaus (the
    // bimodal within-session/between-session valley); shipping a timeout
    // without this histogram is guessing. One user_id-keyed window for
    // the lag (the same single Exchange every session query rides), a
    // ~40-row bucket rollup, and the total arrives as a 1-row broadcast.
    "q223_session_gap_calibration" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = ld(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev", lag("us", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(expr("(us - prev) DIV 1000000").as("gap_s"))
        .localCheckpoint() // histogram + total share one derivation
      gaps
        .withColumn("bkt", when(col("gap_s") <= 0, lit(0))
          .otherwise(length(bin(col("gap_s")))).cast("long"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_gaps"), max("gap_s").as("max_gap_s"))
        .withColumn("cum", sum("n_gaps").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(gaps.agg(count(lit(1)).as("tot"))))
        .selectExpr("bkt", "n_gaps", "max_gap_s",
          "(2 * cum * 10000 + tot) DIV (2 * tot) AS cum_share_bp")
        .orderBy("bkt")
    }),

    // Time-series gap filling — the densification every downstream
    // forecaster/anomaly detector needs before it can tell "no events"
    // from "no row": per event_type, the full hourly grid between first
    // and last activity is GENERATED (sequence over a timestamp range —
    // a per-group map-side explode of bounds, never a calendar table
    // scan), left-joined against the observed hourly counts, zero-filled.
    // The audit reports dense-grid size, silent hours, and the LONGEST
    // silent run — islands found with the classic rownumber-vs-index
    // difference trick (hour_index − zero_rank is constant within a run),
    // all integer, windows partitioned by event_type. The observed counts
    // are pinned once: bounds, grid join, and totals all read the same
    // materialized frame.
    "q226_gapfill_series" -> ((s, d) => {
      val hr = ld(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val bounds = hr.groupBy("event_type")
        .agg(min("hr").as("lo"), max("hr").as("hi"))
      val grid = bounds.select(col("event_type"), col("lo"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))
      val dense = grid.join(hr, Seq("event_type", "hr"), "left")
        .na.fill(0L, Seq("n"))
        .withColumn("hidx",
          expr("(unix_micros(hr) - unix_micros(lo)) DIV 3600000000"))
      val wz = Window.partitionBy("event_type").orderBy("hidx")
      val runs = dense.filter(col("n") === 0)
        .withColumn("isl", col("hidx") - row_number().over(wz))
        .groupBy("event_type", "isl").agg(count(lit(1)).as("run_h"))
        .groupBy("event_type").agg(max("run_h").as("longest_gap_h"))
      dense.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_gap_hours"),
          sum("n").as("n_events"))
        .join(runs, Seq("event_type"), "left")
        .na.fill(0L, Seq("longest_gap_h"))
        .orderBy("event_type")
    }),

    // Seasonal-baseline anomaly detection: each (event_type, hour-of-day)
    // stratum gets its EXACT median hourly count by rank selection (the
    // q87 recipe — a stratum-partitioned window picking rank ⌈n/2⌉,
    // never a value-buffering percentile aggregate), and an observed
    // hour is anomalous when it runs ≥ 50 % above its own stratum's
    // median (integer rule n·10 ≥ med·15 — hour-of-day seasonality makes
    // a single global threshold either blind at peak hours or noisy at
    // quiet ones, which is the point of stratifying). Per-type report:
    // hours checked, anomalous hours, and the peak ratio vs baseline in
    // half-up bp. One hourly rollup shuffle + one 24-way stratum window
    // riding it; medians join back BROADCAST (|types|·24 rows).
    "q228_seasonal_anomaly" -> ((s, d) => {
      val hr = ld(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .withColumn("hod", hour(col("hr")))
        .localCheckpoint() // medians + flags share one rollup
      val wS = Window.partitionBy("event_type", "hod").orderBy("n", "hr")
      val med = hr
        .withColumn("rn", row_number().over(wS))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy("event_type", "hod")))
        .filter(col("rn") === expr("(cnt + 1) DIV 2"))
        .select(col("event_type"), col("hod"), col("n").as("med"))
      hr.join(broadcast(med), Seq("event_type", "hod"))
        .selectExpr("event_type", "n", "med",
          "CASE WHEN n * 10 >= med * 15 THEN 1L ELSE 0L END AS anom",
          "(2 * n * 10000 + med) DIV (2 * med) AS ratio_bp")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"), sum("anom").as("n_anomalous"),
          max("ratio_bp").as("peak_ratio_bp"))
        .orderBy("event_type")
    }),

    // Markov-order test: is the event stream first-order Markov? Compare
    // each OBSERVED 2-step transition share P(c | a, ·, 2 steps) against
    // the CHAINED prediction Σ_b P(b|a)·P(c|b) — a large gap means state
    // 'a' carries memory beyond one step (so a first-order simulator /
    // sampler of this stream would be wrong, the thing to know before
    // generating synthetic sessions from q149's matrix). lag(1) and
    // lag(2) ride ONE user-keyed window pass (same shuffle, same sort —
    // the bigram and trigram frames are two rollups of one scan); the
    // transition matrices are |types|²-sized, so the chain product
    // Σ_b p1(a,b)·p1(b,c) is a broadcast self-join. Probabilities are
    // half-up micro-unit integers and the product term re-quantizes
    // half-up once per b — both engines run the identical quantization,
    // so the comparison is bit-exact (documented: pred is the quantized
    // chain, within ±|types| micro of the true rational).
    "q232_markov_order_test" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val lagged = ld(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("c"))
        .withColumn("b", lag("c", 1).over(w))
        .withColumn("a", lag("c", 2).over(w))
        .localCheckpoint() // bigram + trigram frames share one window pass
      val p1 = lagged.filter(col("b").isNotNull)
        .groupBy(col("b").as("from"), col("c").as("to"))
        .agg(count(lit(1)).as("n1"))
        .withColumn("tot1",
          sum("n1").over(Window.partitionBy("from")))
        .selectExpr("from", "to",
          "(2 * n1 * 1000000 + tot1) DIV (2 * tot1) AS p1_micro")
      val pred = p1.select(col("from").as("a"), col("to").as("b"),
          col("p1_micro").as("pab"))
        .join(broadcast(p1.select(col("from").as("b"),
          col("to").as("c"), col("p1_micro").as("pbc"))), "b")
        .selectExpr("a", "c",
          "(2 * pab * pbc + 1000000) DIV 2000000 AS term")
        .groupBy("a", "c").agg(sum("term").as("pred_micro"))
      val obs = lagged.filter(col("a").isNotNull)
        .groupBy("a", "c").agg(count(lit(1)).as("n2"))
        .withColumn("tot2", sum("n2").over(Window.partitionBy("a")))
        .selectExpr("a", "c", "n2",
          "(2 * n2 * 1000000 + tot2) DIV (2 * tot2) AS obs_micro")
      // |types|²-sized frames on both sides; full-outer can't broadcast,
      // and at this size the SMJ exchange is a few hundred bytes.
      obs.join(pred, Seq("a", "c"), "full_outer")
        .na.fill(0L, Seq("n2", "obs_micro", "pred_micro"))
        .withColumn("gap_micro", abs(col("obs_micro") - col("pred_micro")))
        .select("a", "c", "n2", "obs_micro", "pred_micro", "gap_micro")
        .orderBy("a", "c")
    }),

    // CUSUM drift detection over hourly event rates — the changepoint
    // monitor that catches a SUSTAINED small shift (a new client version
    // slowly ramping, a logger duplicating 10 % of traffic) that q228's
    // per-hour threshold never fires on. Classic one-sided CUSUM
    // S_t = max(0, S_{t-1} + (x_t − μ)) is a nonlinear recursion — not a
    // window aggregate — but it EQUALS prefix_t − min(0, min_{j≤t}
    // prefix_j), so it runs as two cumulative windows over one
    // type-keyed shuffle (the identity that makes CUSUM distributable;
    // a 100 TB stream needs only per-type ordered scans, no recursion).
    // μ is each type's own first-24-scored-hours mean, kept RATIONAL by
    // scaling deviations by n24 (dev = x·n24 − sum24 — exact integers,
    // no float mean), so S is in events·n24 units and the threshold
    // h = 3·sum24 reads "three first-day-mean-hours of cumulative
    // excess". Report: scored hours, flagged hours, peak S, first
    // breach hour (null when the type never drifts).
    "q235_cusum_drift" -> ((s, d) => {
      val hr = ld(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("x"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("hr")))
        .localCheckpoint() // baseline + scored hours share one rollup
      val base = hr.filter(col("rn") <= 24)
        .groupBy("event_type")
        .agg(sum("x").as("sum24"), count(lit(1)).as("n24"))
      val wC = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
      hr.filter(col("rn") > 24)
        .join(broadcast(base), "event_type")
        .withColumn("dev", col("x") * col("n24") - col("sum24"))
        .withColumn("prefix", sum("dev").over(wC))
        .withColumn("s",
          col("prefix") - least(lit(0L), min("prefix").over(wC)))
        .withColumn("flag", (col("s") >= lit(3) * col("sum24")).cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_scored"), sum("flag").as("n_flagged"),
          max("s").as("peak_s"),
          min(when(col("flag") === 1, col("hr"))).as("first_breach_hr"))
        .orderBy("event_type")
    }),

    // Join-size estimation from count-min sketches — the planner-side
    // question ("how big is A ⋈ B on user_id?") answered WITHOUT running
    // the join: the inner product of two CM sketches (q148's structure,
    // widened to d=4×w=1024, same md5 family) upper-bounds
    // Σ_k ca(k)·cb(k) (Cormode
    // & Muthukrishnan '05, §4.2), and min-over-rows tightens it. The two
    // sides here are the odd/even event_id halves of the stream; the
    // EXACT size (one key-keyed count join) is computed alongside so the
    // estimator's overshoot is measured, not assumed — at 100 TB only
    // the exact branch grows, while the sketches stay 2·4096 cells no
    // matter the input (that asymmetry is why real optimizers carry
    // sketches, not samples, for join cardinality). Integer-exact end
    // to end: est ≥ exact always, over_bp is the half-up overshoot.
    "q237_join_size_estimate" -> ((s, d) => {
      def cell(i: Int) =
        s"CAST(conv(substring(md5(concat('$i:'," +
          s" CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1024"
      val cnt = ld(s, d, "events")
        .select(col("user_id"), (col("event_id") % 2).as("side"))
        .groupBy("side", "user_id").agg(count(lit(1)).as("c"))
        .selectExpr(Seq("side", "user_id", "c") ++
          (0 until 4).map(i => s"${cell(i)} AS cell$i"): _*)
        .localCheckpoint() // exact branch + both sketches share one agg
      val exact = cnt.filter(col("side") === 0)
        .select(col("user_id"), col("c").as("ca"))
        .join(cnt.filter(col("side") === 1)
          .select(col("user_id"), col("c").as("cb")), "user_id")
        .agg(sum(expr("ca * cb")).as("exact_size"))
      val sk = cnt.selectExpr("side",
          "stack(4, 0, cell0, 1, cell1, 2, cell2, 3, cell3) AS (row, cell)",
          "c")
        .groupBy("side", "row", "cell").agg(sum("c").as("v"))
        .localCheckpoint()
      val ip = sk.filter(col("side") === 0)
        .select(col("row"), col("cell"), col("v").as("va"))
        .join(sk.filter(col("side") === 1)
          .select(col("row"), col("cell"), col("v").as("vb")),
          Seq("row", "cell"))
        .groupBy("row").agg(sum(expr("va * vb")).as("ip"))
      ip.agg(min("ip").as("est")).crossJoin(broadcast(exact))
        .selectExpr("exact_size", "est",
          "(2 * (est - exact_size) * 10000 + exact_size)" +
            " DIV (2 * exact_size) AS over_bp")
    }),

    // Benford leading-digit audit over transaction amounts — the
    // fabricated-data screen a fleet runs on ingested numeric feeds:
    // observed first-significant-digit shares vs Benford's log10(1+1/d)
    // expectation (hardcoded in half-up bp — the logs are irrational, so
    // the CONSTANTS are the contract, never engine libm). Amounts go
    // through the exact q70 cents cast; the leading digit is integer
    // division by 10^(digits−1) (string length of a BIGINT — no float
    // log10, whose boundary behavior at exact powers of ten differs by
    // ulp). One digit-keyed rollup (9 groups, map-side combined), total
    // broadcast back. A uniform synthetic feed FAILS this audit loudly —
    // which is precisely the point of shipping the expected column.
    "q231_benford_digits" -> ((s, d) => {
      val exp = "array(3010, 1761, 1249, 969, 792, 669, 580, 512, 458)"
      val cents = ld(s, d, "events")
        .select(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"))
        .filter(col("cents") > 0)
        .select(expr("cents DIV CAST(power(10," +
          " length(CAST(cents AS STRING)) - 1) AS BIGINT)").as("digit"))
      val tot = cents.agg(count(lit(1)).as("nn"))
      cents.groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .selectExpr("digit", "n",
          "(2 * n * 10000 + nn) DIV (2 * nn) AS obs_bp",
          s"CAST(element_at($exp, CAST(digit AS INT)) AS BIGINT)" +
            " AS benford_bp")
        .withColumn("gap_bp", abs(col("obs_bp") - col("benford_bp")))
        .orderBy("digit")
    }),

    // Peak-concurrency sweep line — the capacity question ("how many
    // sessions were open AT ONCE, and when?") that no per-session or
    // per-hour rollup answers: sessions (q71's exact 30-min boundary)
    // become +1/−1 boundary events, and concurrency is their running
    // sum. Ends subtract AFTER starts add at the same microsecond (a
    // session ending exactly when another begins overlaps it), encoded
    // order-free: group boundaries BY timestamp first, then
    // peak_at(t) = cumulative_net(≤t) + n_end(t) — no row-order inside
    // a timestamp ever matters, so the sweep is parallel-safe. The
    // cumulative sum itself is TWO-LEVEL (the 100 TB shape: an
    // unpartitioned ordered window over every boundary would serialize
    // the whole stream through one task): intra-day running sums ride a
    // day-partitioned window, and only the #days-sized day-total frame
    // takes the single-partition prefix window before broadcasting
    // back. Output: total sessions, the peak, and the first instant it
    // was reached.
    "q248_concurrency_sweep" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = ld(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          col("us") - col("prev_us") >= 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "sess_id")
        .agg(min("us").as("a"), max("us").as("b"))
        .localCheckpoint() // boundaries + session total share one pass
      val bd = sess
        .selectExpr("stack(2, a, 1L, b, 0L) AS (us, st)")
        .groupBy("us")
        .agg(sum("st").as("n_start"),
          sum(lit(1L) - col("st")).as("n_end"))
        .withColumn("day", expr("us DIV 86400000000"))
      val wD = Window.partitionBy("day").orderBy("us")
        .rowsBetween(Window.unboundedPreceding, 0)
      val intra = bd.withColumn("cum_d",
        sum(col("n_start") - col("n_end")).over(wD))
      val dayTot = bd.groupBy("day")
        .agg(sum(col("n_start") - col("n_end")).as("net"))
        // #days rows: the only unpartitioned ordered window, by design
        .withColumn("prefix", coalesce(sum("net").over(
          Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("day", "prefix")
      val peaks = intra.join(broadcast(dayTot), "day")
        .select(col("us"),
          (col("prefix") + col("cum_d") + col("n_end")).as("peak"))
        .localCheckpoint() // max + argmax share the sweep
      val mx = peaks.agg(max("peak").as("peak_n"))
      peaks.crossJoin(broadcast(mx)).filter(col("peak") === col("peak_n"))
        .agg(min("us").as("peak_us"))
        .crossJoin(broadcast(mx))
        .crossJoin(broadcast(sess.agg(count(lit(1)).as("n_sessions"))))
        .select(col("n_sessions"), col("peak_n"),
          timestamp_micros(col("peak_us")).as("peak_ts"))
    }),

    // Sequence-motif detection — the MATCH_RECOGNIZE surrogate: each
    // session (q71's exact boundary) is rendered as an ordered string
    // of event-type initials and matched against a regex motif
    // ('vc.*p': a view immediately followed by a click, with a purchase
    // any time later) — the pattern family funnel counting (q137) can't
    // express, because funnels test subsequence containment while a
    // regex pins ADJACENCY and repetition. Ordering inside the
    // aggregate is total and explicit (sort_array over (us, event_id)
    // structs — collect_list alone is partition-order nondeterministic,
    // the q39 lesson), so the per-session string is bit-identical in
    // both engines. Scale shape: ONE user_id shuffle; the string is
    // bounded by the session (inactivity-capped), and the regex runs
    // map-side per session row — no joins, no windows after the rollup.
    "q252_sequence_motif" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ld(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          col("us") - col("prev_us") >= 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(run))
        .withColumn("ini", substring(col("event_type"), 1, 1))
        .groupBy("user_id", "sess_id")
        .agg(expr("array_join(transform(sort_array(collect_list(" +
          "struct(us, event_id, ini))), x -> x.ini), '')").as("seq"))
        .withColumn("hit",
          when(col("seq").rlike("vc.*p"), 1L).otherwise(0L))
        .agg(count(lit(1)).as("n_sessions"), sum("hit").as("n_matched"))
        .selectExpr("n_sessions", "n_matched",
          "(2 * n_matched * 10000 + n_sessions) DIV (2 * n_sessions)" +
            " AS match_bp")
    }),

    // Debounce — the burst-collapse cleaner every click/telemetry feed
    // needs before counting anything: a double-fire (rage click, retry
    // storm, duplicated sensor tick) lands as near-simultaneous
    // same-(user, type) events, and only the FIRST of each burst is the
    // real signal. Burst boundary = gap ≥ 1 s from the previous event
    // of the same (user_id, event_type) — the q71 sessionize recipe at
    // a tighter key and threshold, so one keyed window pass marks burst
    // heads and everything else collapses. Report per event type: raw
    // rows, kept heads, and the collapse rate in half-up bp — the
    // number that says HOW noisy each instrument is. Scale: one
    // (user, type) shuffle, map-side flagging, one rollup; no joins.
    "q263_debounce" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      ld(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("head", when(col("prev_us").isNull ||
          col("us") - col("prev_us") >= 1000000L, 1L).otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_raw"), sum("head").as("n_kept"))
        .selectExpr("event_type", "n_raw", "n_kept",
          "(2 * (n_raw - n_kept) * 10000 + n_raw) DIV (2 * n_raw)" +
            " AS collapsed_bp")
        .orderBy("event_type")
    }),

    // FORWARD as-of join — q49 looks backward (the last click at or
    // before each purchase); this looks forward (the FIRST error at or
    // after each purchase: the time-to-failure clock every reliability
    // dashboard runs). Implemented as min-over-following-frame: in
    // (ts, is_e, event_id) order the frame CURRENT ROW → UNBOUNDED
    // FOLLOWING sees exactly the at-or-after rows (purchases sort
    // before errors at an equal timestamp, so an equal-ts error IS
    // visible — the >= contract), and min() skips the non-error NULLs
    // natively, no IGNORE NULLS dialect needed. One user-keyed window
    // pass over the two filtered event types; no join at all.
    "q270_forward_asof" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_e"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ld(s, d, "events")
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("event_type") === "error").cast("int").as("is_e"))
        .withColumn("next_err_ts",
          min(when(col("is_e") === 1, col("ts"))).over(w))
        .filter(col("is_e") === 0)
        .select(col("event_id"), col("user_id"), col("next_err_ts"),
          (unix_micros(col("next_err_ts")) - unix_micros(col("ts")))
            .as("gap_us"))
        .orderBy("event_id")
    }),

    // Conversion latency — the funnel's MISSING number: q137 counts who
    // converts, this measures HOW LONG conversion takes (first view →
    // first purchase strictly after it, per user), with the median and
    // p90 picked EXACTLY by rank selection over the converted cohort
    // (the q87 recipe — never a value-buffering percentile aggregate).
    // One user-keyed rollup finds both firsts (min + conditional min in
    // the same pass); the latency frame is cohort-sized, so its rank
    // window is cheap at any corpus scale. Output: cohort sizes,
    // conversion share, exact median / p90 latency in seconds.
    "q272_conversion_latency" -> ((s, d) => {
      val firsts = ld(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("us")))
            .as("v_us"),
          min(when(col("event_type") === "purchase", col("us")))
            .as("p_us"))
        .filter(col("v_us").isNotNull)
        .localCheckpoint() // totals + latency ranks share one rollup
      val lat = firsts
        .filter(col("p_us").isNotNull && col("p_us") > col("v_us"))
        .select(expr("(p_us - v_us) DIV 1000000").as("lat_s"))
        .withColumn("rn", row_number().over(
          Window.orderBy("lat_s"))) // cohort-sized frame, by design
        .localCheckpoint()
      val nn = lat.agg(count(lit(1)).as("nc"))
      val med = lat.crossJoin(broadcast(nn))
        .filter(col("rn") === expr("(nc + 1) DIV 2"))
        .select(col("lat_s").as("median_lat_s"))
      val p90 = lat.crossJoin(broadcast(nn))
        .filter(col("rn") === expr("(9 * nc + 9) DIV 10"))
        .select(col("lat_s").as("p90_lat_s"))
      firsts.agg(count(lit(1)).as("n_viewers"),
          sum(when(col("p_us").isNotNull && col("p_us") > col("v_us"), 1L)
            .otherwise(0L)).as("n_converted"))
        .crossJoin(broadcast(med)).crossJoin(broadcast(p90))
        .selectExpr("n_viewers", "n_converted",
          "(2 * n_converted * 10000 + n_viewers) DIV (2 * n_viewers)" +
            " AS conv_bp",
          "median_lat_s", "p90_lat_s")
    }),

    // Rolling 24-hour active users — the DAU curve computed EXACTLY
    // (no HLL): a user is active at hour t iff they have an event in
    // [t−23, t], so each user's presence hours expand to coverage
    // intervals [h, h+23], per-user episodes merge when presence gaps
    // stay ≤ 23 h (one user-keyed window pass — the q71 boundary recipe
    // with the threshold recast as coverage adjacency), and the hourly
    // active count is q248's +1/−1 boundary sweep over episode
    // [start, end+1) intervals — grouped by timestamp first, two-level
    // day-partitioned cumulative sum, nothing ever serializes. Output:
    // cohort shape + the peak (max concurrent active users, first hour
    // it is reached) — the capacity number, exact.
    "q273_rolling_active_users" -> ((s, d) => {
      val wU = Window.partitionBy("user_id").orderBy("h")
      val eps = ld(s, d, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 3600000000").as("h"))
        .distinct()
        .withColumn("prev_h", lag("h", 1).over(wU))
        .withColumn("brk", when(col("prev_h").isNull ||
          col("h") - col("prev_h") > 23, 1).otherwise(0))
        .withColumn("ep", sum("brk").over(
          wU.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "ep")
        .agg(min("h").as("a"), (max("h") + 23).as("b"))
        .localCheckpoint() // sweep + episode stats share one derivation
      val bd = eps.selectExpr("stack(2, a, 1L, b + 1, -1L) AS (h, dl)")
        .groupBy("h").agg(sum("dl").as("net"))
        .withColumn("day", expr("h DIV 24"))
      val wD = Window.partitionBy("day").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
      val dayTot = bd.groupBy("day").agg(sum("net").as("dnet"))
        .withColumn("prefix", coalesce(sum("dnet").over(
          Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("day", "prefix")
      val lvl = bd.withColumn("cum", sum("net").over(wD))
        .join(broadcast(dayTot), "day")
        // at-hour active = everything through this hour's starts; ends
        // at h+1 subtract AFTER the hour, encoded by the +1 boundary
        .select(col("h"), (col("prefix") + col("cum")).as("active"))
        .localCheckpoint() // max + argmax share the sweep
      val mx = lvl.agg(max("active").as("peak_active"))
      lvl.crossJoin(broadcast(mx))
        .filter(col("active") === col("peak_active"))
        .agg(min("h").as("peak_h"))
        .crossJoin(broadcast(mx))
        .crossJoin(broadcast(eps.agg(
          countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_episodes"),
          sum(col("b") - col("a") + 1).as("user_hours"))))
        .select(col("n_users"), col("n_episodes"), col("user_hours"),
          col("peak_active"), timestamp_micros(col("peak_h") *
            3600000000L).as("peak_hr"))
    }),

    // SQL PIVOT clause surface — q72 builds the hourly event-type
    // matrix through the DataFrame pivot API; this is the identical
    // contract expressed in pure SQL (FROM ... PIVOT (agg FOR col IN
    // (...))), the form a SQL-only consumer writes. Same plan family
    // (one hourly rollup, no joins); absent cells surface as NULL from
    // the clause and are zero-coalesced explicitly so the output matches
    // q72's filled matrix bit-for-bit.
    "q274_sql_pivot" -> ((s, d) => {
      Tables.view(s, d, "events")
      s.sql("""SELECT hr,
                      coalesce(n_click, 0L) AS n_click,
                      coalesce(n_error, 0L) AS n_error,
                      coalesce(n_purchase, 0L) AS n_purchase,
                      coalesce(n_signup, 0L) AS n_signup,
                      coalesce(n_view, 0L) AS n_view
               FROM (SELECT date_trunc('hour', ts) AS hr, event_type
                     FROM events)
               PIVOT (count(*) FOR event_type IN
                 ('click' AS n_click, 'error' AS n_error,
                  'purchase' AS n_purchase, 'signup' AS n_signup,
                  'view' AS n_view))
               ORDER BY hr""")
    }),

    // Hourly percentile BANDS — the p50/p90/p99 timeline every ops
    // dashboard draws, computed EXACTLY: within each hour's partition
    // one rank window picks all three order statistics (ranks ⌈n/2⌉,
    // ⌈9n/10⌉, ⌈99n/100⌉ — the q87 selection recipe, three targets from
    // ONE sort instead of three percentile aggregates buffering
    // values), values in exact BIGINT cents. Scale: hour-partitioned
    // window = keyed work; the rollup emits one row per hour. At
    // extreme per-hour cardinality you'd swap in q141's mergeable
    // sketch per hour and keep this as its audit.
    "q278_latency_percentiles" -> ((s, d) => {
      val w = Window.partitionBy("hr").orderBy("cents", "event_id")
      ld(s, d, "events")
        .select(date_trunc("hour", col("ts")).as("hr"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("hr")))
        .groupBy("hr")
        .agg(count(lit(1)).as("n"),
          sum(when(col("rk") === expr("(cnt + 1) DIV 2"), col("cents"))
            .otherwise(0L)).as("p50_c"),
          sum(when(col("rk") === expr("(9 * cnt + 9) DIV 10"),
            col("cents")).otherwise(0L)).as("p90_c"),
          sum(when(col("rk") === expr("(99 * cnt + 99) DIV 100"),
            col("cents")).otherwise(0L)).as("p99_c"))
        .orderBy("hr")
    }),

    // Weekly churn cohorts — the retention counterpart of q273's
    // rolling actives: a user churns in week w when present in w and
    // absent in w+1 (the final week is right-censored and excluded —
    // its users haven't had a week in which to return). Weeks are
    // epoch-based integer buckets (never calendar-week dialects, whose
    // start-of-week conventions differ). One distinct (user, week)
    // presence frame, one user-keyed lead window, one rollup — churn
    // for a 100 TB event log costs one shuffle on user_id and one on
    // week.
    "q280_churn_cohort" -> ((s, d) => {
      val pres = ld(s, d, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 604800000000").as("wk"))
        .distinct()
        .localCheckpoint() // lead pass + max week share the frame
      val mx = pres.agg(max("wk").as("maxwk"))
      pres
        .withColumn("next_wk", lead("wk", 1).over(
          Window.partitionBy("user_id").orderBy("wk")))
        .crossJoin(broadcast(mx))
        .filter(col("wk") < col("maxwk"))
        .withColumn("churned",
          when(col("next_wk").isNull || col("next_wk") > col("wk") + 1,
            1L).otherwise(0L))
        .groupBy("wk")
        .agg(count(lit(1)).as("n_active"), sum("churned").as("n_churned"))
        .selectExpr("wk", "n_active", "n_churned",
          "(2 * n_churned * 10000 + n_active) DIV (2 * n_active)" +
            " AS churn_bp")
        .orderBy("wk")
    }),

    // foreachBatch idempotent sink — the STREAMING half of q259's
    // exactly-once certification: Structured Streaming guarantees each
    // micro-batch a stable batchId across retries, and the sink
    // contract that makes the pipeline exactly-once is MERGE ON
    // batchId (replace the batch's slot, never +=). Here every batch's
    // per-type partial is deliberately delivered TWICE (the
    // at-least-once retry a task failure produces); the merged store
    // keyed on batchId absorbs the redelivery while the naive append
    // log double-counts — both are emitted so the output PROVES the
    // contract (n vs n_naive = 2n). The per-batch partial is
    // aggregated IN the stream and only the |types|-sized result
    // crosses the sink seam — exactly what a production foreachBatch
    // MERGE ships to its lakehouse table.
    "q281_stream_foreachbatch" -> ((s, d) => withStreamSession(s, 8) {
      ss =>
      import scala.jdk.CollectionConverters._
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      val merged = new java.util.concurrent.ConcurrentHashMap[
        java.lang.Long, Map[String, Long]]()
      val naive = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(String, Long)]())
      val q = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .transform(Tables.normalizeEventsTs)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          val part = df.groupBy("event_type").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          for (_ <- 1 to 2) { // the at-least-once redelivery
            merged.put(batchId, part) // MERGE: replace the batch slot
            part.foreach { case (k, v) => naive.add((k, v)) } // +=
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val m = merged.values.asScala.toSeq.flatten
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val nv = naive.asScala.toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      import ss.implicits._
      m.toSeq.sortBy(_._1)
        .map { case (t, n) => (t, n, nv(t)) }
        .toDF("event_type", "n", "n_naive")
        .orderBy("event_type")
    }),

    // NATIVE AS-OF JOIN — q49's semantics through the WHOLE-OPERATOR
    // extension seam: a custom logical node (graft.plans.AsOfJoin), a
    // planner strategy (injected here via experimental.extraStrategies;
    // GraftExtensions carries it for extension-built sessions), and a
    // physical AsOfJoinExec whose requiredChildDistribution/-Ordering
    // let EnsureRequirements place the key Exchanges and (key, time)
    // sorts — then ONE forward merge per partition with O(1) buffered
    // state (the SortMergeJoin streamed shape, specialized to
    // latest-right-at-or-before). Same answer as q49's union-tagged
    // carry-forward window, same DuckDB ASOF LEFT JOIN oracle — two
    // implementations, one truth, and the plan pin proves THIS one runs
    // through AsOfJoinExec. At 100 TB the operator wins over the
    // union-window form by never materializing the union frame and
    // keeping one row of state instead of a window buffer.
    "q314_native_asof" -> ((s, d) => {
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraStrategies = Seq(graft.plans.AsOfJoinStrategy)
      val ev = ld(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      graft.plans.AsOfJoinOps.asof(s, p, c,
          "user_id", "c_user", "ts", "click_ts")
        .select(col("event_id"), col("user_id"),
          col("click_ts").as("last_click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
        .orderBy("event_id")
    }),

    // ASOF FROM PURE SQL — the parser seam end-to-end: the statement
    // `ASOF JOIN <l> KEY <k> TIME <t> TO <r> KEY <k2> TIME <t2>`
    // (GraftSqlParser, injected via injectParser + a per-side
    // injectResolutionRule) plans to the SAME AsOfJoinExec as q314 —
    // no DataFrame-side constructor, just spark.sql on two temp views.
    // The query itself is the view→last-click attribution roll-up:
    // per user, how many views had a preceding click and the summed
    // staleness. Output columns carry only per-(key,time) functional
    // values (click_ts, never click attrs), so duplicate-timestamp
    // ties cost nothing. Scale: the as-of merge is the q314 operator
    // (key-clustered, (key,time)-sorted, O(1) state); the roll-up
    // reuses the same user_id clustering — AQE sees the join output
    // already hash-partitioned on user_id, and the agg is map-side
    // combined either way.
    "q315_asof_sql" -> ((s, d) => {
      val ev = ld(s, d, "events")
      ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("g_views")
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
        .createOrReplaceTempView("g_clicks")
      s.sql("ASOF JOIN g_views KEY user_id TIME ts " +
          "TO g_clicks KEY c_user TIME click_ts")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"),
          count(col("click_ts")).as("n_with_click"),
          sum(unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("sum_gap_us"))
        .orderBy("user_id")
    }),

    // EWMA BURST DETECTION — the per-entity rate-anomaly gate every
    // abuse/fraud pipeline runs: a user's current hourly event count
    // against an exponentially weighted average of their own history.
    // EWMA is INTEGER-EXACT here: half-life-1 weights 2^(7-j) over the
    // user's last 8 OBSERVED hours (row-based lags, so quiet users
    // aren't diluted by empty calendar hours), numerator and weight
    // sum both plain BIGINTs — no float decay chain to drift between
    // engines, no unbounded (1-α)^-t blowup. A hot hour flags when
    // cnt·wsum > 2·ewma_num, i.e. current > 2× weighted average with
    // ≥4 history hours. Shape: one (user, hour) keyed agg (map-side
    // combined), then user-partitioned lag windows — both scale on the
    // user key; nothing corpus-wide. The 8-lag unroll keeps the whole
    // thing in ONE window pass over codegen'd projections.
    "q318_ewma_burst" -> ((s, d) => {
      val hourly = ld(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .groupBy("user_id", "h").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy("h")
      val lagTerms = (1 to 8).map(j =>
        s"coalesce(lag_$j * ${1 << (8 - j)}, 0)").mkString(" + ")
      val wTerms = (1 to 8).map(j =>
        s"CASE WHEN lag_$j IS NULL THEN 0 ELSE ${1 << (8 - j)} END")
        .mkString(" + ")
      val nHist = (1 to 8).map(j =>
        s"CASE WHEN lag_$j IS NULL THEN 0 ELSE 1 END").mkString(" + ")
      (1 to 8).foldLeft(hourly) { (df, j) =>
          df.withColumn(s"lag_$j", lag(col("cnt"), j).over(w))
        }
        .selectExpr("user_id", "h", "cnt",
          s"CAST($lagTerms AS BIGINT) AS ewma_num",
          s"CAST($wTerms AS BIGINT) AS wsum",
          s"CAST($nHist AS BIGINT) AS n_hist")
        .withColumn("burst",
          col("n_hist") >= 4 && col("cnt") * col("wsum") >
            lit(2L) * col("ewma_num"))
        .orderBy("user_id", "h")
    }),

    // MAX CONCURRENCY via TWO-LEVEL PREFIX SUM — "how many 30-minute
    // event intervals overlap at peak, per day": the capacity-planning
    // sweep line. The textbook form is ONE global running sum over all
    // boundaries — a single-partition window (the q291 anti-pattern).
    // Here the scan is SEGMENTED: each interval explodes to (+1 at
    // start, −1 at end) boundaries; days aggregate their net delta
    // (map-side combined) and a tiny window over the DAYS frame gives
    // each day's carry-in; the within-day running sum is day-
    // partitioned — the classic parallel prefix-sum decomposition, so
    // at 100 TB every window is bounded by a day's boundaries, never
    // the corpus. Tie order is pinned (−1 before +1 at equal us: [s,e)
    // intervals — a departure and arrival at the same instant never
    // double-count); the day PEAK is invariant to ordering among equal
    // deltas, which is why only day-level rows are emitted.
    "q322_max_concurrency" -> ((s, d) => {
      val bounds = ld(s, d, "events")
        .select(unix_micros(col("ts")).as("st"))
        .select(explode(array(
          struct(col("st").as("us"), lit(1L).as("delta")),
          struct((col("st") + 1800L * 1000000L).as("us"),
            lit(-1L).as("delta")))).as("b"))
        .select(col("b.us").as("us"), col("b.delta").as("delta"))
        .withColumn("day", expr("CAST(timestamp_micros(us) AS DATE)"))
      val wDays = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = bounds.groupBy("day")
        .agg(sum("delta").as("net"), count(lit(1)).as("n_bounds"))
        .withColumn("carry_in", coalesce(sum("net").over(wDays), lit(0L)))
      val wIn = Window.partitionBy("day").orderBy("us", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
      val peak = bounds.withColumn("run", sum("delta").over(wIn))
        .groupBy("day").agg(max("run").as("peak_local"))
      carry.join(peak, Seq("day"))
        .select(col("day"), col("n_bounds"), col("carry_in"),
          (col("carry_in") + col("peak_local")).as("day_max_concurrency"))
        .orderBy("day")
    }),

    // EXACT-CENTS MULTI-TOUCH ATTRIBUTION — q162 identifies first/last
    // touch; this is the LINEAR model that splits each purchase's
    // revenue equally across ALL of the user's prior views, with the
    // money staying integer-exact: each view gets cents DIV n, and the
    // remainder r = cents % n goes +1 cent each to the r MOST RECENT
    // views (largest-remainder on recency — deterministic, and
    // Σshares = cents by construction, so no fraction of a cent is
    // ever minted or lost across millions of purchases; the oracle
    // equality IS the conservation proof). Shape: purchase→prior-view
    // pairing is a user-keyed join (pair space bounded per user, never
    // corpus²), the recency rank is a per-purchase window, and the
    // final per-view rollup is map-side combined.
    "q323_linear_attribution" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
            .as("cents"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("event_id").as("view_id"),
          col("us").as("vus"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("us").as("pus"), col("cents"))
      val pairs = purchases
        .join(views.hint("shuffle_hash"),
          col("user_id") === col("vu") && col("vus") < col("pus"))
      val wr = Window.partitionBy("purchase_id")
        .orderBy(col("vus").desc, col("view_id"))
      pairs
        .withColumn("recency", row_number().over(wr))
        .withColumn("nv", count(lit(1)).over(
          Window.partitionBy("purchase_id")))
        .select(col("view_id"), col("user_id"),
          expr("cents DIV nv + CAST(recency <= cents % nv AS INT)")
            .as("share"))
        .groupBy("user_id", "view_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum("share").as("attributed_cents"))
        .orderBy("user_id", "view_id")
    }),

    // DFA TRANSITION VALIDATION — q149 MEASURES the transition matrix;
    // this VALIDATES each user's event sequence against a declared
    // protocol (the broadcast allowed-transition table: signup starts a
    // journey, views browse, clicks need a view, purchases need a
    // click, errors may follow anything but only a view/signup may
    // follow an error — a funnel contract). Per user: transitions
    // taken, violations (null-probe against the DFA — the q98
    // decontamination shape applied to protocol checking), the
    // lexicographically-smallest offending pair (deterministic
    // summary), and a valid verdict. Sequence pairing is the
    // q149 user-partitioned lag window; the DFA is a 13-row broadcast;
    // the rollup is map-side combined — protocol validation at 100 TB
    // costs one keyed window plus a broadcast probe.
    "q326_dfa_validation" -> ((s, d) => {
      import s.implicits._
      val allowed = dfaAllowed
        .toDF("from_type", "to_type").withColumn("ok", lit(true))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = ld(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("to_type"))
        .withColumn("from_type", lag("to_type", 1).over(w))
        .filter(col("from_type").isNotNull)
      trans.join(broadcast(allowed), Seq("from_type", "to_type"), "left")
        .withColumn("bad", col("ok").isNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_transitions"),
          sum(col("bad").cast("long")).as("n_violations"),
          min(when(col("bad"),
            concat_ws(">", col("from_type"), col("to_type"))))
            .as("min_violation"),
          (sum(col("bad").cast("long")) === 0L).as("valid"))
        .orderBy("user_id")
    }),

    // OHLC DOWNSAMPLING — the time-series compaction every metrics
    // store runs: per (user, hour) candle with open/high/low/close of
    // the event value in exact cents. Open/close are ORDER-dependent
    // (first/last by (ts, event_id)) — the trap is that first()/last()
    // over an unordered aggregate is nondeterministic under shuffles;
    // here they come from min_by/max_by on the (us, event_id) struct
    // key, which is a pure function of the data (total order — ids are
    // unique), so the candle is shuffle-order-proof. One keyed agg,
    // map-side combined; at 100 TB this is the compaction that turns
    // raw events into the 3-orders-smaller frame dashboards read.
    "q327_ohlc_downsample" -> ((s, d) => {
      ld(s, d, "events")
        .select(col("user_id"),
          date_trunc("hour", col("ts")).as("h"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
            .as("cents"))
        .groupBy("user_id", "h")
        .agg(count(lit(1)).as("n"),
          expr("min_by(cents, struct(us, event_id))").as("open_cents"),
          max("cents").as("high_cents"),
          min("cents").as("low_cents"),
          expr("max_by(cents, struct(us, event_id))").as("close_cents"),
          sum("cents").as("vol_cents"))
        .orderBy("user_id", "h")
    }),

    // TYPED COGROUP — the Dataset API's two-sided per-key seam beside
    // q77's one-sided mapGroups: both event streams group by user and
    // ONE function sees each user's views and purchases together —
    // the shape for per-entity logic that genuinely needs both sides
    // materialized (here: how many purchases predate the user's first
    // view — the "bought before browsing" cohort a recommender audits;
    // imperative per-key array logic, which is exactly when cogroup
    // beats a join+window). Scale: cogroup is one co-partitioned
    // shuffle of both sides on the key; per-user state is that user's
    // rows only. Encoder-typed end to end; the oracle replays it
    // relationally (min-view window + conditional count).
    "q333_typed_cogroup" -> ((s, d) => {
      import s.implicits._
      val ev = ld(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as[Long], col("us").as[Long])
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as[Long], col("us").as[Long])
      views.groupByKey(_._1).cogroup(purchases.groupByKey(_._1)) {
        (user, vs, ps) =>
          val vl = vs.map(_._2).toArray
          val pl = ps.map(_._2).toArray
          val firstView =
            if (vl.nonEmpty) vl.min else Long.MaxValue
          Iterator((user, vl.length.toLong, pl.length.toLong,
            pl.count(_ < firstView).toLong))
      }.toDF("user_id", "n_views", "n_purchases", "bought_before_browse")
        .orderBy("user_id")
    }),

    // NULL-SAFE JOIN (<=>) — the one equality variant the join family
    // hadn't pinned: ordinary equi-joins DROP null keys on both sides
    // (SQL three-valued logic), while <=> (IS NOT DISTINCT FROM)
    // matches null to null — the semantics a dedup/rollup join needs
    // when "unknown" is itself a valid bucket. The audit runs the SAME
    // rollup join both ways over a feed where every 13th customer key
    // is nulled, and reports the row counts side by side plus the
    // null-bucket size — the exact number of rows a naive equi-join
    // silently loses. Null-safe equality hash-partitions like any key
    // (nulls form one bucket), so the plan stays a shuffled hash join.
    "q337_null_safe_join" -> ((s, d) => {
      val o = ld(s, d, "orders").selectExpr("o_orderkey",
        "CASE WHEN o_custkey % 13 = 0 THEN NULL" +
          " ELSE o_custkey END AS ck",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)" +
          " AS cents")
      val agg = o.groupBy(col("ck").as("ak"))
        .agg(count(lit(1)).as("n_orders"))
      val equi = o.join(agg.hint("shuffle_hash"), col("ck") === col("ak"))
        .agg(lit("equi").as("join_mode"), count(lit(1)).as("n_matched"),
          sum("cents").as("cents_matched"))
      val nsafe = o.join(agg.hint("shuffle_hash"), col("ck") <=> col("ak"))
        .agg(lit("null_safe").as("join_mode"),
          count(lit(1)).as("n_matched"), sum("cents").as("cents_matched"))
      val nulls = o.filter(col("ck").isNull)
        .agg(lit("null_bucket").as("join_mode"),
          count(lit(1)).as("n_matched"), sum("cents").as("cents_matched"))
      equi.unionByName(nsafe).unionByName(nulls).orderBy("join_mode")
    }),

    // NEAREST-MODE AS-OF — completes the as-of family (q49/q314
    // backward, q270 forward): each purchase pairs with its CLOSEST
    // click in either direction, ties to the earlier (backward) side.
    // Built from the NATIVE AsOfJoinExec applied twice — backward
    // directly, forward by running the SAME operator on negated
    // micro timestamps (latest(-t_c) ≤ -t_p ⇔ earliest t_c ≥ t_p), so
    // one physical merge implements both directions; the combine is a
    // purchase-keyed join of two already-key-clustered frames.
    // Oracle: DuckDB's ASOF with the opposite inequality per
    // direction, same tie rule.
    "q338_asof_nearest" -> ((s, d) => {
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental.extraStrategies = Seq(graft.plans.AsOfJoinStrategy)
      val ev = ld(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("pus"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          unix_micros(col("ts")).as("cus"))
      val back = graft.plans.AsOfJoinOps.asof(s, p, c,
          "user_id", "c_user", "pus", "cus")
        .select(col("event_id"), col("user_id"),
          (col("pus") - col("cus")).as("gap_back"))
      val fwd = graft.plans.AsOfJoinOps.asof(s,
          p.select(col("event_id").as("f_id"), col("user_id").as("f_user"),
            (-col("pus")).as("npus")),
          c.select(col("c_user").as("fc_user"), (-col("cus")).as("ncus")),
          "f_user", "fc_user", "npus", "ncus")
        .select(col("f_id").as("event_id"),
          (col("npus") - col("ncus")).as("gap_fwd"))
      back.join(fwd, Seq("event_id"))
        .selectExpr("event_id", "user_id", "gap_back", "gap_fwd",
          """CASE
               WHEN gap_back IS NULL AND gap_fwd IS NULL THEN NULL
               WHEN gap_fwd IS NULL THEN 'backward'
               WHEN gap_back IS NULL THEN 'forward'
               WHEN gap_back <= gap_fwd THEN 'backward'
               ELSE 'forward' END AS direction""",
          """CASE
               WHEN gap_back IS NULL THEN gap_fwd
               WHEN gap_fwd IS NULL THEN gap_back
               WHEN gap_back <= gap_fwd THEN gap_back
               ELSE gap_fwd END AS nearest_gap_us""")
        .orderBy("event_id")
    }),

    // DST-AWARE LOCAL-DAY LEDGER — "daily" rollups are a TIMEZONE
    // statement: the same UTC feed grouped by America/New_York vs
    // Europe/Berlin local days yields different day boundaries, and
    // the DST transitions (US 2024-03-10, EU 2024-03-31) make those
    // local days 23 wall-clock hours long — visible here as the
    // distinct-local-hour count dipping below a full day's coverage.
    // `convert_timezone` is evaluated per row from the IANA tzdb (a
    // deterministic, codegen'd expression — no shuffle), so the only
    // exchange is the (zone, local_day) rollup: ~2×150 keys at any
    // corpus size. The 120-day deterministic spread pushes the
    // one-month fixture across both transitions. Oracle: DuckDB's
    // two-step `timezone()` algebra (naive→UTC instant→local naive),
    // session-timezone-independent on both sides.
    "q343_tz_ledger" -> ((s, d) => {
      val ev = ld(s, d, "events").select(
        expr("timestampadd(DAY, CAST(event_id % 120 AS INT), ts)")
          .as("uts"))
      def one(zone: String) = ev.select(lit(zone).as("zone"),
        expr(s"convert_timezone('UTC', '$zone', " +
          "CAST(uts AS TIMESTAMP_NTZ))").as("lts"))
      one("America/New_York").unionByName(one("Europe/Berlin"))
        .groupBy(col("zone"), to_date(col("lts")).as("local_day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(date_trunc("HOUR", col("lts")))
            .as("n_local_hours"))
        .orderBy("zone", "local_day")
    }),

    // ARRAY SET ALGEBRA — day-over-day behavioral drift as SET
    // operations on each user's daily event-type repertoire:
    // array_intersect (kept), array_except (added/dropped) and
    // array_union (basis for Jaccard) over collect_set arrays, lagged
    // one day per user with a strict consecutive-day guard. The
    // arrays are bounded by |event types| (≤5), so the set ops are
    // O(1) per row and the whole audit is the (user, day) rollup +
    // one user-partitioned window — the same cost as any sessionize.
    // Jaccard in integer bp so no float can drift. Oracle rebuilds
    // the sets with list(DISTINCT) and derives the same sizes from
    // len + list_intersect (union = |a|+|b|−|∩| on sets).
    "q346_type_set_drift" -> ((s, d) => {
      val daily = ld(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(collect_set(col("event_type")).as("types"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      daily
        .withColumn("prev_day", lag("day", 1).over(w))
        .withColumn("prev", lag("types", 1).over(w))
        .where(col("prev").isNotNull &&
          datediff(col("day"), col("prev_day")) === 1)
        .select(col("day"),
          size(array_intersect(col("types"), col("prev"))).as("inter"),
          size(array_union(col("types"), col("prev"))).as("uni"),
          size(array_except(col("types"), col("prev"))).as("added"),
          size(array_except(col("prev"), col("types"))).as("dropped"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_pairs"),
          sum("inter").cast("long").as("sum_inter"),
          sum("added").cast("long").as("sum_added"),
          sum("dropped").cast("long").as("sum_dropped"),
          sum(expr("(inter * 10000) DIV uni")).cast("long")
            .as("sum_jaccard_bp"))
        .orderBy("day")
    }),

    // CHI-SQUARED INDEPENDENCE — is event mix independent of weekday?
    // The contingency machinery beside q317's Mann-Whitney and q297's
    // Kendall: one corpus pass builds the |types|×7 cell counts
    // (checkpointed — row totals, column totals and N all derive from
    // the 35-row cell frame, never re-scanning the corpus), then each
    // cell's χ² contribution uses the (N·n−r·c)²/(N·r·c) form so the
    // expected counts never materialize as intermediate floats; the
    // per-type partial χ² rounds at 1e-3, far above the 1e-15
    // addition-order noise. Weekday is Monday=0 on both sides
    // (Spark weekday() ↔ DuckDB isodow−1 — their dayofweek()s
    // disagree on Sunday).
    "q348_chisq_independence" -> ((s, d) => {
      val cells = ld(s, d, "events")
        .groupBy(col("event_type"),
          expr("weekday(CAST(ts AS DATE))").as("dow"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val rows = cells.groupBy("event_type").agg(sum("n").as("r"))
      val cols = cells.groupBy("dow").agg(sum("n").as("c"))
      val tot = cells.agg(sum("n").as("nn"))
      cells.join(broadcast(rows), "event_type")
        .join(broadcast(cols), "dow")
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("n"),
          (pow(col("nn") * col("n") - col("r") * col("c"), 2) /
            (col("nn") * col("r") * col("c"))).as("contrib"))
        .groupBy("event_type")
        .agg(sum("n").cast("long").as("n_events"),
          round(sum("contrib"), 3).as("chi2_part"))
        .orderBy("event_type")
    }),

    // TIMESTAMP FORMAT ROUNDTRIP — ingest at scale lives and dies on
    // format-pattern fidelity: the audit renders every microsecond
    // timestamp through a non-ISO pattern (dd/MM/yyyy + 6-digit
    // fraction), parses it back, and proves bit-exact equality per
    // row; a predicate-keyed dirty slice (date-only truncation, 1/97
    // incidence — production shape, not an exception storm, per the
    // q284 lesson) exercises try_to_timestamp's NULL-absorbing parse.
    // All narrow projections; the only shuffle is the |types| rollup.
    // Oracle: DuckDB strftime/strptime with the %-pattern equivalents
    // — the query IS the Java-pattern ↔ strptime mapping test.
    "q350_timestamp_roundtrip" -> ((s, d) => {
      ld(s, d, "events")
        .select(col("event_id"), col("event_type"), col("ts"))
        .withColumn("str",
          date_format(col("ts"), "dd/MM/yyyy HH:mm:ss.SSSSSS"))
        .withColumn("dirty",
          when(col("event_id") % 97 === 0, substring(col("str"), 1, 10))
            .otherwise(col("str")))
        .select(col("event_type"),
          (to_timestamp(col("str"), "dd/MM/yyyy HH:mm:ss.SSSSSS")
            === col("ts")).as("exact"),
          expr("try_to_timestamp(dirty, 'dd/MM/yyyy HH:mm:ss.SSSSSS')")
            .isNull.as("failed"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("count_if(exact)").as("n_roundtrip_exact"),
          expr("count_if(failed)").as("n_dirty_fail"))
        .orderBy("event_type")
    }),

    // ALLEN INTERVAL ALGEBRA — the 13 mutually-exclusive temporal
    // relations (precedes/meets/overlaps/starts/during/finishes,
    // their inverses, equals) classified EXACTLY in integer micros
    // between each user's per-type activity windows [first ts,
    // last ts]. This is the vocabulary a temporal-join planner
    // reasons in: "overlaps" pairs are the ones a range join must
    // catch, "meets" is the boundary equality a half-open window
    // convention flips. The pair join is an EQUI join on user_id
    // (≤ C(5,2)=10 pairs per user, never corpus²) and the CASE
    // cascade is order-sensitive but exhaustive, so every pair lands
    // in exactly one bucket — the rollup proves both engines agree
    // on all 13 definitions at every boundary.
    "q351_allen_relations" -> ((s, d) => {
      // |users|×|types| rows — checkpointed so the self-join's two
      // sides read one corpus pass, not two
      val iv = ld(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        .localCheckpoint()
      val rel =
        """CASE
             WHEN a_hi <  b_lo THEN 'precedes'
             WHEN a_hi =  b_lo THEN 'meets'
             WHEN b_hi <  a_lo THEN 'preceded_by'
             WHEN b_hi =  a_lo THEN 'met_by'
             WHEN a_lo = b_lo AND a_hi = b_hi THEN 'equals'
             WHEN a_lo = b_lo AND a_hi < b_hi THEN 'starts'
             WHEN a_lo = b_lo THEN 'started_by'
             WHEN a_hi = b_hi AND a_lo > b_lo THEN 'finishes'
             WHEN a_hi = b_hi THEN 'finished_by'
             WHEN a_lo > b_lo AND a_hi < b_hi THEN 'during'
             WHEN a_lo < b_lo AND a_hi > b_hi THEN 'contains'
             WHEN a_lo < b_lo THEN 'overlaps'
             ELSE 'overlapped_by' END"""
      iv.select(col("user_id"), col("event_type").as("ta"),
          col("lo").as("a_lo"), col("hi").as("a_hi"))
        .join(iv.select(col("user_id"), col("event_type").as("tb"),
          col("lo").as("b_lo"), col("hi").as("b_hi"))
          .hint("shuffle_hash"), Seq("user_id"))
        .where(col("ta") < col("tb"))
        .select(col("ta"), col("tb"), expr(rel).as("relation"))
        .groupBy("ta", "tb", "relation")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("ta", "tb", "relation")
    }),

    // AUTOCORRELATION — the ACF of the daily revenue series at lags
    // 1..7, the diagnostic a forecasting or seasonality gate reads
    // first (weekly cadence shows as a lag-7 peak). One corpus pass
    // rolls the feed into the ~30-row daily frame (checkpointed);
    // the lag alignment is a self-join on day = day − ℓ over that
    // tiny frame, so the per-lag Pearson runs on ≤30 pairs per lag
    // regardless of corpus size. The (nΣxy−ΣxΣy)/√(…) form uses
    // dollar doubles and rounds at 1e-4, far above addition-order
    // noise on 30 terms.
    "q352_autocorrelation" -> ((s, d) => {
      val daily = ld(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("rev"))
        .localCheckpoint()
      val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
      daily.as("a")
        .crossJoin(broadcast(lags))
        .join(daily.as("b").hint("shuffle_hash"),
          expr("b.day = date_add(a.day, -lag)"))
        .select(col("lag"), col("a.rev").as("x"), col("b.rev").as("y"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          round((count(lit(1)) * sum(col("x") * col("y"))
              - sum("x") * sum("y")) /
            sqrt((count(lit(1)) * sum(col("x") * col("x"))
                - sum("x") * sum("x")) *
              (count(lit(1)) * sum(col("y") * col("y"))
                - sum("y") * sum("y"))), 4).as("acf"))
        .orderBy("lag")
    }),

    // TIME-WEIGHTED AVERAGE — a plain mean over-weights bursts; the
    // TWAP weights each observation by how long it REMAINED the
    // current value (lead(ts) − ts within its type's timeline, the
    // step-function integral a market-data or sensor rollup needs).
    // The integral stays EXACT: cents×micros products sum in
    // DECIMAL(38,0) (they overflow BIGINT at corpus scale — 1e16 per
    // segment × 1e5 rows), and the TWAP itself is integer division of
    // the two totals. One type-partitioned window for the lead, one
    // |types|-key rollup — no joins, corpus scanned once.
    "q353_time_weighted_avg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("us", "event_id")
      ld(s, d, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("dur", lead("us", 1).over(w) - col("us"))
        .where(col("dur").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_segments"),
          sum("dur").cast("long").as("total_dur_us"),
          sum(col("cents").cast("decimal(38,0)") * col("dur"))
            .as("wsum"))
        .selectExpr("event_type", "n_segments", "total_dur_us",
          "CAST(wsum DIV total_dur_us AS BIGINT) AS twap_cents")
        .orderBy("event_type")
    }),

    // CLAMPED RUNNING BALANCE — max(0, b+Δ) folds look inherently
    // sequential (each row depends on the previous CLAMPED value),
    // which at 100 TB would mean a per-key imperative pass. The
    // closed form b_t = cum_t − min(0, min_{k≤t} cum_k) turns the
    // fold into TWO stock window functions over the same (user, ts)
    // sort — cumulative sum and running minimum — so the wallet
    // semantics (purchases debit, everything else credits, floor at
    // zero) distribute exactly like any windowed aggregate: one
    // user-partitioned sort, no recursion, no UDF. All arithmetic in
    // exact cents; ties broken by event_id so the fold order is
    // total.
    "q354_clamped_balance" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      ld(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          expr("""CASE WHEN event_type = 'purchase'
                       THEN -CAST(CAST(value AS DECIMAL(12,2)) * 100
                                  AS BIGINT)
                       ELSE CAST(CAST(value AS DECIMAL(12,2)) * 100
                                 AS BIGINT) END""").as("delta"))
        .withColumn("cum", sum("delta").over(w))
        .withColumn("clamped",
          col("cum") - least(lit(0L), min("cum").over(w)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_tx"),
          max("clamped").as("peak_cents"),
          expr("count_if(clamped = 0)").as("n_floored"))
        .orderBy("user_id")
    }),

    // MAP-TYPED PROFILE — the MapType column family end to end:
    // map_from_entries builds each user's type→count profile from
    // collected structs, transform_values rewrites counts to
    // share-of-total basis points IN PLACE (the lambda sees key and
    // value), map_filter drops sub-10% entries, and explode returns
    // to relational rows for comparison. Maps are how feature stores
    // ship sparse per-entity profiles; the audit proves the map
    // algebra computes exactly what the relational oracle derives
    // without maps. Integer bp arithmetic throughout; the maps are
    // bounded by |event types| so every lambda is O(1) per row.
    "q357_map_profile" -> ((s, d) => {
      ld(s, d, "events")
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"),
          sum("n").as("tot"))
        .select(col("user_id"),
          expr("map_filter(transform_values(m," +
            " (k, v) -> (v * 10000) DIV tot), (k, v) -> v >= 1000)")
            .as("mf"))
        .select(col("user_id"), explode(col("mf"))
          .as(Seq("event_type", "share_bp")))
        .orderBy("user_id", "event_type")
    }),

    // CUPED VARIANCE REDUCTION — the experimentation-platform
    // adjustment: θ = cov(pre, post)/var(pre) fitted on the POOLED
    // user frame, then y_adj = y − θ(x − x̄) strips the pre-period
    // component from every user's post-period metric, shrinking
    // variance without biasing the A/B delta (assignment is
    // md5-deterministic, so both engines agree on who's in B). One
    // corpus pass builds the per-user pre/post frame (checkpointed);
    // θ and x̄ are a broadcast scalar; the variant rollup uses the
    // Σ-forms so both engines compute the identical arithmetic,
    // rounded far above float noise.
    "q358_cuped_adjustment" -> ((s, d) => {
      val users = ld(s, d, "events")
        .groupBy("user_id")
        .agg(
          sum(when(dayofmonth(col("ts")) <= 15, col("value"))
            .otherwise(lit(0.0))).as("x"),
          sum(when(dayofmonth(col("ts")) > 15, col("value"))
            .otherwise(lit(0.0))).as("y"))
        .withColumn("variant",
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 4)," +
            " 16, 10) AS BIGINT) % 2").cast("int"))
        .localCheckpoint()
      val pooled = users.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
        .selectExpr("sx / n AS xbar",
          "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta")
      users.crossJoin(broadcast(pooled))
        .select(col("variant"), col("y"),
          (col("y") - col("theta") * (col("x") - col("xbar")))
            .as("yadj"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n_users"),
          round(avg("y"), 4).as("mean_y"),
          round(avg("yadj"), 4).as("mean_y_adj"),
          round(var_pop("y"), 2).as("var_y"),
          round(var_pop("yadj"), 2).as("var_y_adj"))
        .orderBy("variant")
    }),

    // FIFO LOT ATTRIBUTION — first-in-first-out drawdown without the
    // sequential matcher: credits (non-purchase events) form lots
    // whose CUMULATIVE cents interval [cum−size, cum) is computed by
    // one window, and because FIFO consumes strictly in that order,
    // lot i's consumed amount against the user's total purchases P is
    // just the interval clamp max(0, min(hi, P) − lo) — per-lot
    // closed form, no lot×purchase pair join, the same
    // "sequential-looking fold → window algebra" move as q354. Exact
    // cents; per user we report lots fully/partially burned, the
    // remaining balance, and the age of the oldest unconsumed lot.
    "q359_fifo_attribution" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .localCheckpoint()
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(sum("cents").as("p"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.where(col("event_type") =!= "purchase")
        .withColumn("hi", sum("cents").over(w))
        .withColumn("lo", col("hi") - col("cents"))
        .join(purchases.hint("shuffle_hash"), Seq("user_id"), "left")
        .select(col("user_id"), col("us"), col("cents"),
          greatest(lit(0L),
            least(col("hi"), coalesce(col("p"), lit(0L))) - col("lo"))
            .as("consumed"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_lots"),
          expr("count_if(consumed = cents)").as("n_burned"),
          expr("count_if(consumed > 0 AND consumed < cents)")
            .as("n_partial"),
          sum(col("cents") - col("consumed")).cast("long")
            .as("remaining_cents"),
          min(when(col("consumed") < col("cents"), col("us")))
            .as("oldest_open_us"))
        .orderBy("user_id")
    }),

    // SLIDING-WINDOW DISTINCT — exact 7-day-active users per day.
    // COUNT(DISTINCT) OVER a sliding range frame is the classic
    // scale trap (the state is the whole window's key set per row);
    // the scalable form dedups FIRST: presence = distinct (user,
    // day) — corpus → user-days, the only big shuffle — then each
    // presence day is exploded to the ≤7 window anchors it can serve
    // and a bounded distinct count per anchor finishes the job. The
    // explode factor is the window length, a constant — at 100 TB
    // the intermediate is 7×user-days, not 7×events, and never a
    // per-row set. Anchors past the last data day trail off
    // deterministically (windows ending there see partial weeks).
    "q360_sliding_distinct" -> ((s, d) => {
      ld(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .select(col("user_id"), explode(expr(
          "sequence(day, date_add(day, 6))")).as("w"))
        .groupBy("w")
        .agg(countDistinct("user_id").as("n_active_7d"))
        .orderBy("w")
    }),

    // TOP JOURNEYS — the most common session-opening paths: sessions
    // cut at the 30-minute gap (q71's rule), each session reduced to
    // its first five event types joined '>'-separated, then a global
    // journey census with a total ordering (count desc, path asc) so
    // the top-20 is deterministic. The session assembly is one
    // user-partitioned window + one per-session collect; the journey
    // census shuffles |distinct paths| keys (bounded by 5^|types|,
    // not by corpus); TakeOrdered finishes without a global sort.
    "q362_top_journeys" -> ((s, d) => {
      val wl = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wc = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      ld(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("brk",
          when(col("us") - lag("us", 1).over(wl) > 1800000000L ||
            lag("us", 1).over(wl).isNull, 1L).otherwise(0L))
        .withColumn("sess", sum("brk").over(wc))
        .groupBy("user_id", "sess")
        .agg(array_join(slice(transform(sort_array(collect_list(
          struct(col("us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), 1, 5), ">").as("journey"))
        .groupBy("journey").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("journey"))
        .limit(20)
    }),

    // WILSON INTERVAL — the conversion-rate bound that stays sane at
    // small n and extreme p̂ (the plain normal interval escapes
    // [0, 1]): per event type, the share of high-value events with
    // the 95% Wilson lower/upper bounds. Everything derives from two
    // integers per group (successes, trials) in one map-side-combined
    // pass; the closed form is a projection. Rounded at 1e-5 — the
    // two engines' sqrt differ by at most one ulp.
    "q363_wilson_interval" -> ((s, d) => {
      val z = 1.959963984540054 // Φ⁻¹(0.975)
      ld(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("count_if(value > 50.0)").as("k"))
        .selectExpr("event_type", "n", "k",
          "k / CAST(n AS DOUBLE) AS phat")
        .selectExpr("event_type", "n", "k",
          "round(phat, 5) AS p_hat",
          s"round((phat + $z*$z/(2*n) - $z * sqrt(phat*(1-phat)/n" +
            s" + $z*$z/(4*n*n))) / (1 + $z*$z/n), 5) AS wilson_lo",
          s"round((phat + $z*$z/(2*n) + $z * sqrt(phat*(1-phat)/n" +
            s" + $z*$z/(4*n*n))) / (1 + $z*$z/n), 5) AS wilson_hi")
        .orderBy("event_type")
    }),

    // DEAD-LETTER SPLIT SINK — the ingest-hardening rung beside q281's
    // idempotent MERGE: every micro-batch is split INSIDE the stream
    // into parseable rows (valid JSON props carrying the required key)
    // and a dead-letter side (here: rows whose props were corrupted
    // at the source, injected deterministically at event_id % 37), and
    // BOTH sides land in batchId-keyed stores so a redelivered batch
    // can never double-count either lane. This is the split every
    // production ingest runs: the job must not die on a malformed row
    // (q284's try_* lesson at the stream boundary), must not silently
    // drop it either, and the DLQ row keeps its grouping key so the
    // loss is attributable per event type. Only the |types|-sized
    // per-batch partials cross the sink seam; the batch-replay oracle
    // recomputes both lanes from the same corruption rule.
    "q304_stream_dead_letter" -> ((s, d) => withStreamSession(s, 8) {
      ss =>
      import scala.jdk.CollectionConverters._
      val rawSchema = ss.read.parquet(s"$d/events.parquet").schema
      // (batchId, lane) -> per-type (n, ksum); MERGE semantics per slot
      val store = new java.util.concurrent.ConcurrentHashMap[
        (Long, String), Map[String, (Long, Long)]]()
      val q = ss.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .transform(Tables.normalizeEventsTs)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          val split = df.selectExpr("event_type",
              "CASE WHEN event_id % 37 = 0 THEN '{bad' ELSE props END" +
                " AS pr")
            .selectExpr("event_type",
              "from_json(pr, 'k INT').k AS k")
          val valid = split.filter("k IS NOT NULL")
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("ks"))
            .collect().map(r => r.getString(0) ->
              (r.getLong(1), r.getLong(2))).toMap
          val dlq = split.filter("k IS NULL")
            .groupBy("event_type").agg(count(lit(1)).as("n"))
            .collect().map(r => r.getString(0) ->
              (r.getLong(1), 0L)).toMap
          store.put((batchId, "valid"), valid) // MERGE: replace the slot
          store.put((batchId, "dlq"), dlq)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def lane(l: String): Map[String, (Long, Long)] = store.asScala
        .collect { case ((_, ln), m) if ln == l => m }.toSeq.flatten
        .groupBy(_._1).view
        .mapValues(vs => (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
      val v = lane("valid"); val dl = lane("dlq")
      import ss.implicits._
      (v.keySet ++ dl.keySet).toSeq.sorted.map { t =>
        val (n, ks) = v.getOrElse(t, (0L, 0L))
        (t, n, ks, dl.getOrElse(t, (0L, 0L))._1)
      }.toDF("event_type", "n_valid", "k_sum", "n_dlq")
        .orderBy("event_type")
    }),

    // SHAPLEY CHANNEL ATTRIBUTION — the axiomatic credit split the
    // heuristic attributors (q162 last-touch, q323 linear) can't
    // give: each touch channel's marginal contribution averaged over
    // every arrival order. The key scale move is COALITION
    // COMPRESSION: journeys collapse to a channel BITMASK per user
    // (touches strictly before the first purchase — the attribution
    // window), masks collapse to counts, and Shapley runs entirely on
    // the 2^k SUBSET LATTICE (k=4 ⇒ 16 rows, broadcast-sized at any
    // corpus scale; v(S) = converted users whose mask ⊆ S via one
    // tiny containment join). Weights |S|!·(k−1−|S|)! are INTEGER
    // literals and φ·k! stays exact BIGINT (phi_scaled); only the
    // final /24 is floating. Efficiency axiom holds by construction:
    // Σφ = v(full) − v(∅) = conversions with ≥1 prior touch.
    "q374_shapley_attribution" -> ((s, d) => {
      // ONE corpus scan: the first-purchase timestamp is a per-user
      // window (no self-join), and the mask-count frame (≤ 16 rows)
      // is checkpointed before the lattice SQL references it twice —
      // CTE inlining would otherwise re-derive the corpus rollup
      // once per v-table reference.
      val wu = Window.partitionBy("user_id")
      ld(s, d, "events").select("user_id", "ts", "event_type")
        .withColumn("fpts",
          min(when(col("event_type") === "purchase", col("ts")))
            .over(wu))
        .groupBy("user_id")
        .agg(
          coalesce(expr("bit_or(CASE WHEN event_type <> 'purchase'" +
            " AND (fpts IS NULL OR ts < fpts)" +
            " THEN CASE event_type" +
            " WHEN 'click' THEN 1 WHEN 'error' THEN 2" +
            " WHEN 'signup' THEN 4 WHEN 'view' THEN 8" +
            " END END)"), lit(0)).cast("long").as("mask"),
          max(when(col("fpts").isNotNull, 1).otherwise(0)).as("conv"))
        .groupBy("mask")
        .agg(expr("CAST(count_if(conv = 1) AS BIGINT)").as("n_conv"))
        .localCheckpoint()
        .createOrReplaceTempView("shapley_mask_counts")
      s.sql("""
        WITH mc AS (SELECT mask, n_conv FROM shapley_mask_counts),
        subsets AS (SELECT CAST(id AS BIGINT) AS s FROM range(0, 16)),
        v AS (SELECT s, CAST(coalesce(sum(n_conv), 0) AS BIGINT) AS v
              FROM subsets LEFT JOIN mc ON (mask & s) = mask
              GROUP BY s),
        chans AS (SELECT * FROM VALUES
          (1, 'click'), (2, 'error'), (4, 'signup'), (8, 'view')
          AS chans(c, channel)),
        terms AS (
          SELECT ch.channel,
                 CASE bit_count(sub.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                      WHEN 2 THEN 2 ELSE 6 END AS w,
                 vc.v - vs.v AS delta
          FROM chans ch JOIN subsets sub ON (sub.s & ch.c) = 0
          JOIN v vs ON vs.s = sub.s
          JOIN v vc ON vc.s = (sub.s | ch.c))
        SELECT channel, CAST(sum(w * delta) AS BIGINT) AS phi_scaled,
               round(CAST(sum(w * delta) AS DOUBLE) / 24, 6) AS phi
        FROM terms GROUP BY channel ORDER BY channel""")
    }),

    // EXPONENTIAL INTERARRIVAL FIT — is the event stream Poisson?
    // Rate MLE (1/mean gap) plus a one-sample KS test against the
    // fitted exponential CDF — the parametric sibling of q170's
    // two-sample KS, and the assumption check behind every queueing
    // / staffing model built on "arrivals are Poisson". Gaps are
    // exact integer seconds from a per-user lag; the ECDF deviation
    // uses BOTH step corners (the textbook D statistic). The global
    // ECDF rank is one ordered window over the gap frame — at 100 TB
    // this becomes q87's range-partitioned rank recipe; the finding
    // here (D = 0.007 < crit 0.014) certifies the generator really
    // is Poisson. Gap seconds are floored from exact micros on both
    // engines (the q421 cast-rounding trap).
    "q419_exponential_fit" -> ((s, d) => {
      graft.Tables.view(s, d, "events")
      // The gap frame is derived ONCE and checkpoint-pinned (the
      // q400/q405 cell-frame stance): the moment fit, the ECDF rank,
      // and the scalar readouts all branch off it — a pure CTE chain
      // re-ran the per-user lag window 5× (measured 5 scans / 6
      // window passes before the pin).
      val x = s.sql("""
        WITH g AS (
          SELECT unix_micros(ts) DIV 1000000
                 - lag(unix_micros(ts) DIV 1000000)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap
          FROM events)
        SELECT CAST(gap AS DOUBLE) AS gap FROM g
        WHERE gap IS NOT NULL AND gap > 0""").localCheckpoint()
      val m = x.agg(expr("CAST(count(*) AS BIGINT)").as("n"),
          expr("avg(gap)").as("mean_gap"))
        .localCheckpoint()
      // staged ECDF rank (r13, Ranks.scala): ranking every gap through
      // one unpartitioned window serialized the whole frame — bucket by
      // ⌊gap⌋ (monotone; gaps are whole seconds cast to double, so this
      // is value-exact), rank within buckets keyed. Tie order among
      // equal gaps is arbitrary in BOTH forms, and KS is tie-invariant:
      // the set of (i, gap) pairs over a tie group is identical.
      val dev = Ranks.stagedGlobalRank(x,
          floor(col("gap")).cast("bigint"), Seq(col("gap")), "i", "_nx")
        .crossJoin(broadcast(m))
        .selectExpr("""greatest(
            abs(CAST(i AS DOUBLE)/n - (1 - exp(-gap/mean_gap))),
            abs(CAST(i-1 AS DOUBLE)/n - (1 - exp(-gap/mean_gap))))
          AS dv""")
        .agg(expr("round(max(dv), 6)").as("ks_stat"))
      dev.crossJoin(m).selectExpr("n AS n_gaps",
        "round(mean_gap, 2) AS mean_gap_s", "ks_stat",
        "round(1.36 / sqrt(n), 6) AS ks_crit_05")
    }),

    // INTERVAL UNION LENGTH — total COVERED time per population from
    // overlapping sessions, the billing/utilization primitive the
    // concurrency family stops short of (q322 finds peak depth,
    // q248 sweeps globally; neither answers "how many seconds were
    // covered at all"): the classic ±1 sweep line per user — depth
    // via cumulative sum, covered segments are those with depth > 0,
    // summed exactly in integer seconds. Session ends are
    // md5-derived (30–120 min). The sweep partitions by user, so
    // the sort never crosses keys; raw-vs-covered is the
    // double-billing exposure. Seconds are FLOORED from exact micros
    // on both engines — CAST(epoch() AS BIGINT) would ROUND in
    // DuckDB where unix_timestamp floors in Spark, a ±1 s skew on
    // every fractional timestamp (cost one mismatched hash to find).
    "q421_interval_union" -> ((s, d) => {
      graft.Tables.view(s, d, "events")
      // ONE corpus scan: both ±1 endpoints explode from each session
      // row (no self-union), and raw seconds fall out of the same
      // point stream as Σ(−dd·t) — Σ(en−st) without a second pass.
      s.sql("""
        WITH pts AS (
          SELECT user_id, p.t AS t, p.dd AS dd
          FROM (SELECT user_id,
                       unix_micros(ts) DIV 1000000 AS st,
                       unix_micros(ts) DIV 1000000 + 1800
                         + CAST(conv(substr(md5(concat('d#',
                             CAST(event_id AS STRING))), 1, 4),
                             16, 10) AS BIGINT) % 5400 AS en
                FROM events)
          LATERAL VIEW explode(array(
            named_struct('t', st, 'dd', 1),
            named_struct('t', en, 'dd', -1))) x AS p),
        sw AS (SELECT user_id, t, dd,
                 sum(dd) OVER (PARTITION BY user_id
                   ORDER BY t, dd DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS depth,
                 lead(t) OVER (PARTITION BY user_id
                   ORDER BY t, dd DESC) AS nxt
               FROM pts),
        agg AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                         AS n_users,
                       CAST(sum(CASE WHEN depth > 0
                                 AND nxt IS NOT NULL
                                THEN nxt - t ELSE 0 END) AS BIGINT)
                         AS covered_seconds,
                       CAST(sum(-dd * t) AS BIGINT) AS raw_seconds
                FROM sw)
        SELECT n_users, covered_seconds, raw_seconds FROM agg""")
    }),

    // SKEW-SALT PLANNER — the 100 TB skew playbook AS A QUERY:
    // q50/q86 execute salting and q116 lets AQE split at runtime;
    // this emits the PLAN a static pipeline config needs — per-key
    // salt factors sized so no task exceeds the even-split target
    // T = ⌈N/32⌉: salt_k = ⌈c_k/T⌉ for every key over target. The
    // summary row carries the before/after max task load and the
    // added shuffle width (Σ extra buckets), i.e. the cost of the
    // fix next to the skew it removes. One keyed count rollup +
    // |keys|-frame math; ceilings via (a+b−1) DIV b, all BIGINT.
    "q446_skew_salt_planner" -> ((s, d) => {
      val counts = ld(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      counts
        .withColumn("n", sum("c").over(Window.partitionBy()))
        .selectExpr("user_id", "c", "(n + 31) DIV 32 AS t")
        .selectExpr("c", "t", "(c + t - 1) DIV t AS salt")
        .agg(count(lit(1)).as("n_keys"),
          expr("max(t)").as("target_rows"),
          expr("count_if(salt > 1)").as("n_hot_keys"),
          max("c").as("max_key_rows"),
          expr("max((c + salt - 1) DIV salt)").as("max_after_split"),
          expr("sum(salt - 1)").as("extra_buckets"))
        .selectExpr("n_keys", "target_rows", "n_hot_keys",
          "max_key_rows", "max_after_split", "extra_buckets",
          "CAST((2 * max_key_rows * 100 + target_rows)" +
            " DIV (2 * target_rows) AS BIGINT) AS skew_x100_before",
          "CAST((2 * max_after_split * 100 + target_rows)" +
            " DIV (2 * target_rows) AS BIGINT) AS skew_x100_after")
    }),

    // URL CANONICAL DEDUP — the web-crawl dedup rung BEFORE content
    // fingerprints (q40 hashes bodies; most crawl dupes are the
    // SAME resource under URL noise): events stage deterministic
    // messy URLs (md5-picked host-case variants, shuffled param
    // order, utm_* tracking params, fragments), and the
    // canonicalizer — parse with split_part, lowercase the host
    // only, drop utm_* and the fragment, SORT the surviving params
    // — collapses them. Canonicalization is pure per-row string/
    // array algebra (no UDF, no join); the rollup reports the
    // collapse per canonical host. raw→canonical distinct-count
    // ratio is the dedup yield a crawl planner budgets from.
    "q448_url_canonical_dedup" -> ((s, d) => {
      def h(tag: String) =
        s"CAST(conv(substr(md5(concat('$tag'," +
          " CAST(event_id AS STRING))), 1, 4), 16, 10) AS BIGINT)"
      val urls = ld(s, d, "events")
        .selectExpr("event_id",
          s"element_at(array('example.com', 'EXAMPLE.com'," +
            s" 'Example.Com', 'shop.example.net')," +
            s" CAST(${h("h#")} % 4 + 1 AS INT)) AS host",
          s"concat('/p/', CAST(event_id % 50 AS STRING)) AS path",
          s"concat('id=', CAST(event_id % 97 AS STRING)) AS p_id",
          s"CASE WHEN ${h("u#")} % 3 > 0 THEN concat('utm_source=s'," +
            s" CAST(${h("u#")} % 3 AS STRING)) ELSE NULL END AS p_utm",
          s"${h("o#")} % 2 = 0 AS id_first",
          s"CASE WHEN ${h("f#")} % 2 = 0 THEN concat('#s'," +
            s" CAST(event_id % 3 AS STRING)) ELSE '' END AS frag")
        .selectExpr("event_id",
          "concat('https://', host, path, '?'," +
            " CASE WHEN p_utm IS NULL THEN p_id" +
            "      WHEN id_first THEN concat(p_id, '&', p_utm)" +
            "      ELSE concat(p_utm, '&', p_id) END, frag) AS url")
        .localCheckpoint()
      val canon = urls.selectExpr("url",
          "split_part(split_part(split_part(url, '://', 2), '/', 1)," +
            " '#', 1) AS host",
          "split_part(split_part(url, '?', 2), '#', 1) AS qs")
        .selectExpr("url", "lower(host) AS chost",
          "substr(split_part(url, '?', 1)," +
            " 9 + length(host)) AS path",
          "array_join(array_sort(filter(split(qs, '&')," +
            " x -> substr(x, 1, 4) <> 'utm_')), '&') AS cq")
        .selectExpr("url", "chost",
          "concat('https://', chost, path," +
            " CASE WHEN cq <> '' THEN concat('?', cq) ELSE '' END)" +
            " AS curl")
      canon.groupBy("chost")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("url").as("n_raw_urls"),
          countDistinct("curl").as("n_canon_urls"))
        .selectExpr("chost", "n_events", "n_raw_urls", "n_canon_urls",
          "CAST((2 * (n_raw_urls - n_canon_urls) * 10000" +
            " + n_raw_urls) DIV (2 * n_raw_urls) AS BIGINT)" +
            " AS collapse_bp")
        .orderBy("chost")
    }),

    // DOMAIN BLOCKLIST GATE — the crawl-side cousin of q448's
    // canonicalizer: hosts are gated against a suffix blocklist
    // with correct SUBDOMAIN semantics (block 'example.net' ⇒
    // block 'shop.example.net' but NOT 'notexample.net' — the
    // classic suffix-match bug this query's exact-equality-or-
    // dot-suffix predicate avoids). The host census is one keyed
    // rollup; the blocklist is a broadcast literal joined by the
    // non-equi suffix predicate — at 100 TB the blocklist is still
    // driver-small and the gate stays a broadcast filter, never a
    // shuffle.
    "q453_domain_blocklist_gate" -> ((s, d) => {
      val hosts = ld(s, d, "events")
        .selectExpr(
          "element_at(array('example.com', 'EXAMPLE.com'," +
            " 'Example.Com', 'shop.example.net')," +
            " CAST(CAST(conv(substr(md5(concat('h#'," +
            " CAST(event_id AS STRING))), 1, 4), 16, 10) AS BIGINT)" +
            " % 4 + 1 AS INT)) AS host")
        .selectExpr("lower(host) AS chost")
        .groupBy("chost").agg(count(lit(1)).as("n_events"))
      val bl = s.sql("SELECT * FROM VALUES ('example.net')," +
        " ('badsite.org') AS t(suffix)")
      hosts.join(broadcast(bl),
          expr("chost = suffix OR chost LIKE concat('%.', suffix)"),
          "left")
        .selectExpr("chost", "n_events", "suffix AS matched_suffix",
          "suffix IS NOT NULL AS blocked")
        .orderBy("chost")
    }),

    // GROUP-SEQUENTIAL A/B — interim analysis done right: three
    // calendar-ordered looks (ntile thirds of the event stream,
    // CUMULATIVE counts at each), the two-proportion z² at every
    // look with all denominators cleared (z² = (x_a·n_b −
    // x_b·n_a)²·n / (n_a·n_b·x·(n−x)), DECIMAL(38,0)), and the
    // O'Brien–Fleming K=3 boundaries as e6 LITERALS (z = 3.471 /
    // 2.454 / 2.004 — computed offline, the q324 LUT stance). The
    // sibling of q370's SPRT (always-valid) — this is the fixed-
    // looks committee protocol. Peeking without boundaries is the
    // bug; the crossed column is the only ship/no-ship signal.
    "q460_group_sequential" -> ((s, d) => {
      val evs = ld(s, d, "events")
        .selectExpr("event_id", "ts",
          "CAST(conv(substr(md5(concat('gs#'," +
            " CAST(user_id AS STRING))), 1, 4), 16, 10) AS BIGINT)" +
            " % 2 AS arm",
          "CAST(event_type = 'purchase' AS BIGINT) AS conv")
      // staged thirds via ntile COUNTS (r14, Ranks.stagedNtileCounts):
      // the looks only need per-(third, arm, conv) COUNTS, so only the
      // ≤2 boundary-straddling hour buckets ever see a row_number —
      // whole hours contribute through the coarse (hour × arm × conv)
      // aggregate. r13's general staged rank checkpointed and ranked
      // every event for ranks this groupBy immediately discarded
      // (0.32→0.79 s local); look assignment is bit-identical to the
      // corpus ntile (ties broken by (ts, event_id), a total order).
      val looks = Ranks.stagedNtileCounts(evs,
          expr("unix_micros(ts) DIV 3600000000"),
          Seq(col("ts"), col("event_id")), 3, Seq("arm", "conv"),
          "look", "c")
        .groupBy("look")
        .agg(sum(when(col("arm") === 0, col("c")).otherwise(0L))
            .as("na_i"),
          sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("nb_i"),
          sum(when(col("arm") === 0, col("conv") * col("c"))
            .otherwise(0L)).as("xa_i"),
          sum(when(col("arm") === 1, col("conv") * col("c"))
            .otherwise(0L)).as("xb_i"))
        .localCheckpoint()
      val wc = Window.orderBy("look")
        .rowsBetween(Window.unboundedPreceding, 0)
      looks
        .withColumn("na", sum("na_i").over(wc))
        .withColumn("nb", sum("nb_i").over(wc))
        .withColumn("xa", sum("xa_i").over(wc))
        .withColumn("xb", sum("xb_i").over(wc))
        .selectExpr("look", "na", "nb", "xa", "xb",
          // the uncorrected denominator na·nb·x·(n−x) ≈ 6e21 at
          // sf0.1 — every product rides DECIMAL(38,0)
          "CAST((2 * CAST(xa * nb - xb * na AS DECIMAL(38,0))" +
            " * (xa * nb - xb * na) * (na + nb) * 1000000" +
            " + CAST(na AS DECIMAL(38,0)) * nb * (xa + xb)" +
            " * (na + nb - xa - xb))" +
            " DIV (2 * CAST(na AS DECIMAL(38,0)) * nb * (xa + xb)" +
            " * (na + nb - xa - xb))" +
            " AS BIGINT) AS z2_e6",
          "element_at(array(12047841L, 6022116L, 4016016L)," +
            " CAST(look AS INT)) AS bound_z2_e6")
        .selectExpr("look", "na", "nb", "xa", "xb", "z2_e6",
          "bound_z2_e6", "z2_e6 >= bound_z2_e6 AS crossed")
        .orderBy("look")
    }),

    // STORAGE TIERING PLAN — the lifecycle policy as data: users
    // tier by recency against the corpus high-watermark (hot ≤6h,
    // warm ≤24h, cold — thresholds sized to THIS stream's measured
    // recency quantiles, p50≈7h/p90≈24h, so all three tiers are
    // populated), each tier carries its user/event counts
    // and an exact record-size proxy (fixed fields + measured
    // string lengths), and the byte shares say what a
    // hot-on-NVMe / warm-on-object / cold-on-archive split
    // actually moves. One corpus scan to the per-user rollup; the
    // watermark is a broadcast 1-row frame.
    "q473_data_tiering_plan" -> ((s, d) => {
      val usr = ld(s, d, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          max(unix_micros(col("ts"))).as("last_us"),
          sum(expr("40 + CAST(length(event_type) AS BIGINT)" +
            " + CAST(length(props) AS BIGINT)")).as("bytes"))
        .localCheckpoint()
      val mx = usr.agg(max("last_us").as("mx_us"))
      usr.crossJoin(broadcast(mx))
        .selectExpr("n_ev", "bytes",
          "CASE WHEN mx_us - last_us <= 6L * 3600000000" +
            " THEN 'a_hot'" +
            " WHEN mx_us - last_us <= 24L * 3600000000" +
            " THEN 'b_warm' ELSE 'c_cold' END AS tier")
        .groupBy("tier")
        .agg(count(lit(1)).as("n_users"),
          sum("n_ev").cast("long").as("n_events"),
          sum("bytes").cast("long").as("bytes"))
        .withColumn("tot", sum("bytes").over(Window.partitionBy()))
        .selectExpr("tier", "n_users", "n_events", "bytes",
          "CAST((2 * bytes * 10000 + tot) DIV (2 * tot) AS BIGINT)" +
            " AS bytes_share_bp")
        .orderBy("tier")
    }),

    // SEGMENT MIGRATION MATRIX — q149's transitions are event-type
    // Markov steps; this is the USER-level version a growth team
    // reads: activity quartile in the first half of the timeline
    // vs the second (ntile over (count, user_id) — total order, so
    // both engines cut identical segment boundaries), full-outer
    // joined so appearing (0→q) and churning (q→0) users are
    // first-class rows of the matrix. Two keyed rollups off one
    // scan; the midpoint is a broadcast 1-row frame.
    "q474_segment_migration" -> ((s, d) => {
      val ev = ld(s, d, "events")
        .selectExpr("user_id", "unix_micros(ts) AS us")
        .localCheckpoint()
      val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid"))
      val halves = ev.crossJoin(broadcast(mid))
        .selectExpr("user_id",
          "CAST(us > mid AS INT) AS half")
        .groupBy("user_id", "half")
        .agg(count(lit(1)).as("n"))
        .withColumn("qt", ntile(4).over(
          Window.partitionBy("half").orderBy("n", "user_id"))
          .cast("long"))
        .localCheckpoint()
      val h0 = halves.filter(col("half") === 0)
        .select(col("user_id"), col("qt").as("q_first"))
      val h1 = halves.filter(col("half") === 1)
        .select(col("user_id"), col("qt").as("q_second"))
      h0.join(h1, Seq("user_id"), "full_outer")
        .selectExpr("coalesce(q_first, 0L) AS q_first",
          "coalesce(q_second, 0L) AS q_second")
        .groupBy("q_first", "q_second")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("q_first", "q_second")
    }),
  )

  val oracle: Map[String, String] = Map(
    // q314: the SAME oracle as q49 — the custom physical operator must
    // reproduce the composed form's answer bit for bit.
    "q314_native_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts AS click_ts FROM events
                    WHERE event_type = 'click')
         SELECT event_id, p.user_id AS user_id, click_ts AS last_click_ts,
                epoch_us(ts) - epoch_us(click_ts) AS gap_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.click_ts
         ORDER BY event_id""",

    // q315: DuckDB's native ASOF LEFT JOIN is the oracle for the
    // parser-injected statement — same semantics, independent engine.
    "q315_asof_sql" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'view'),
              c AS (SELECT user_id AS c_user, ts AS click_ts FROM events
                    WHERE event_type = 'click')
         SELECT user_id, count(*) AS n_views,
                count(click_ts) AS n_with_click,
                CAST(sum(epoch_us(ts) - epoch_us(click_ts)) AS BIGINT)
                  AS sum_gap_us
         FROM v ASOF LEFT JOIN c
           ON v.user_id = c.c_user AND v.ts >= c.click_ts
         GROUP BY user_id ORDER BY user_id""",

    // q318: same 8-lag integer unroll — weights are powers of two so
    // both engines agree bit for bit.
    "q318_ewma_burst" -> {
      val lagTerms = (1 to 8).map(j =>
        s"coalesce(lag_$j * ${1 << (8 - j)}, 0)").mkString(" + ")
      val wTerms = (1 to 8).map(j =>
        s"CASE WHEN lag_$j IS NULL THEN 0 ELSE ${1 << (8 - j)} END")
        .mkString(" + ")
      val nHist = (1 to 8).map(j =>
        s"CASE WHEN lag_$j IS NULL THEN 0 ELSE 1 END").mkString(" + ")
      val lagDefs = (1 to 8).map(j =>
        s"lag(cnt, $j) OVER (PARTITION BY user_id ORDER BY h) AS lag_$j")
        .mkString(", ")
      s"""WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
                                 count(*) AS cnt
                          FROM events GROUP BY 1, 2),
               lagged AS (SELECT user_id, h, cnt, $lagDefs FROM hourly)
          SELECT user_id, h, CAST(cnt AS BIGINT) AS cnt,
                 CAST($lagTerms AS BIGINT) AS ewma_num,
                 CAST($wTerms AS BIGINT) AS wsum,
                 CAST($nHist AS BIGINT) AS n_hist,
                 (($nHist) >= 4 AND cnt * ($wTerms) > 2 * ($lagTerms))
                   AS burst
          FROM lagged ORDER BY user_id, h"""
    },

    // q327: the oracle takes the window route to the same total order
    // (rank-1 rows under (us, event_id) asc/desc) — arg-min/max by a
    // composite key expressed two independent ways, one answer.
    "q327_ohlc_downsample" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h,
                           epoch_us(ts) AS us, event_id,
                           CAST(CAST(value AS DECIMAL(14,2)) * 100
                                AS BIGINT) AS cents
                    FROM events),
              r AS (SELECT *,
                           row_number() OVER (PARTITION BY user_id, h
                             ORDER BY us, event_id) AS ra,
                           row_number() OVER (PARTITION BY user_id, h
                             ORDER BY us DESC, event_id DESC) AS rd
                    FROM e)
         SELECT user_id, h, CAST(count(*) AS BIGINT) AS n,
                CAST(min(CASE WHEN ra = 1 THEN cents END) AS BIGINT)
                  AS open_cents,
                CAST(max(cents) AS BIGINT) AS high_cents,
                CAST(min(cents) AS BIGINT) AS low_cents,
                CAST(min(CASE WHEN rd = 1 THEN cents END) AS BIGINT)
                  AS close_cents,
                CAST(sum(cents) AS BIGINT) AS vol_cents
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    // q337: IS NOT DISTINCT FROM is DuckDB's <=>.
    "q337_null_safe_join" ->
      """WITH o AS (SELECT o_orderkey,
                           CASE WHEN o_custkey % 13 = 0 THEN NULL
                                ELSE o_custkey END AS ck,
                           CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                                AS BIGINT) AS cents
                    FROM orders),
              a AS (SELECT ck AS ak, count(*) AS n_orders
                    FROM o GROUP BY 1)
         SELECT * FROM (
           SELECT 'equi' AS join_mode, CAST(count(*) AS BIGINT)
                    AS n_matched,
                  CAST(sum(cents) AS BIGINT) AS cents_matched
           FROM o JOIN a ON o.ck = a.ak
           UNION ALL
           SELECT 'null_bucket', CAST(count(*) AS BIGINT),
                  CAST(sum(cents) AS BIGINT)
           FROM o WHERE ck IS NULL
           UNION ALL
           SELECT 'null_safe', CAST(count(*) AS BIGINT),
                  CAST(sum(cents) AS BIGINT)
           FROM o JOIN a ON o.ck IS NOT DISTINCT FROM a.ak)
         ORDER BY join_mode""",

    // q338: DuckDB's ASOF with the opposite inequality per direction —
    // >= picks the latest earlier click, <= the earliest later one.
    "q338_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS pus
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id AS c_user, epoch_us(ts) AS cus
                    FROM events WHERE event_type = 'click'),
              b AS (SELECT event_id, p.user_id AS user_id,
                           pus - cus AS gap_back
                    FROM p ASOF LEFT JOIN c
                      ON p.user_id = c.c_user AND p.pus >= c.cus),
              f AS (SELECT event_id, cus - pus AS gap_fwd
                    FROM p ASOF LEFT JOIN c
                      ON p.user_id = c.c_user AND p.pus <= c.cus)
         SELECT b.event_id, user_id,
                CAST(gap_back AS BIGINT) AS gap_back,
                CAST(gap_fwd AS BIGINT) AS gap_fwd,
                CASE
                  WHEN gap_back IS NULL AND gap_fwd IS NULL THEN NULL
                  WHEN gap_fwd IS NULL THEN 'backward'
                  WHEN gap_back IS NULL THEN 'forward'
                  WHEN gap_back <= gap_fwd THEN 'backward'
                  ELSE 'forward' END AS direction,
                CAST(CASE
                  WHEN gap_back IS NULL THEN gap_fwd
                  WHEN gap_fwd IS NULL THEN gap_back
                  WHEN gap_back <= gap_fwd THEN gap_back
                  ELSE gap_fwd END AS BIGINT) AS nearest_gap_us
         FROM b JOIN f ON b.event_id = f.event_id
         ORDER BY b.event_id""",

    // q343: timezone(tz, naive) interprets IN tz → instant;
    // timezone(tz, instant) renders the local naive — the two-step is
    // session-timezone-independent, unlike a bare ::TIMESTAMPTZ cast.
    "q343_tz_ledger" ->
      """WITH e AS (SELECT ts + (event_id % 120) * INTERVAL 1 DAY AS uts
                    FROM events),
              l AS (SELECT 'America/New_York' AS zone,
                           timezone('America/New_York',
                                    timezone('UTC', uts)) AS lts
                    FROM e
                    UNION ALL
                    SELECT 'Europe/Berlin',
                           timezone('Europe/Berlin',
                                    timezone('UTC', uts))
                    FROM e)
         SELECT zone, CAST(lts AS DATE) AS local_day,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT date_trunc('hour', lts)) AS BIGINT)
                  AS n_local_hours
         FROM l GROUP BY 1, 2 ORDER BY 1, 2""",

    // q346: sets via list(DISTINCT); union/except sizes derived from
    // len + intersect (exact on sets), Jaccard by integer division.
    "q346_type_set_drift" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               list(DISTINCT event_type) AS types
                        FROM events GROUP BY 1, 2),
              lagged AS (SELECT day, types,
                                lag(day) OVER w AS prev_day,
                                lag(types) OVER w AS prev
                         FROM daily
                         WINDOW w AS (PARTITION BY user_id
                                      ORDER BY day)),
              pairs AS (SELECT day,
                               len(list_intersect(types, prev)) AS inter,
                               len(types) + len(prev)
                                 - len(list_intersect(types, prev))
                                 AS uni,
                               len(types)
                                 - len(list_intersect(types, prev))
                                 AS added,
                               len(prev)
                                 - len(list_intersect(types, prev))
                                 AS dropped
                        FROM lagged
                        WHERE prev IS NOT NULL
                          AND date_diff('day', prev_day, day) = 1)
         SELECT day, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(inter) AS BIGINT) AS sum_inter,
                CAST(sum(added) AS BIGINT) AS sum_added,
                CAST(sum(dropped) AS BIGINT) AS sum_dropped,
                CAST(sum((inter * 10000) // uni) AS BIGINT)
                  AS sum_jaccard_bp
         FROM pairs GROUP BY 1 ORDER BY 1""",

    // q348: same (N·n−r·c)²/(N·r·c) cell form; isodow−1 = Spark's
    // weekday (Monday=0).
    "q348_chisq_independence" ->
      """WITH cells AS (SELECT event_type,
                               isodow(CAST(ts AS DATE)) - 1 AS dow,
                               count(*) AS n
                        FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, sum(n) AS r FROM cells
                    GROUP BY 1),
              c AS (SELECT dow, sum(n) AS c FROM cells GROUP BY 1),
              t AS (SELECT sum(n) AS nn FROM cells)
         SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
                round(sum(CAST(nn * n - r.r * c.c AS DOUBLE)
                          * CAST(nn * n - r.r * c.c AS DOUBLE)
                          / (CAST(nn AS DOUBLE) * r.r * c.c)), 3)
                  AS chi2_part
         FROM cells JOIN r USING (event_type) JOIN c USING (dow)
         CROSS JOIN t
         GROUP BY 1 ORDER BY 1""",

    // q350: the %-pattern equivalents of dd/MM/yyyy HH:mm:ss.SSSSSS;
    // try_strptime absorbs the date-only dirty rows as NULL.
    "q350_timestamp_roundtrip" ->
      """WITH e AS (SELECT event_id, event_type, ts,
                           strftime(ts, '%d/%m/%Y %H:%M:%S.%f') AS str
                    FROM events),
              x AS (SELECT event_type,
                           strptime(str, '%d/%m/%Y %H:%M:%S.%f') = ts
                             AS exact,
                           try_strptime(
                             CASE WHEN event_id % 97 = 0
                                  THEN substr(str, 1, 10) ELSE str END,
                             '%d/%m/%Y %H:%M:%S.%f') IS NULL AS failed
                    FROM e)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(count_if(exact) AS BIGINT) AS n_roundtrip_exact,
                CAST(count_if(failed) AS BIGINT) AS n_dirty_fail
         FROM x GROUP BY 1 ORDER BY 1""",

    // q351: identical CASE cascade over the same integer-micro
    // endpoints — both engines must agree at every boundary equality.
    "q351_allen_relations" ->
      """WITH iv AS (SELECT user_id, event_type,
                            min(epoch_us(ts)) AS lo,
                            max(epoch_us(ts)) AS hi
                     FROM events GROUP BY 1, 2)
         SELECT a.event_type AS ta, b.event_type AS tb,
                CASE
                  WHEN a.hi <  b.lo THEN 'precedes'
                  WHEN a.hi =  b.lo THEN 'meets'
                  WHEN b.hi <  a.lo THEN 'preceded_by'
                  WHEN b.hi =  a.lo THEN 'met_by'
                  WHEN a.lo = b.lo AND a.hi = b.hi THEN 'equals'
                  WHEN a.lo = b.lo AND a.hi < b.hi THEN 'starts'
                  WHEN a.lo = b.lo THEN 'started_by'
                  WHEN a.hi = b.hi AND a.lo > b.lo THEN 'finishes'
                  WHEN a.hi = b.hi THEN 'finished_by'
                  WHEN a.lo > b.lo AND a.hi < b.hi THEN 'during'
                  WHEN a.lo < b.lo AND a.hi > b.hi THEN 'contains'
                  WHEN a.lo < b.lo THEN 'overlaps'
                  ELSE 'overlapped_by' END AS relation,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM iv a JOIN iv b ON a.user_id = b.user_id
                            AND a.event_type < b.event_type
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // q352: same (nΣxy−ΣxΣy)/√ form over the same daily dollars.
    "q352_autocorrelation" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                               sum(value) AS rev
                        FROM events GROUP BY 1),
              l AS (SELECT CAST(range AS INTEGER) AS lag
                    FROM range(1, 8)),
              p AS (SELECT lag, a.rev AS x, b.rev AS y
                    FROM daily a CROSS JOIN l
                    JOIN daily b ON b.day = a.day - l.lag)
         SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                round((count(*) * sum(x * y) - sum(x) * sum(y))
                      / sqrt((count(*) * sum(x * x)
                              - sum(x) * sum(x))
                             * (count(*) * sum(y * y)
                                - sum(y) * sum(y))), 4) AS acf
         FROM p GROUP BY 1 ORDER BY 1""",

    // q353: same step-function integral; DuckDB's BIGINT sums widen
    // to HUGEINT automatically, // is the same integer division.
    "q353_time_weighted_avg" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us,
                           CAST(CAST(value AS DECIMAL(12,2)) * 100
                                AS BIGINT) AS cents
                    FROM events),
              seg AS (SELECT event_type, cents,
                             lead(us) OVER (PARTITION BY event_type
                                            ORDER BY us, event_id)
                               - us AS dur
                      FROM e)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
                CAST(sum(dur) AS BIGINT) AS total_dur_us,
                CAST(sum(cents * dur) // sum(dur) AS BIGINT)
                  AS twap_cents
         FROM seg WHERE dur IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    // q354: the same two-window closed form — cumulative sum and
    // running minimum over the identical total order.
    "q354_clamped_balance" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           CASE WHEN event_type = 'purchase'
                                THEN -CAST(CAST(value AS DECIMAL(12,2))
                                           * 100 AS BIGINT)
                                ELSE CAST(CAST(value AS DECIMAL(12,2))
                                          * 100 AS BIGINT) END AS delta
                    FROM events),
              c1 AS (SELECT user_id, us, event_id,
                            sum(delta) OVER (PARTITION BY user_id
                              ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
                     FROM e),
              c2 AS (SELECT user_id,
                            cum - least(0, min(cum) OVER (
                              PARTITION BY user_id
                              ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)) AS clamped
                     FROM c1)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_tx,
                CAST(max(clamped) AS BIGINT) AS peak_cents,
                CAST(count_if(clamped = 0) AS BIGINT) AS n_floored
         FROM c2 GROUP BY 1 ORDER BY 1""",

    // q357: the map algebra replayed relationally — share-of-total in
    // integer bp with the same ≥10% cut.
    "q357_map_profile" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
                    FROM events GROUP BY 1, 2),
              t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
         SELECT c.user_id, event_type,
                CAST((n * 10000) // tot AS BIGINT) AS share_bp
         FROM c JOIN t USING (user_id)
         WHERE (n * 10000) // tot >= 1000
         ORDER BY 1, 2""",

    // q358: identical Σ-form θ and x̄; same md5 variant assignment.
    "q358_cuped_adjustment" ->
      """WITH u AS (SELECT user_id,
                           sum(CASE WHEN day(ts) <= 15 THEN value
                                    ELSE 0.0 END) AS x,
                           sum(CASE WHEN day(ts) > 15 THEN value
                                    ELSE 0.0 END) AS y,
                           CAST(CAST(('0x' || substr(md5(
                                CAST(user_id AS VARCHAR)), 1, 4))
                                AS BIGINT) % 2 AS INTEGER) AS variant
                    FROM events GROUP BY 1),
              p AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                           sum(x * x) AS sxx, sum(x * y) AS sxy
                    FROM u),
              t AS (SELECT sx / n AS xbar,
                           (n * sxy - sx * sy)
                             / (n * sxx - sx * sx) AS theta
                    FROM p)
         SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
                round(avg(y), 4) AS mean_y,
                round(avg(y - theta * (x - xbar)), 4) AS mean_y_adj,
                round(var_pop(y), 2) AS var_y,
                round(var_pop(y - theta * (x - xbar)), 2) AS var_y_adj
         FROM u CROSS JOIN t
         GROUP BY 1 ORDER BY 1""",

    // q359: same cumulative-interval clamp — FIFO consumption is
    // max(0, min(hi, P) − lo) per lot.
    "q359_fifo_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           event_type,
                           CAST(CAST(value AS DECIMAL(12,2)) * 100
                                AS BIGINT) AS cents
                    FROM events),
              pur AS (SELECT user_id, sum(cents) AS p FROM e
                      WHERE event_type = 'purchase' GROUP BY 1),
              lots AS (SELECT user_id, us, cents,
                              sum(cents) OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS hi
                       FROM e WHERE event_type <> 'purchase'),
              c AS (SELECT l.user_id, us, cents,
                           greatest(0, least(hi, coalesce(p, 0))
                                       - (hi - cents)) AS consumed
                    FROM lots l LEFT JOIN pur USING (user_id))
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_lots,
                CAST(count_if(consumed = cents) AS BIGINT) AS n_burned,
                CAST(count_if(consumed > 0 AND consumed < cents)
                     AS BIGINT) AS n_partial,
                CAST(sum(cents - consumed) AS BIGINT)
                  AS remaining_cents,
                CAST(min(CASE WHEN consumed < cents THEN us END)
                     AS BIGINT) AS oldest_open_us
         FROM c GROUP BY 1 ORDER BY 1""",

    // q360: same dedup-first shape — presence days exploded to their
    // ≤7 anchors, then a bounded distinct per anchor.
    "q360_sliding_distinct" ->
      """WITH pres AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                       FROM events),
              x AS (SELECT user_id,
                           CAST(unnest(generate_series(day, day + 6,
                                INTERVAL 1 DAY)) AS DATE) AS w
                    FROM pres)
         SELECT w, CAST(count(DISTINCT user_id) AS BIGINT)
                  AS n_active_7d
         FROM x GROUP BY 1 ORDER BY 1""",

    // q362: DuckDB's ordered list() + 1-based inclusive slice mirror
    // sort_array+slice; same total ordering on the census.
    "q362_top_journeys" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                           event_type
                    FROM events),
              b AS (SELECT user_id, event_id, us, event_type,
                           CASE WHEN us - lag(us) OVER w > 1800000000
                                  OR lag(us) OVER w IS NULL
                                THEN 1 ELSE 0 END AS brk
                    FROM e
                    WINDOW w AS (PARTITION BY user_id
                                 ORDER BY us, event_id)),
              s AS (SELECT user_id, event_type, us, event_id,
                           sum(brk) OVER (PARTITION BY user_id
                             ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS sess
                    FROM b),
              j AS (SELECT user_id, sess,
                           array_to_string(list(event_type
                             ORDER BY us, event_id)[1:5], '>')
                             AS journey
                    FROM s GROUP BY 1, 2)
         SELECT journey, CAST(count(*) AS BIGINT) AS n_sessions
         FROM j GROUP BY 1
         ORDER BY n_sessions DESC, journey LIMIT 20""",

    // q363: identical closed form, same z literal.
    "q363_wilson_interval" ->
      """WITH g AS (SELECT event_type, count(*) AS n,
                           count_if(value > 50.0) AS k
                    FROM events GROUP BY 1),
              h AS (SELECT event_type, n, k,
                           k / CAST(n AS DOUBLE) AS phat
                    FROM g)
         SELECT event_type, CAST(n AS BIGINT) AS n,
                CAST(k AS BIGINT) AS k,
                round(phat, 5) AS p_hat,
                round((phat + 1.959963984540054*1.959963984540054/(2*n)
                       - 1.959963984540054
                         * sqrt(phat*(1-phat)/n
                                + 1.959963984540054*1.959963984540054
                                  /(4*n*n)))
                      / (1 + 1.959963984540054*1.959963984540054/n), 5)
                  AS wilson_lo,
                round((phat + 1.959963984540054*1.959963984540054/(2*n)
                       + 1.959963984540054
                         * sqrt(phat*(1-phat)/n
                                + 1.959963984540054*1.959963984540054
                                  /(4*n*n)))
                      / (1 + 1.959963984540054*1.959963984540054/n), 5)
                  AS wilson_hi
         FROM h ORDER BY event_type""",

    // q333: the cogroup's imperative per-user logic replayed
    // relationally — min-view + conditional count.
    "q333_typed_cogroup" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events
                    WHERE event_type IN ('view', 'purchase')),
              fv AS (SELECT user_id,
                            min(CASE WHEN event_type = 'view'
                                THEN us END) AS first_view,
                            sum(CASE WHEN event_type = 'view'
                                THEN 1 ELSE 0 END) AS n_views,
                            sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS n_purchases
                     FROM e GROUP BY 1),
              bb AS (SELECT e.user_id,
                            count(*) AS bought_before
                     FROM e JOIN fv ON e.user_id = fv.user_id
                     WHERE e.event_type = 'purchase'
                       AND e.us < coalesce(fv.first_view,
                                           9223372036854775807)
                     GROUP BY 1)
         SELECT fv.user_id, CAST(n_views AS BIGINT) AS n_views,
                CAST(n_purchases AS BIGINT) AS n_purchases,
                CAST(coalesce(bought_before, 0) AS BIGINT)
                  AS bought_before_browse
         FROM fv LEFT JOIN bb ON fv.user_id = bb.user_id
         ORDER BY fv.user_id""",

    // q326: the DFA literal is the same Scala table the Spark side
    // broadcasts; min() over the violating pair mirrors exactly.
    "q326_dfa_validation" ->
      s"""WITH allowed(from_type, to_type) AS (VALUES $dfaAllowedValues),
               tr AS (SELECT user_id,
                             lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
                             event_type AS to_type
                      FROM events),
               t2 AS (SELECT t.user_id, t.from_type, t.to_type,
                             CASE WHEN a.from_type IS NULL
                                  THEN 1 ELSE 0 END AS bad
                      FROM tr t LEFT JOIN allowed a
                        ON t.from_type = a.from_type
                       AND t.to_type = a.to_type
                      WHERE t.from_type IS NOT NULL)
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_transitions,
                 CAST(sum(bad) AS BIGINT) AS n_violations,
                 min(CASE WHEN bad = 1
                     THEN from_type || '>' || to_type END)
                   AS min_violation,
                 (sum(bad) = 0) AS valid
          FROM t2 GROUP BY user_id ORDER BY user_id""",

    // q322: DuckDB replays the same segmented sweep (the oracle could
    // use one global window but mirroring the two-level form keeps the
    // tie-order semantics identical by construction).
    "q322_max_concurrency" ->
      """WITH ev AS (SELECT epoch_us(ts) AS st FROM events),
              b AS (SELECT us, delta FROM (
                      SELECT st AS us, 1 AS delta FROM ev
                      UNION ALL
                      SELECT st + 1800 * 1000000, -1 FROM ev)),
              bd AS (SELECT us, delta,
                            CAST(make_timestamp(us) AS DATE) AS day
                     FROM b),
              carry AS (SELECT day, sum(delta) AS net,
                               count(*) AS n_bounds
                        FROM bd GROUP BY day),
              c2 AS (SELECT day, n_bounds,
                            coalesce(sum(net) OVER (ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS carry_in
                     FROM carry),
              runs AS (SELECT day,
                              sum(delta) OVER (PARTITION BY day
                                ORDER BY us, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run
                       FROM bd),
              pk AS (SELECT day, max(run) AS peak_local FROM runs
                     GROUP BY day)
         SELECT c2.day, CAST(n_bounds AS BIGINT) AS n_bounds,
                CAST(carry_in AS BIGINT) AS carry_in,
                CAST(carry_in + peak_local AS BIGINT)
                  AS day_max_concurrency
         FROM c2 JOIN pk ON c2.day = pk.day
         ORDER BY c2.day""",

    // q323: same largest-remainder-on-recency split — the hash match
    // doubles as the cents-conservation proof.
    "q323_linear_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
                            epoch_us(ts) AS us,
                            CAST(CAST(value AS DECIMAL(14,2)) * 100
                                 AS BIGINT) AS cents
                     FROM events
                     WHERE event_type IN ('view', 'purchase')),
              v AS (SELECT user_id AS vu, event_id AS view_id,
                           us AS vus
                    FROM ev WHERE event_type = 'view'),
              p AS (SELECT user_id, event_id AS purchase_id, us AS pus,
                           cents
                    FROM ev WHERE event_type = 'purchase'),
              pr AS (SELECT p.user_id, p.purchase_id, p.cents,
                            v.view_id,
                            row_number() OVER (PARTITION BY purchase_id
                              ORDER BY vus DESC, view_id) AS recency,
                            count(*) OVER (PARTITION BY purchase_id)
                              AS nv
                     FROM p JOIN v
                       ON p.user_id = v.vu AND v.vus < p.pus)
         SELECT user_id, view_id,
                CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(sum(cents // nv + CASE WHEN recency <= cents % nv
                         THEN 1 ELSE 0 END) AS BIGINT)
                  AS attributed_cents
         FROM pr GROUP BY 1, 2 ORDER BY 1, 2""",

    // CASE does NOT guarantee lazy evaluation in a vectorized engine:
    // at sf0.1 DuckDB evaluated json_extract on rows the json_valid
    // guard excluded and threw Malformed JSON (sf0.01 happened not
    // to). The WHERE-split below is the guaranteed-safe form — invalid
    // rows never reach json_extract at any scale.
    "q304_stream_dead_letter" ->
      """WITH c AS (SELECT event_type, event_id,
                           CASE WHEN event_id % 37 = 0 THEN '{bad'
                                ELSE props END AS pr
                    FROM events),
              v AS (SELECT event_id,
                           CAST(json_extract(pr, '$.k') AS BIGINT) AS k
                    FROM c WHERE json_valid(pr)),
              t AS (SELECT c.event_type, v.k
                    FROM c LEFT JOIN v ON c.event_id = v.event_id)
         SELECT event_type,
                CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_valid,
                CAST(sum(coalesce(k, 0)) AS BIGINT) AS k_sum,
                CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_dlq
         FROM t GROUP BY 1 ORDER BY 1""",

    "q149_session_transitions" ->
      """WITH t AS (SELECT lag(event_type) OVER w AS from_type,
                           event_type AS to_type,
                           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
                    FROM events
                    WINDOW w AS (PARTITION BY user_id
                                 ORDER BY ts, event_id)),
              c AS (SELECT from_type, to_type, count(*) AS n FROM t
                    WHERE gap IS NOT NULL AND gap < 1800 * 1000000
                    GROUP BY 1, 2)
         SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
                CAST((2 * n * 10000 + tot) // (2 * tot) AS BIGINT)
                  AS share_bp
         FROM (SELECT *, sum(n) OVER (PARTITION BY from_type) AS tot
               FROM c)
         ORDER BY from_type, to_type""",
    "q103_rolling_time_window" ->
      """SELECT event_id, user_id, us,
                count(*) OVER wr AS n_1h,
                CAST(sum(cents) OVER wr AS BIGINT) AS cents_1h,
                max(cents) OVER wr AS max_cents_1h,
                us - lag(us, 1) OVER wl AS gap_us
         FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
                      CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                        AS cents
               FROM events)
         WINDOW wr AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW),
                wl AS (PARTITION BY user_id ORDER BY us, event_id)
         ORDER BY event_id""",
    "q49_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              c AS (SELECT user_id, ts AS click_ts FROM events
                    WHERE event_type = 'click')
         SELECT event_id, p.user_id AS user_id, click_ts AS last_click_ts,
                epoch_us(ts) - epoch_us(click_ts) AS gap_us
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.click_ts
         ORDER BY event_id""",
    "q75_session_window" ->
      """WITH t AS (SELECT user_id, ts, value,
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                    FROM events),
              s AS (SELECT *, sum(CASE WHEN prev_ts IS NULL
                                       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                                  THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
                    FROM t)
         SELECT user_id, min(ts) AS sess_start, count(*) AS n_events,
                round(sum(value), 2) AS tot_value
         FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_start""",
    "q76_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q78_stream_state" ->
      """SELECT user_id, count(*) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q73_unpivot" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
         FROM events GROUP BY 1, 2 HAVING count(*) > 0
         ORDER BY hr, event_type""",
    "q79_stream_static_join" ->
      """SELECT event_type, count(*) AS n
         FROM events
         WHERE user_id IN (SELECT user_id FROM events
                           WHERE event_type = 'purchase'
                           GROUP BY user_id HAVING sum(value) > 500)
         GROUP BY event_type ORDER BY event_type""",
    // q94's batch semantics exactly — the streaming path must admit the
    // same never-seen rows
    "q122_stream_incremental_dedup" ->
      """WITH docs AS (SELECT doc_id, source, n_chars, md5(text) AS fp
                       FROM documents),
              seen AS (SELECT fp FROM docs WHERE doc_id % 5 <> 0)
         SELECT doc_id, source, n_chars
         FROM docs d
         WHERE doc_id % 5 = 0
           AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = d.fp)
         ORDER BY doc_id""",
    // batch q67's brute pair scan restricted to snapshot × stream slices —
    // a green row proves the banded stream probe + minimal-band dedup
    // lost nothing
    "q126_stream_neardup" ->
      s"""WITH ${TextOps.duckSimhash64()}
          SELECT b.doc_id AS doc_id, a.doc_id AS dup_id,
                 CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
          FROM sig a JOIN sig b ON a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
          WHERE bit_count(xor(a.s, b.s)) <= 6
          ORDER BY doc_id, dup_id""",
    // identical contract to q71 — verifies the typed flatMapGroups path
    "q77_typed_sessionize" ->
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
    "q85_stream_stream_join" ->
      """SELECT p.event_id, count(*) AS n_clicks
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
          AND epoch_us(c.ts) <= epoch_us(p.ts)
         GROUP BY p.event_id ORDER BY p.event_id""",
    "q82_json_props" ->
      """SELECT event_type,
                CAST((2 * sk * 10000 + nk) // (2 * nk) AS DOUBLE) / 10000
                  AS avg_k,
                max_k, n_high
         FROM (SELECT event_type,
                      sum(CAST(props->>'k' AS INTEGER)) AS sk,
                      count(CAST(props->>'k' AS INTEGER)) AS nk,
                      max(CAST(props->>'k' AS INTEGER)) AS max_k,
                      count(CASE WHEN CAST(props->>'k' AS INTEGER) > 50
                            THEN 1 END) AS n_high
               FROM events GROUP BY event_type)
         ORDER BY event_type""",
    "q70_events_hourly" ->
      """SELECT hr, event_type, n,
                CAST(tvc AS DOUBLE) / 100 AS tot_value,
                CAST((2 * tvc * 100 + n) // (2 * n) AS DOUBLE)
                  / 10000 AS avg_value
         FROM (SELECT date_trunc('hour', ts) AS hr, event_type,
                      count(*) AS n,
                      sum(CAST(CAST(value AS DECIMAL(12,2)) * 100
                               AS BIGINT)) AS tvc
               FROM events GROUP BY 1, 2)
         ORDER BY hr, event_type""",
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
                CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                     AS DOUBLE) / 100 AS tot_value
         FROM events GROUP BY 1, 2 ORDER BY hr, event_type""",
    // The SEMANTIC spec: a plain quadratic range join — DuckDB's IEJoin
    // handles it natively, so the oracle needs none of the grid plumbing.
    "q132_interval_join" ->
      """WITH iv AS (SELECT event_id, user_id, epoch_us(ts) AS s0,
                            epoch_us(ts)
                              + CAST(floor(value * 60) AS BIGINT) * 1000000
                              AS e0
                     FROM events)
         SELECT a.event_id AS ea, b.event_id AS eb, a.user_id AS user_id,
                (least(a.e0, b.e0) - greatest(a.s0, b.s0)) // 1000000
                  AS overlap_s
         FROM iv a JOIN iv b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND a.s0 <= b.e0 AND b.s0 <= a.e0
         ORDER BY ea, eb""",
    "q137_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                     FROM events),
              t1 AS (SELECT user_id, min(us) AS t_view FROM ev
                     WHERE event_type = 'view' GROUP BY 1),
              t2 AS (SELECT ev.user_id, min(us) AS t_click
                     FROM ev JOIN t1 USING (user_id)
                     WHERE event_type = 'click' AND us >= t_view
                     GROUP BY 1),
              t3 AS (SELECT ev.user_id, min(us) AS t_purchase
                     FROM ev JOIN t2 USING (user_id)
                     WHERE event_type = 'purchase' AND us >= t_click
                     GROUP BY 1)
         SELECT t1.user_id AS user_id, t_view, t_click, t_purchase,
                t_click - t_view AS view_to_click_us,
                t_purchase - t_click AS click_to_purchase_us
         FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                 LEFT JOIN t3 ON t1.user_id = t3.user_id
         ORDER BY t1.user_id""",
    "q138_cohort" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
              f AS (SELECT user_id, min(day) AS cohort_day FROM ev
                    GROUP BY 1)
         SELECT cohort_day, CAST(day - cohort_day AS INT) AS day_offset,
                count(DISTINCT user_id) AS n_users
         FROM ev JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_day, day_offset""",
    // same strictly-preceding window, IGNORE NULLS first/last
    "q162_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                            CAST(CAST(value AS DECIMAL(14,2)) * 100
                                 AS BIGINT) AS cents
                     FROM events
                     WHERE event_type IN ('view', 'purchase')),
              att AS (SELECT *,
                        first_value(CASE WHEN event_type = 'view'
                                         THEN event_id END IGNORE NULLS)
                          OVER w AS first_view,
                        last_value(CASE WHEN event_type = 'view'
                                        THEN event_id END IGNORE NULLS)
                          OVER w AS last_view
                      FROM ev
                      WINDOW w AS (PARTITION BY user_id
                                   ORDER BY us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING))
         SELECT user_id, event_id AS purchase_id, cents,
                first_view, last_view
         FROM att WHERE event_type = 'purchase'
         ORDER BY purchase_id""",
    // same (us, event_id) gap ordering; CV<0.5 test with cleared
    // denominators, whole-second floors (non-negative, so // == DIV)
    "q175_bot_regularity" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us
                     FROM events),
              gp AS (SELECT user_id,
                            (us - lag(us) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id))
                              // 1000000 AS gap_s
                     FROM ev),
              ag AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                            CAST(sum(gap_s) AS BIGINT) AS sum_gap,
                            CAST(sum(gap_s * gap_s) AS BIGINT) AS sumsq_gap
                     FROM gp WHERE gap_s IS NOT NULL
                     GROUP BY user_id)
         SELECT user_id, n_gaps, sum_gap, sumsq_gap,
                (n_gaps >= 5 AND sum_gap > 0 AND
                 4 * n_gaps * sumsq_gap < 5 * sum_gap * sum_gap)
                  AS is_regular
         FROM ag ORDER BY user_id""",
    // the variant round-trip must reproduce what the raw columns say —
    // the oracle computes the same aggregates straight from the columns
    "q187_variant_props" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                     AS BIGINT) AS sum_k,
                CAST(max(event_id) AS BIGINT) AS max_event,
                CAST(sum(user_id) AS BIGINT) AS sum_uid
         FROM events GROUP BY 1 ORDER BY event_type""",
    // batch twin of the streaming fold: per-user count + max event id
    "q186_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
                CAST(max(event_id) AS BIGINT) AS max_event
         FROM events GROUP BY 1 ORDER BY user_id""",
    // same (ts, event_id) ordering; string_agg(ORDER BY rn) mirrors the
    // array_sort-by-rn serialization exactly
    "q177_history_pack" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
                           row_number() OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS rn
                    FROM events)
         SELECT user_id, (rn - 1) // 16 AS window_id,
                count(*) AS n_events,
                min(ts) AS t_start, max(ts) AS t_end,
                string_agg(event_type, '>' ORDER BY rn) AS seq
         FROM e GROUP BY 1, 2 ORDER BY user_id, window_id""",
    // same fixed-association expression tree — power-of-two divisions
    // are exact and left-to-right addition matches Spark's parse, so
    // the doubles compare bit-identical with no rounding step
    "q193_time_decay" ->
      """SELECT event_id, user_id,
                value + coalesce(lag(value, 1) OVER w, 0) / 2
                      + coalesce(lag(value, 2) OVER w, 0) / 4
                      + coalesce(lag(value, 3) OVER w, 0) / 8 AS decayed
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    // same integer counts; the chi-square inequality replayed in HUGEINT
    // (DuckDB's 128-bit integers dominate DECIMAL(38,0) exactly)
    "q195_ab_chi2" ->
      """WITH u AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                                         ELSE 0 END) AS BIGINT) AS n0,
                           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1
                                         ELSE 0 END) AS BIGINT) AS n1
                    FROM (SELECT DISTINCT user_id FROM events)),
              c AS (SELECT event_type,
                           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                                         ELSE 0 END) AS BIGINT) AS c0,
                           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1
                                         ELSE 0 END) AS BIGINT) AS c1
                    FROM (SELECT DISTINCT user_id, event_type FROM events)
                    GROUP BY 1)
         SELECT event_type, n0, c0, n1, c1,
                (2 * c1 * 10000 + n1) // (2 * n1)
                  - (2 * c0 * 10000 + n0) // (2 * n0) AS delta_bp,
                10000 * CAST(n0 + n1 AS HUGEINT)
                    * CAST(c0 * (n1 - c1) - c1 * (n0 - c0) AS HUGEINT)
                    * CAST(c0 * (n1 - c1) - c1 * (n0 - c0) AS HUGEINT) >
                  38416 * CAST(n0 * n1 AS HUGEINT)
                    * CAST((c0 + c1) * ((n0 - c0) + (n1 - c1)) AS HUGEINT)
                  AS reject_h0
         FROM c CROSS JOIN u ORDER BY event_type""",
    // q75's gaps-and-islands replay with the exact-cents money recipe —
    // the streaming session store must land on the same boundaries
    "q205_stream_session_window" ->
      """WITH t AS (SELECT user_id, ts, value,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events),
              s AS (SELECT *, sum(CASE WHEN prev_ts IS NULL
                                       OR epoch_us(ts) - epoch_us(prev_ts)
                                          >= 1800000000
                                  THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sess_id
                    FROM t)
         SELECT user_id, min(ts) AS sess_start,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100
                              AS BIGINT)) AS DOUBLE) / 100 AS tot_value
         FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_start""",
    // the oracle's single global window is topology-free — only the
    // result must match the two-stage blocked running max
    "q222_watermark_audit" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
              r AS (SELECT event_id, us,
                           max(us) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS seen
                    FROM e),
              l AS (SELECT CASE WHEN seen IS NULL OR seen <= us THEN 0
                                ELSE (seen - us) // 1000000 END AS late_s
                    FROM r),
              b AS (SELECT CASE WHEN late_s = 0 THEN 0
                                ELSE length(bin(late_s)) END AS bkt,
                           late_s
                    FROM l)
         SELECT CAST(bkt AS BIGINT) AS bkt, CAST(count(*) AS BIGINT) AS n,
                CAST(max(late_s) AS BIGINT) AS max_late_s
         FROM b GROUP BY 1 ORDER BY bkt""",
    "q223_session_gap_calibration" ->
      """WITH g AS (SELECT (epoch_us(ts) - epoch_us(lag(ts) OVER
                             (PARTITION BY user_id
                              ORDER BY ts, event_id))) // 1000000 AS gap_s
                    FROM events),
              gg AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL),
              b AS (SELECT CASE WHEN gap_s <= 0 THEN 0
                                ELSE length(bin(gap_s)) END AS bkt, gap_s
                    FROM gg),
              h AS (SELECT bkt, count(*) AS n_gaps,
                           max(gap_s) AS max_gap_s
                    FROM b GROUP BY 1),
              c AS (SELECT bkt, n_gaps, max_gap_s,
                           sum(n_gaps) OVER (ORDER BY bkt
                             ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
                    FROM h),
              t AS (SELECT count(*) AS tot FROM gg)
         SELECT CAST(bkt AS BIGINT) AS bkt,
                CAST(n_gaps AS BIGINT) AS n_gaps,
                CAST(max_gap_s AS BIGINT) AS max_gap_s,
                CAST((2 * cum * 10000 + tot) // (2 * tot) AS BIGINT)
                  AS cum_share_bp
         FROM c, t ORDER BY bkt""",
    "q226_gapfill_series" ->
      """WITH hr AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                            count(*) AS n
                     FROM events GROUP BY 1, 2),
              bounds AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
                         FROM hr GROUP BY 1),
              grid AS (SELECT event_type, lo,
                              unnest(generate_series(lo, hi,
                                INTERVAL 1 HOUR)) AS hr
                       FROM bounds),
              dense AS (SELECT g.event_type, g.hr,
                               coalesce(hr.n, 0) AS n,
                               (epoch_us(g.hr) - epoch_us(g.lo))
                                 // 3600000000 AS hidx
                        FROM grid g LEFT JOIN hr
                          ON g.event_type = hr.event_type
                             AND g.hr = hr.hr),
              z AS (SELECT event_type, hidx,
                           hidx - row_number() OVER (PARTITION BY event_type
                             ORDER BY hidx) AS isl
                    FROM dense WHERE n = 0),
              runs AS (SELECT event_type, max(run_h) AS longest_gap_h FROM
                         (SELECT event_type, isl, count(*) AS run_h
                          FROM z GROUP BY 1, 2)
                       GROUP BY 1),
              agg AS (SELECT event_type, count(*) AS n_hours,
                             sum(CASE WHEN n = 0 THEN 1 ELSE 0 END)
                               AS n_gap_hours,
                             sum(n) AS n_events
                      FROM dense GROUP BY 1)
         SELECT agg.event_type, CAST(n_hours AS BIGINT) AS n_hours,
                CAST(n_gap_hours AS BIGINT) AS n_gap_hours,
                CAST(n_events AS BIGINT) AS n_events,
                CAST(coalesce(longest_gap_h, 0) AS BIGINT)
                  AS longest_gap_h
         FROM agg LEFT JOIN runs ON agg.event_type = runs.event_type
         ORDER BY agg.event_type""",
    "q228_seasonal_anomaly" ->
      """WITH hr AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                            count(*) AS n
                     FROM events GROUP BY 1, 2),
              h AS (SELECT event_type, hr, n,
                           CAST(extract(hour FROM hr) AS INTEGER) AS hod
                    FROM hr),
              r AS (SELECT *, row_number() OVER (PARTITION BY event_type,
                             hod ORDER BY n, hr) AS rn,
                           count(*) OVER (PARTITION BY event_type, hod)
                             AS cnt
                    FROM h),
              med AS (SELECT event_type, hod, n AS med FROM r
                      WHERE rn = (cnt + 1) // 2),
              f AS (SELECT h.event_type, h.n, med,
                           CASE WHEN h.n * 10 >= med * 15 THEN 1 ELSE 0
                             END AS anom,
                           (2 * h.n * 10000 + med) // (2 * med)
                             AS ratio_bp
                    FROM h JOIN med ON h.event_type = med.event_type
                                   AND h.hod = med.hod)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
                CAST(sum(anom) AS BIGINT) AS n_anomalous,
                CAST(max(ratio_bp) AS BIGINT) AS peak_ratio_bp
         FROM f GROUP BY 1 ORDER BY event_type""",
    "q232_markov_order_test" ->
      """WITH lagged AS (
              SELECT event_type AS c,
                     lag(event_type, 1) OVER w AS b,
                     lag(event_type, 2) OVER w AS a
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            p1 AS (SELECT "from", "to",
                          (2 * n1 * 1000000 + tot1) // (2 * tot1)
                            AS p1_micro
                   FROM (SELECT b AS "from", c AS "to",
                                count(*) AS n1,
                                sum(count(*)) OVER (PARTITION BY b)
                                  AS tot1
                         FROM lagged WHERE b IS NOT NULL GROUP BY 1, 2)),
            pred AS (SELECT x."from" AS a, y."to" AS c,
                            sum((2 * x.p1_micro * y.p1_micro + 1000000)
                                // 2000000) AS pred_micro
                     FROM p1 x JOIN p1 y ON x."to" = y."from"
                     GROUP BY 1, 2),
            obs AS (SELECT a, c, n2,
                           (2 * n2 * 1000000 + tot2) // (2 * tot2)
                             AS obs_micro
                    FROM (SELECT a, c, count(*) AS n2,
                                 sum(count(*)) OVER (PARTITION BY a)
                                   AS tot2
                          FROM lagged WHERE a IS NOT NULL GROUP BY 1, 2))
         SELECT coalesce(obs.a, pred.a) AS a,
                coalesce(obs.c, pred.c) AS c,
                CAST(coalesce(n2, 0) AS BIGINT) AS n2,
                CAST(coalesce(obs_micro, 0) AS BIGINT) AS obs_micro,
                CAST(coalesce(pred_micro, 0) AS BIGINT) AS pred_micro,
                CAST(abs(coalesce(obs_micro, 0) - coalesce(pred_micro, 0))
                  AS BIGINT) AS gap_micro
         FROM obs FULL OUTER JOIN pred
           ON obs.a = pred.a AND obs.c = pred.c
         ORDER BY a, c""",
    "q235_cusum_drift" ->
      """WITH hr AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                            count(*) AS x,
                            row_number() OVER (PARTITION BY event_type
                              ORDER BY date_trunc('hour', ts)) AS rn
                     FROM events GROUP BY 1, 2),
            base AS (SELECT event_type, sum(x) AS sum24,
                            count(*) AS n24
                     FROM hr WHERE rn <= 24 GROUP BY 1),
            dev AS (SELECT hr.event_type, hr.hr,
                           x * n24 - sum24 AS dev, sum24
                    FROM hr JOIN base ON hr.event_type = base.event_type
                    WHERE rn > 24),
            pre AS (SELECT event_type, hr, sum24,
                           sum(dev) OVER w AS prefix
                    FROM dev
                    WINDOW w AS (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            cum AS (SELECT event_type, hr, sum24, prefix,
                           least(0, min(prefix) OVER w) AS lo
                    FROM pre
                    WINDOW w AS (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            s AS (SELECT event_type, hr,
                         prefix - lo AS s,
                         CASE WHEN prefix - lo >= 3 * sum24 THEN 1
                              ELSE 0 END AS flag
                  FROM cum)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
                CAST(sum(flag) AS BIGINT) AS n_flagged,
                CAST(max(s) AS BIGINT) AS peak_s,
                min(CASE WHEN flag = 1 THEN hr END) AS first_breach_hr
         FROM s GROUP BY 1 ORDER BY event_type""",
    "q237_join_size_estimate" -> {
      def cell(i: Int) =
        s"('0x' || substr(md5('$i:' || CAST(user_id AS VARCHAR)), 1, 8))" +
          s"::BIGINT % 1024"
      s"""WITH cnt AS (SELECT event_id % 2 AS side, user_id,
                              count(*) AS c,
                              ${cell(0)} AS cell0, ${cell(1)} AS cell1,
                              ${cell(2)} AS cell2, ${cell(3)} AS cell3
                       FROM events GROUP BY 1, 2),
              exact AS (SELECT sum(a.c * b.c) AS exact_size
                        FROM cnt a JOIN cnt b ON a.user_id = b.user_id
                        WHERE a.side = 0 AND b.side = 1),
              cells AS (SELECT side, 0 AS row, cell0 AS cell, c FROM cnt
                        UNION ALL SELECT side, 1, cell1, c FROM cnt
                        UNION ALL SELECT side, 2, cell2, c FROM cnt
                        UNION ALL SELECT side, 3, cell3, c FROM cnt),
              sk AS (SELECT side, row, cell, sum(c) AS v FROM cells
                     GROUP BY 1, 2, 3),
              ip AS (SELECT a.row, sum(a.v * b.v) AS ip
                     FROM sk a JOIN sk b
                       ON a.row = b.row AND a.cell = b.cell
                     WHERE a.side = 0 AND b.side = 1
                     GROUP BY 1),
              est AS (SELECT min(ip) AS est FROM ip)
         SELECT CAST(exact_size AS BIGINT) AS exact_size,
                CAST(est AS BIGINT) AS est,
                CAST((2 * (est - exact_size) * 10000 + exact_size)
                     // (2 * exact_size) AS BIGINT) AS over_bp
         FROM est, exact"""
    },
    "q231_benford_digits" ->
      """WITH cents AS (SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100
                                 AS BIGINT) AS cents
                        FROM events),
              d AS (SELECT cents // CAST(10 ** (length(CAST(cents
                             AS VARCHAR)) - 1) AS BIGINT) AS digit
                    FROM cents WHERE cents > 0),
              tot AS (SELECT count(*) AS nn FROM d),
              exp AS (SELECT unnest(range(1, 10)) AS digit,
                             unnest([3010, 1761, 1249, 969, 792, 669,
                                     580, 512, 458]) AS benford_bp)
         SELECT d.digit, CAST(count(*) AS BIGINT) AS n,
                CAST((2 * count(*) * 10000 + nn) // (2 * nn) AS BIGINT)
                  AS obs_bp,
                CAST(benford_bp AS BIGINT) AS benford_bp,
                CAST(abs((2 * count(*) * 10000 + nn) // (2 * nn)
                         - benford_bp) AS BIGINT) AS gap_bp
         FROM d JOIN exp ON d.digit = exp.digit
         CROSS JOIN tot
         GROUP BY d.digit, benford_bp, nn
         ORDER BY d.digit""",

    "q248_concurrency_sweep" ->
      """WITH t AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                           lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_us
                    FROM events),
              s AS (SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
                                            OR us - prev_us >= 1800000000
                                       THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS sess_id
                    FROM t),
              sess AS (SELECT user_id, sess_id, min(us) AS a, max(us) AS b
                       FROM s GROUP BY 1, 2),
              bd AS (SELECT us, CAST(sum(st) AS BIGINT) AS n_start,
                            CAST(sum(1 - st) AS BIGINT) AS n_end
                     FROM (SELECT a AS us, 1 AS st FROM sess
                           UNION ALL
                           SELECT b AS us, 0 AS st FROM sess)
                     GROUP BY us),
              c AS (SELECT us,
                           CAST(sum(n_start - n_end) OVER
                             (ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) + n_end AS BIGINT) AS peak
                    FROM bd),
              m AS (SELECT max(peak) AS peak_n FROM c)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
                CAST(peak_n AS BIGINT) AS peak_n,
                make_timestamp((SELECT min(us) FROM c, m
                                WHERE peak = peak_n)) AS peak_ts
         FROM m""",

    "q252_sequence_motif" ->
      """WITH t AS (SELECT user_id, event_id, ts, event_type,
                           epoch_us(ts) AS us,
                           lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_us
                    FROM events),
              s AS (SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
                                            OR us - prev_us >= 1800000000
                                       THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS sess_id
                    FROM t),
              q AS (SELECT user_id, sess_id,
                           string_agg(substr(event_type, 1, 1), ''
                             ORDER BY us, event_id) AS seq
                    FROM s GROUP BY 1, 2),
              h AS (SELECT CASE WHEN regexp_matches(seq, 'vc.*p')
                                THEN 1 ELSE 0 END AS hit
                    FROM q)
         SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(hit) AS BIGINT) AS n_matched,
                CAST((2 * sum(hit) * 10000 + count(*)) // (2 * count(*))
                     AS BIGINT) AS match_bp
         FROM h""",

    "q263_debounce" ->
      """WITH t AS (SELECT event_type, epoch_us(ts) AS us,
                           lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS prev_us
                    FROM events),
              f AS (SELECT event_type,
                           CASE WHEN prev_us IS NULL
                                  OR us - prev_us >= 1000000
                                THEN 1 ELSE 0 END AS head
                    FROM t)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
                CAST(sum(head) AS BIGINT) AS n_kept,
                CAST((2 * (count(*) - sum(head)) * 10000 + count(*))
                     // (2 * count(*)) AS BIGINT) AS collapsed_bp
         FROM f GROUP BY event_type ORDER BY event_type""",

    "q270_forward_asof" ->
      """WITH e AS (SELECT event_id, user_id, ts,
                           CASE WHEN event_type = 'error' THEN 1 ELSE 0
                           END AS is_e
                    FROM events
                    WHERE event_type IN ('purchase', 'error')),
              w AS (SELECT *,
                           min(CASE WHEN is_e = 1 THEN ts END) OVER
                             (PARTITION BY user_id
                              ORDER BY ts, is_e, event_id
                              ROWS BETWEEN CURRENT ROW
                                AND UNBOUNDED FOLLOWING) AS next_err_ts
                    FROM e)
         SELECT event_id, user_id, next_err_ts,
                CAST(epoch_us(next_err_ts) - epoch_us(ts) AS BIGINT)
                  AS gap_us
         FROM w WHERE is_e = 0 ORDER BY event_id""",

    "q272_conversion_latency" ->
      """WITH f AS (SELECT user_id,
                           min(CASE WHEN event_type = 'view'
                               THEN epoch_us(ts) END) AS v_us,
                           min(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END) AS p_us
                    FROM events
                    WHERE event_type IN ('view', 'purchase')
                    GROUP BY user_id
                    HAVING min(CASE WHEN event_type = 'view'
                               THEN epoch_us(ts) END) IS NOT NULL),
              lat AS (SELECT (p_us - v_us) // 1000000 AS lat_s,
                             row_number() OVER
                               (ORDER BY (p_us - v_us) // 1000000) AS rn
                      FROM f
                      WHERE p_us IS NOT NULL AND p_us > v_us),
              nn AS (SELECT count(*) AS nc FROM lat),
              med AS (SELECT lat_s AS median_lat_s FROM lat, nn
                      WHERE rn = (nc + 1) // 2),
              p90 AS (SELECT lat_s AS p90_lat_s FROM lat, nn
                      WHERE rn = (9 * nc + 9) // 10),
              tot AS (SELECT count(*) AS n_viewers,
                             sum(CASE WHEN p_us IS NOT NULL
                                       AND p_us > v_us
                                      THEN 1 ELSE 0 END) AS n_converted
                      FROM f)
         SELECT CAST(n_viewers AS BIGINT) AS n_viewers,
                CAST(n_converted AS BIGINT) AS n_converted,
                CAST((2 * n_converted * 10000 + n_viewers)
                     // (2 * n_viewers) AS BIGINT) AS conv_bp,
                CAST(median_lat_s AS BIGINT) AS median_lat_s,
                CAST(p90_lat_s AS BIGINT) AS p90_lat_s
         FROM tot, med, p90""",

    "q273_rolling_active_users" ->
      """WITH ph AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 3600000000 AS h
                     FROM events),
              g AS (SELECT user_id, h,
                           lag(h) OVER (PARTITION BY user_id
                                        ORDER BY h) AS prev_h
                    FROM ph),
              m AS (SELECT user_id, h,
                           CAST(sum(CASE WHEN prev_h IS NULL
                                          OR h - prev_h > 23
                                     THEN 1 ELSE 0 END) OVER
                             (PARTITION BY user_id ORDER BY h
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS ep
                    FROM g),
              eps AS (SELECT user_id, ep, min(h) AS a, max(h) + 23 AS b
                      FROM m GROUP BY 1, 2),
              bd AS (SELECT h, CAST(sum(dl) AS BIGINT) AS net
                     FROM (SELECT a AS h, 1 AS dl FROM eps
                           UNION ALL SELECT b + 1, -1 FROM eps)
                     GROUP BY h),
              lvl AS (SELECT h,
                             CAST(sum(net) OVER (ORDER BY h
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS active
                      FROM bd),
              mx AS (SELECT max(active) AS peak_active FROM lvl),
              stats AS (SELECT count(DISTINCT user_id) AS n_users,
                               count(*) AS n_episodes,
                               sum(b - a + 1) AS user_hours
                        FROM eps)
         SELECT CAST(n_users AS BIGINT) AS n_users,
                CAST(n_episodes AS BIGINT) AS n_episodes,
                CAST(user_hours AS BIGINT) AS user_hours,
                CAST(peak_active AS BIGINT) AS peak_active,
                make_timestamp((SELECT min(h) FROM lvl, mx
                                WHERE active = peak_active)
                               * 3600000000) AS peak_hr
         FROM stats, mx""",

    "q274_sql_pivot" ->
      """SELECT date_trunc('hour', ts) AS hr,
                count(*) FILTER (WHERE event_type = 'click') AS n_click,
                count(*) FILTER (WHERE event_type = 'error') AS n_error,
                count(*) FILTER (WHERE event_type = 'purchase')
                  AS n_purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                count(*) FILTER (WHERE event_type = 'view') AS n_view
         FROM events GROUP BY 1 ORDER BY hr""",

    "q278_latency_percentiles" ->
      """WITH b AS (SELECT date_trunc('hour', ts) AS hr, event_id,
                           CAST(CAST(value AS DECIMAL(12,2)) * 100
                                AS BIGINT) AS cents
                    FROM events),
              r AS (SELECT hr, cents,
                           row_number() OVER (PARTITION BY hr
                             ORDER BY cents, event_id) AS rk,
                           count(*) OVER (PARTITION BY hr) AS cnt
                    FROM b)
         SELECT hr, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN rk = (cnt + 1) // 2 THEN cents
                         ELSE 0 END) AS BIGINT) AS p50_c,
                CAST(sum(CASE WHEN rk = (9 * cnt + 9) // 10 THEN cents
                         ELSE 0 END) AS BIGINT) AS p90_c,
                CAST(sum(CASE WHEN rk = (99 * cnt + 99) // 100 THEN cents
                         ELSE 0 END) AS BIGINT) AS p99_c
         FROM r GROUP BY hr ORDER BY hr""",

    "q280_churn_cohort" ->
      """WITH pres AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 604800000000 AS wk
                       FROM events),
              mx AS (SELECT max(wk) AS maxwk FROM pres),
              l AS (SELECT user_id, wk,
                           lead(wk) OVER (PARTITION BY user_id
                                          ORDER BY wk) AS next_wk
                    FROM pres),
              f AS (SELECT wk,
                           CASE WHEN next_wk IS NULL OR next_wk > wk + 1
                                THEN 1 ELSE 0 END AS churned
                    FROM l, mx WHERE wk < maxwk)
         SELECT CAST(wk AS BIGINT) AS wk,
                CAST(count(*) AS BIGINT) AS n_active,
                CAST(sum(churned) AS BIGINT) AS n_churned,
                CAST((2 * sum(churned) * 10000 + count(*))
                     // (2 * count(*)) AS BIGINT) AS churn_bp
         FROM f GROUP BY wk ORDER BY wk""",

    "q281_stream_foreachbatch" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(2 * count(*) AS BIGINT) AS n_naive
         FROM events GROUP BY event_type ORDER BY event_type""",

    // q374: identical lattice walk — only the integer-range table
    // function's spelling differs by dialect.
    "q374_shapley_attribution" ->
      """WITH fp AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS fpts
           FROM events GROUP BY user_id),
         ch AS (
           SELECT e.user_id,
                  CAST(coalesce(bit_or(
                    CASE WHEN e.event_type <> 'purchase'
                          AND (f.fpts IS NULL OR e.ts < f.fpts)
                         THEN CASE e.event_type
                              WHEN 'click' THEN 1 WHEN 'error' THEN 2
                              WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                              END END), 0) AS BIGINT) AS mask,
                  max(CASE WHEN f.fpts IS NOT NULL THEN 1 ELSE 0 END)
                    AS conv
           FROM events e JOIN fp f ON e.user_id = f.user_id
           GROUP BY e.user_id),
         mc AS (SELECT mask, CAST(count_if(conv = 1) AS BIGINT)
                  AS n_conv
                FROM ch GROUP BY mask),
         subsets AS (SELECT CAST(unnest(generate_series(0, 15))
                            AS BIGINT) AS s),
         v AS (SELECT s, CAST(coalesce(sum(n_conv), 0) AS BIGINT) AS v
               FROM subsets LEFT JOIN mc ON (mask & s) = mask
               GROUP BY s),
         chans(c, channel) AS (VALUES
           (1, 'click'), (2, 'error'), (4, 'signup'), (8, 'view')),
         terms AS (
           SELECT ch.channel,
                  CASE bit_count(sub.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                       WHEN 2 THEN 2 ELSE 6 END AS w,
                  vc.v - vs.v AS delta
           FROM chans ch JOIN subsets sub ON (sub.s & ch.c) = 0
           JOIN v vs ON vs.s = sub.s
           JOIN v vc ON vc.s = (sub.s | ch.c))
         SELECT channel, CAST(sum(w * delta) AS BIGINT) AS phi_scaled,
                round(CAST(sum(w * delta) AS DOUBLE) / 24, 6) AS phi
         FROM terms GROUP BY channel ORDER BY channel""",

    // q419: identical gaps, identical two-corner D statistic.
    "q419_exponential_fit" ->
      """WITH g AS (
           SELECT epoch_us(ts) // 1000000
                  - lag(epoch_us(ts) // 1000000)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS gap
           FROM events),
         x AS (SELECT CAST(gap AS DOUBLE) AS gap FROM g
               WHERE gap IS NOT NULL AND gap > 0),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      avg(gap) AS mean_gap FROM x),
         r AS (SELECT gap, row_number() OVER (ORDER BY gap) AS i,
                      n, mean_gap
               FROM x CROSS JOIN m),
         dev AS (SELECT greatest(
                   abs(CAST(i AS DOUBLE)/n
                       - (1 - exp(-gap/mean_gap))),
                   abs(CAST(i-1 AS DOUBLE)/n
                       - (1 - exp(-gap/mean_gap)))) AS dv
                 FROM r)
         SELECT (SELECT n FROM m) AS n_gaps,
                round((SELECT mean_gap FROM m), 2) AS mean_gap_s,
                round(max(dv), 6) AS ks_stat,
                round(1.36 / sqrt((SELECT n FROM m)), 6)
                  AS ks_crit_05
         FROM dev""",

    // q421: the oracle spells the endpoint explode as a UNION and
    // recomputes raw seconds the same Σ(−dd·t) way.
    "q421_interval_union" ->
      """WITH s AS (
           SELECT user_id, epoch_us(ts) // 1000000 AS st,
                  epoch_us(ts) // 1000000 + 1800
                    + CAST(('0x' || substr(md5('d#' ||
                        CAST(event_id AS VARCHAR)), 1, 4))
                        AS BIGINT) % 5400 AS en
           FROM events),
         pts AS (SELECT user_id, st AS t, 1 AS dd FROM s
                 UNION ALL SELECT user_id, en, -1 FROM s),
         sw AS (SELECT user_id, t, dd,
                  sum(dd) OVER (PARTITION BY user_id
                    ORDER BY t, dd DESC ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS depth,
                  lead(t) OVER (PARTITION BY user_id
                    ORDER BY t, dd DESC) AS nxt
                FROM pts)
         SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(sum(CASE WHEN depth > 0 AND nxt IS NOT NULL
                          THEN nxt - t ELSE 0 END) AS BIGINT)
                  AS covered_seconds,
                CAST(sum(-dd * t) AS BIGINT) AS raw_seconds
         FROM sw""",

    // q446: same ⌈⌉ identities; // = DIV on positives.
    "q446_skew_salt_planner" ->
      """WITH counts AS (SELECT user_id, count(*) AS c FROM events
                         GROUP BY 1),
              x AS (SELECT user_id, c,
                           (sum(c) OVER () + 31) // 32 AS t
                    FROM counts),
              y AS (SELECT c, t, (c + t - 1) // t AS salt FROM x),
              a AS (SELECT count(*) AS n_keys, max(t) AS target_rows,
                           count_if(salt > 1) AS n_hot_keys,
                           max(c) AS max_key_rows,
                           max((c + salt - 1) // salt)
                             AS max_after_split,
                           sum(salt - 1) AS extra_buckets
                    FROM y)
         SELECT CAST(n_keys AS BIGINT) AS n_keys,
                CAST(target_rows AS BIGINT) AS target_rows,
                CAST(n_hot_keys AS BIGINT) AS n_hot_keys,
                CAST(max_key_rows AS BIGINT) AS max_key_rows,
                CAST(max_after_split AS BIGINT) AS max_after_split,
                CAST(extra_buckets AS BIGINT) AS extra_buckets,
                CAST((2 * max_key_rows * 100 + target_rows)
                     // (2 * target_rows) AS BIGINT)
                  AS skew_x100_before,
                CAST((2 * max_after_split * 100 + target_rows)
                     // (2 * target_rows) AS BIGINT)
                  AS skew_x100_after
         FROM a""",

    // q448: identical staged URLs and the same canonicalizer in
    // DuckDB string/list algebra.
    "q448_url_canonical_dedup" ->
      """WITH u AS (
           SELECT event_id,
                  (['example.com','EXAMPLE.com','Example.Com',
                    'shop.example.net'])
                  [('0x' || substr(md5('h#'
                    || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                    % 4 + 1] AS host,
                  '/p/' || CAST(event_id % 50 AS VARCHAR) AS path,
                  'id=' || CAST(event_id % 97 AS VARCHAR) AS p_id,
                  CASE WHEN ('0x' || substr(md5('u#'
                         || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                         % 3 > 0
                       THEN 'utm_source=s' || CAST(('0x'
                         || substr(md5('u#'
                         || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                         % 3 AS VARCHAR)
                       ELSE NULL END AS p_utm,
                  ('0x' || substr(md5('o#'
                    || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                    % 2 = 0 AS id_first,
                  CASE WHEN ('0x' || substr(md5('f#'
                         || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                         % 2 = 0
                       THEN '#s' || CAST(event_id % 3 AS VARCHAR)
                       ELSE '' END AS frag
           FROM events),
         raw AS (SELECT 'https://' || host || path || '?' ||
                        CASE WHEN p_utm IS NULL THEN p_id
                             WHEN id_first THEN p_id || '&' || p_utm
                             ELSE p_utm || '&' || p_id END
                        || frag AS url
                 FROM u),
         c1 AS (SELECT url,
                       split_part(split_part(split_part(url, '://',
                         2), '/', 1), '#', 1) AS host,
                       split_part(split_part(url, '?', 2), '#', 1)
                         AS qs
                FROM raw),
         c2 AS (SELECT url, lower(host) AS chost,
                       substr(split_part(url, '?', 1),
                         9 + length(host)) AS path,
                       array_to_string(list_sort(list_filter(
                         string_split(qs, '&'),
                         x -> substr(x, 1, 4) <> 'utm_')), '&') AS cq
                FROM c1),
         c3 AS (SELECT url, chost,
                       'https://' || chost || path ||
                       CASE WHEN cq <> '' THEN '?' || cq ELSE ''
                       END AS curl
                FROM c2)
         SELECT chost, CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT url) AS BIGINT) AS n_raw_urls,
                CAST(count(DISTINCT curl) AS BIGINT) AS n_canon_urls,
                CAST((2 * (count(DISTINCT url) - count(DISTINCT curl))
                      * 10000 + count(DISTINCT url))
                     // (2 * count(DISTINCT url)) AS BIGINT)
                  AS collapse_bp
         FROM c3 GROUP BY 1 ORDER BY 1""",

    // q453: same staged hosts, same suffix predicate.
    "q453_domain_blocklist_gate" ->
      """WITH h AS (SELECT lower((['example.com','EXAMPLE.com',
                      'Example.Com','shop.example.net'])
                      [('0x' || substr(md5('h#'
                        || CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
                        % 4 + 1]) AS chost
                    FROM events),
              hc AS (SELECT chost, count(*) AS n_events FROM h
                     GROUP BY 1),
              bl AS (SELECT * FROM (VALUES ('example.net'),
                     ('badsite.org')) t(suffix))
         SELECT chost, CAST(n_events AS BIGINT) AS n_events,
                suffix AS matched_suffix,
                suffix IS NOT NULL AS blocked
         FROM hc LEFT JOIN bl
           ON hc.chost = bl.suffix
           OR hc.chost LIKE '%.' || bl.suffix
         ORDER BY chost""",

    // q460: same looks, cleared-denominator z², literal OBF bounds.
    "q460_group_sequential" ->
      """WITH e AS (SELECT event_id, ts,
                           ('0x' || substr(md5('gs#'
                             || CAST(user_id AS VARCHAR)), 1, 4))
                             ::BIGINT % 2 AS arm,
                           CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END AS conv
                    FROM events),
         lk AS (SELECT arm, conv,
                       ntile(3) OVER (ORDER BY ts, event_id) AS look
                FROM e),
         li AS (SELECT look,
                       sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                         AS na_i,
                       sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                         AS nb_i,
                       sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                         AS xa_i,
                       sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                         AS xb_i
                FROM lk GROUP BY 1),
         cu AS (SELECT look,
                       sum(na_i) OVER w AS na, sum(nb_i) OVER w AS nb,
                       sum(xa_i) OVER w AS xa, sum(xb_i) OVER w AS xb
                FROM li
                WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW)),
         z AS (SELECT look, na, nb, xa, xb,
                      (2 * CAST(xa * nb - xb * na AS HUGEINT)
                        * (xa * nb - xb * na) * (na + nb) * 1000000
                        + CAST(na AS HUGEINT) * nb * (xa + xb)
                          * (na + nb - xa - xb))
                      // (2 * CAST(na AS HUGEINT) * nb * (xa + xb)
                          * (na + nb - xa - xb)) AS z2_e6,
                      ([12047841, 6022116, 4016016])[look]
                        AS bound_z2_e6
               FROM cu)
         SELECT CAST(look AS BIGINT) AS look, CAST(na AS BIGINT)
                  AS na,
                CAST(nb AS BIGINT) AS nb, CAST(xa AS BIGINT) AS xa,
                CAST(xb AS BIGINT) AS xb,
                CAST(z2_e6 AS BIGINT) AS z2_e6,
                CAST(bound_z2_e6 AS BIGINT) AS bound_z2_e6,
                z2_e6 >= bound_z2_e6 AS crossed
         FROM z ORDER BY look""",

    // q473: same watermark tiers and record-size proxy.
    "q473_data_tiering_plan" ->
      """WITH usr AS (SELECT user_id, count(*) AS n_ev,
                             max(epoch_us(ts)) AS last_us,
                             sum(40 + CAST(len(event_type) AS BIGINT)
                               + CAST(len(props) AS BIGINT)) AS bytes
                      FROM events GROUP BY 1),
              mx AS (SELECT max(last_us) AS mx_us FROM usr),
              t AS (SELECT n_ev, bytes,
                           CASE WHEN mx_us - last_us
                                  <= 6 * 3600000000 THEN 'a_hot'
                                WHEN mx_us - last_us
                                  <= 24 * 3600000000 THEN 'b_warm'
                                ELSE 'c_cold' END AS tier
                    FROM usr CROSS JOIN mx),
              g AS (SELECT tier, count(*) AS n_users,
                           sum(n_ev) AS n_events, sum(bytes) AS bytes
                    FROM t GROUP BY 1),
              w AS (SELECT *, sum(bytes) OVER () AS tot FROM g)
         SELECT tier, CAST(n_users AS BIGINT) AS n_users,
                CAST(n_events AS BIGINT) AS n_events,
                CAST(bytes AS BIGINT) AS bytes,
                CAST((2 * bytes * 10000 + tot) // (2 * tot)
                  AS BIGINT) AS bytes_share_bp
         FROM w ORDER BY tier""",

    // q474: same halves, same total-order ntile cut.
    "q474_segment_migration" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              mid AS (SELECT (min(us) + max(us)) // 2 AS mid
                      FROM ev),
              hh AS (SELECT user_id,
                            CASE WHEN us > mid THEN 1 ELSE 0 END
                              AS half
                     FROM ev CROSS JOIN mid),
              hn AS (SELECT user_id, half, count(*) AS n FROM hh
                     GROUP BY 1, 2),
              hq AS (SELECT user_id, half,
                            CAST(ntile(4) OVER (PARTITION BY half
                              ORDER BY n, user_id) AS BIGINT) AS qt
                     FROM hn),
              h0 AS (SELECT user_id, qt AS q_first FROM hq
                     WHERE half = 0),
              h1 AS (SELECT user_id, qt AS q_second FROM hq
                     WHERE half = 1)
         SELECT coalesce(q_first, 0) AS q_first,
                coalesce(q_second, 0) AS q_second,
                CAST(count(*) AS BIGINT) AS n_users
         FROM h0 FULL OUTER JOIN h1 USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}

/** q186's StatefulProcessor: per-user (count, max event id) in ONE named
  * ValueState handle. Both folds are order-independent and monotone, so
  * emitting the running value per batch (update mode) + a max rollup at
  * the sink reproduces the batch answer under any microbatch split — the
  * q78 determinism recipe on the new API. Production would add
  * TTLConfig / timers per state; TTL NONE here because the corpus is a
  * bounded backlog (the q78 comment's 200-day watermark reasoning). */
class UserFoldProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("fold",
      org.apache.spark.sql.Encoders.product[(Long, Long)],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      inputRows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, mx) =
      if (st.exists()) st.get() else (0L, Long.MinValue)
    inputRows.foreach { case (_, eid) =>
      n += 1
      if (eid > mx) mx = eid
    }
    st.update((n, mx))
    Iterator.single((key, n, mx))
  }
}
