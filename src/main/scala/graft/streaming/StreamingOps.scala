package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference has no streaming
  * (SURVEY.md §2.8) — every per-tensor op here is stateless per row, so the
  * batch Columns (zoom, pointwise, minhash, quality, ...) compose onto
  * `readStream` unchanged; this module adds the stateful pieces a
  * training-data ingest pipeline needs: watermarked windowed aggregation,
  * session windows, and streaming dedup.
  */
object StreamingOps {

  /** Stream-static AS-OF enrichment: each stream row gains the payload of
    * the LATEST dimension row for its key at-or-before its time — the
    * streaming form of [[graft.operators.AsOfJoin]]'s backward direction
    * (greatest dimTs <= ts, ties to max payload), and the composition a
    * feature-serving ingest runs continuously (enrich events with the
    * freshest preceding account state).
    *
    * Scale/streaming shape: the dimension is SMALL BY CONTRACT (the
    * quantizer convention — it is collected once, time-sorted per key,
    * and broadcast); each stream row then binary-searches row-locally, so
    * the op is STATELESS — it composes onto any source in any output mode
    * with no state store, no watermark coupling, and no stream-stream
    * join restrictions. A growing dimension belongs in a stream-stream
    * interval join instead. Key/time/payload are integral (times are the
    * repo's ns-long convention; quantize FP payloads first). Rows with no
    * at-or-before match get null. */
  /** Hard cap on dimension rows collected to the driver — the
    * [[graft.operators.ScatteredInterp.MaxDriverPoints]] house pattern:
    * the broadcast-sized contract is ENFORCED, not assumed, so an
    * unexpectedly large dimension fails loudly instead of OOMing the
    * driver (r8 verdict item 4). */
  val MaxDimRows: Int = 2000000

  def asOfEnrich(stream: DataFrame, dim: DataFrame,
                 keyCol: String, tsCol: String,
                 dimKey: String, dimTs: String, dimPayload: String,
                 outCol: String): DataFrame = {
    val s = dim.sparkSession
    import s.implicits._
    val dimRows = dim
      .select(col(dimKey).cast("long"), col(dimTs).cast("long"),
        col(dimPayload).cast("long"))
      .as[(Long, Long, Long)].limit(MaxDimRows + 1).collect()
    require(dimRows.length <= MaxDimRows,
      s"asOfEnrich dimension exceeds $MaxDimRows rows — it is collected and " +
        "broadcast by contract; use a stream-stream interval join for a " +
        "dimension this size")
    val byKey: Map[Long, (Array[Long], Array[Long])] = dimRows
      .groupBy(_._1).map { case (k, rs) =>
        // sorted by (ts, payload): the rightmost index with ts <= t is the
        // latest row, and among equal-ts rows the max payload — exactly
        // AsOfJoin's backward tie rule
        val sorted = rs.sortBy(r => (r._2, r._3))
        k -> (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      }
    val bc = s.sparkContext.broadcast(byKey)
    val look = udf { (k: Long, t: Long) =>
      bc.value.get(k).flatMap { case (ts, pay) =>
        var lo = 0; var hi = ts.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        if (ans >= 0) Some(pay(ans)) else None
      }
    }
    stream.withColumn(outCol, look(col(keyCol).cast("long"), col(tsCol).cast("long")))
  }

  /** Tumbling-window event counts with late-data handling. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Session windows (gap-based), the streaming form of q_sessionize. */
  def sessionized(events: DataFrame, tsCol: String, keyCol: String,
                  gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming EXACT dedup by content hash — the streaming form of
    * q_dedup_exact. Exact global dedup necessarily keeps one state row per
    * distinct key for the stream's lifetime (`dropDuplicates` state is NOT
    * purged by the watermark unless the event-time column is part of the
    * key set — the rate-source soak measured it growing without bound).
    * Use this only when the distinct-key cardinality is bounded; for an
    * unbounded stream use [[dedupedWithinWatermark]]. */
  def deduped(docs: DataFrame, tsCol: String, textCol: String, watermark: String): DataFrame =
    docs
      .withColumn("h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("h")

  /** Bounded-state streaming dedup: duplicates are only collapsed when they
    * arrive within the watermark delay of each other, and state older than
    * the watermark is purged — the production shape for an unbounded
    * ingest stream (state plateaus at ~rate × delay; verified flat by
    * StreamingSoakSpec over 100+ rate-source micro-batches). */
  def dedupedWithinWatermark(docs: DataFrame, tsCol: String, textCol: String,
                             watermark: String): DataFrame =
    docs
      .withColumn("h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")

  /** Per-key running profile carried by [[statefulUserAgg]]: every field is
    * an order-independent accumulator (counts and maxes), so the profile is
    * identical no matter how the stream batches or orders a user's rows. */
  final case class UserProfile(n: Long, nPurchase: Long, maxValue: Double, lastTs: Long)

  /** Arbitrary-custom-state streaming aggregation via
    * `KeyValueGroupedDataset.mapGroupsWithState` — the API for state no
    * built-in aggregate expresses (here a running per-user profile; the
    * same skeleton carries decaying counters, ML feature state, fraud
    * scores...). State is ONE fixed-size row per active key — bounded by
    * key cardinality, not stream length — and every accumulator is
    * order-independent, so emitted profiles are deterministic under any
    * micro-batch split: each batch emits each touched key's CURRENT
    * profile (update mode), and the final emission per key equals the
    * batch aggregate. Callers reduce multi-batch drains with
    * [[latestProfiles]] (monotone fields → max picks the final state). */
  def statefulUserAgg(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("user_id").cast("long"), col("ts").cast("long"),
      col("event_type").cast("string"), col("value").cast("double"))
      .as[(Long, Long, String, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserProfile, (Long, Long, Long, Double, Long)](
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var s = state.getOption.getOrElse(UserProfile(0L, 0L, Double.NegativeInfinity, Long.MinValue))
        rows.foreach { case (_, ts, et, v) =>
          s = UserProfile(s.n + 1, s.nPurchase + (if (et == "purchase") 1L else 0L),
            math.max(s.maxValue, v), math.max(s.lastTs, ts))
        }
        state.update(s)
        (uid, s.n, s.nPurchase, s.maxValue, s.lastTs)
      }
      .toDF("user_id", "n_events", "n_purchases", "max_value", "last_ts")
  }

  /** Collapse an update-mode multi-batch drain of [[statefulUserAgg]] to
    * each key's final profile: all fields are monotone non-decreasing, so
    * per-key max IS the last emission. */
  def latestProfiles(drained: DataFrame): DataFrame =
    drained.groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_purchases").as("n_purchases"),
        max("max_value").as("max_value"), max("last_ts").as("last_ts"))

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val jvmToken = java.util.UUID.randomUUID().toString.take(8)

  /** Drains a streaming DataFrame with `Trigger.AvailableNow` into a memory
    * sink and returns the result as a batch DataFrame. This is the
    * verification harness for the streaming surface: AvailableNow processes
    * everything currently in the source and terminates, so the result is
    * comparable to the equivalent batch query — which is exactly what the
    * declared-query oracle gate needs. The memory sink is driver-local and
    * used only because the compared result is small (a windowed rollup);
    * production pipelines point the same plan at a file/Kafka sink.
    *
    * `outputMode` is "complete" for plain/tumbling-window aggregations;
    * session windows require append + watermark (Spark disallows complete
    * for merging windows), in which case only windows closed by the final
    * watermark are emitted — the oracle mirrors that closure rule.
    */
  def runAvailableNow(stream: DataFrame, name: String,
                      outputMode: String = "complete",
                      noDataBatch: Boolean = true): DataFrame = {
    val spark = stream.sparkSession
    val table = s"${name}_${runSeq.incrementAndGet()}"
    // Stateful operators allocate one state-store instance per shuffle
    // partition per micro-batch; the verification streams carry small
    // state, so 4 partitions cuts fixed store setup 8x vs the session's
    // batch setting. Production sizing is data-dependent — this scoped
    // override applies only while the drain runs (the partition count is
    // pinned into the query's checkpoint at first batch).
    val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // complete/update drains emit their full/touched result in the data
    // batch itself; the trailing no-data micro-batch exists to advance the
    // watermark so APPEND-mode aggregations can finalize — skip it for the
    // modes that don't need it (one full state round saved per drain).
    // `noDataBatch = false` lets an APPEND-mode caller opt out too when
    // its rows provably don't depend on the final watermark advance (the
    // inner stream-stream join: matches emit in the data batch; the
    // trailing batch only evicts state the drain is about to discard).
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    if (outputMode != "append" || !noDataBatch)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // memory-sink drains are a verification harness: their checkpoint is
    // throwaway, so keep the per-batch offset/commit/state-delta writes
    // on RAM-backed scratch when available (each micro-batch fsyncs
    // several small files; on ext4 that is the drain's floor). The path
    // carries a per-JVM token — a stale checkpoint from a previous run
    // would otherwise be RESUMED (offsets committed, nothing processed,
    // silently empty results) — and is deleted in the finally block, so a
    // FAILED drain can't strand its state files on /dev/shm for the
    // host's uptime. A real sink passes its own durable
    // checkpointLocation and never hits this.
    val ckpt = graft.core.ScratchDir.shm("graft-ckpt").map(d => s"$d/$jvmToken/$table")
    try {
      val w0 = stream.writeStream
        .format("memory")
        .queryName(table)
        .outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = ckpt.fold(w0)(c => w0.option("checkpointLocation", c)).start()
      q.awaitTermination()
      // drain-floor instrument (r11, opt-in): per-micro-batch duration
      // breakdown from StreamingQueryProgress, so "where does the ~1 s
      // per drain go" is answerable from a log instead of argued —
      // addBatch vs triggerExecution vs state-store commit etc.
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG")) {
        q.recentProgress.foreach { p =>
          System.err.println(s"[drain] $table batch=${p.batchId} " +
            s"durationMs=${p.durationMs} rows=${p.numInputRows} " +
            s"stateOps=${p.stateOperators.length}")
        }
      }
    } finally {
      ckpt.foreach { c =>
        try {
          val root = java.nio.file.Paths.get(c)
          // Files.walk holds a directory stream open until closed — scope
          // it with Using so the fd is released even when deletion throws
          scala.util.Using.resource(java.nio.file.Files.walk(root)) { walk =>
            walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
          }
        } catch { case _: Throwable => () }
      }
      prev match {
        case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
        case None => spark.conf.unset("spark.sql.shuffle.partitions")
      }
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }
    spark.table(table)
  }
}
