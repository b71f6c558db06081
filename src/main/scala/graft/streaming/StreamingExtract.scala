package graft.streaming

import graft.extract.Processor
import graft.model.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming surface of the extraction pipeline.
  *
  * The reference has no stream processing (SURVEY.md §2.9) — its async
  * job layer is batch-with-progress, which maps to ExtractJob. This
  * module is the graft-added incremental path for a continuously-fed
  * pages table: the SAME kernel runs per micro-batch, so batch and
  * streaming share one code path (`readStream` → `mapPartitions(kernel)`
  * → `writeStream`), with exactly-once parquet output via the streaming
  * checkpoint — the streaming twin of ExtractJob's bucket lineage.
  *
  * Scale notes: the kernel stage is stateless map-only (no state store);
  * watermarked windowed aggregation is used only for the metrics stream
  * where state is bounded by (window × pdf_type) cardinality.
  */
object StreamingExtract {

  /** Incremental extraction over a parquet directory source. */
  def extractStream(spark: SparkSession, inputDir: String, quality: String): DataFrame = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Page].schema)
      .parquet(inputDir)
      .as[Page]
    pages.mapPartitions { it =>
      val proc = Processor.default
      it.map(p => proc.extract(p, quality))
    }.toDF()
  }

  /** Run to completion over currently-available files (AvailableNow =
    * bounded run with streaming semantics + checkpoint resume), writing
    * extraction records as parquet.
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      checkpointDir: String,
      quality: String = "balanced"): StreamingQuery = {
    extractStream(spark, inputDir, quality)
      .select("url", "pdf_type", "total_pages", "text", "word_count",
        "extraction_method", "confidence", "success", "quality", "lang")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Per-user session accumulator for the custom-state path. */
  final case class SessionAgg(lastUs: Long, nSessions: Long, nEvents: Long)

  /** Gap-based sessionization with EXPLICIT state
    * (`mapGroupsWithState`) — the streaming twin of the batch window
    * form (queries.Relational q34). State is one tiny record per user
    * (bounded by user cardinality, not event volume); each micro-batch
    * folds its events into the running (lastTs, nSessions, nEvents) and
    * emits the updated per-user totals. Event-time timeout would evict
    * idle users in a production run; the bounded AvailableNow test run
    * keeps NoTimeout.
    */
  def sessionizeStream(
      spark: SparkSession,
      inputDir: String,
      tableName: String,
      gapUs: Long = 6L * 3600 * 1000000): StreamingQuery = {
    import spark.implicits._
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(inputDir)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"))
      .as[(Long, Long, Long)]

    def update(user: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[SessionAgg]): (Long, Long, Long) = {
      // Micro-batch rows are unordered: sort this batch's events by
      // (ts, event_id) before folding (cross-batch order is guaranteed
      // by the source's file ordering at AvailableNow granularity).
      val sorted = rows.toVector.sortBy(r => (r._2, r._3))
      val init = state.getOption.getOrElse(SessionAgg(Long.MinValue, 0L, 0L))
      val agg = sorted.foldLeft(init) { case (a, (_, us, _)) =>
        val newSession = a.lastUs == Long.MinValue || us - a.lastUs > gapUs
        SessionAgg(us, a.nSessions + (if (newSession) 1 else 0), a.nEvents + 1)
      }
      state.update(agg)
      (user, agg.nSessions, agg.nEvents)
    }

    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
      .toDF("user_id", "n_sessions", "n_events")
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One metrics row per extracted page (event time carried through the
    * kernel for windowing).
    */
  final case class StreamMetric(warc_ts: java.sql.Timestamp, pdf_type: String, word_count: Int)

  /** Streaming metrics roll-up: tumbling event-time windows over
    * warc_ts with a watermark bounding state (per-window docs and word
    * volume by pdf_type). Complete mode → in-memory table `tableName`.
    */
  def metricsStream(
      spark: SparkSession,
      inputDir: String,
      tableName: String,
      quality: String = "fast"): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Page].schema)
      .parquet(inputDir)
      .as[Page]
    pages.mapPartitions { it =>
      val proc = Processor.default
      it.map { p =>
        val r = proc.extract(p, quality)
        StreamMetric(p.warc_ts, r.pdf_type, r.word_count)
      }
    }
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 day"), col("pdf_type"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("word_count").cast("long")).as("words"))
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
