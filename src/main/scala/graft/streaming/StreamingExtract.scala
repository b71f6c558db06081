package graft.streaming

import graft.extract.Processor
import graft.model.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
