package graft

import org.apache.spark.sql.functions._
import graft.queries.QueryUtil._

/** Streaming sketch maintenance: the q82 HLL registers and q83 CMS
  * counters, folded incrementally across forced micro-batch splits,
  * must equal the one-pass batch sketches — the live form of the merge
  * properties CorpusOpsSpec proves for two-way splits. This is what
  * makes the sketches 100 TB tools: corpus statistics stay current as
  * crawl days arrive, with state bounded by the sketch size (hundreds
  * of longs), never by the corpus.
  */
class StreamingSketchSpec extends SparkSuite {

  private val src = "/root/testdata/sf0.001"

  /** Split the documents table into 3 separate parquet files so
    * maxFilesPerTrigger=1 forces at least 3 micro-batches.
    */
  private def splitInput(dir: String): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until 3).foreach(i =>
      docs.where(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("append").parquet(dir))
  }

  test("streaming HLL registers across micro-batches == one-pass batch registers, estimate == q82") {
    val in = tmpDir("hll_in")
    splitInput(in)
    graft.streaming.StreamingExtract
      .hllRegisterStream(spark, in, "hll_regs", maxFilesPerTrigger = Some(1))
      .awaitTermination()

    val streamed = spark.table("hll_regs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val batch = spark.read.parquet(s"$src/documents.parquet")
      .withColumn("toks", tokens(col("text")))
      .select(col("lang"), explode_outer(shingles3(col("toks"))).as("g"))
      .where(col("g").isNotNull)
      .select(col("lang"), md5(col("g")).as("hx"))
      .select(col("lang"),
        (conv(substring(col("hx"), 1, 2), 16, 10).cast("long") % 64).as("bucket"),
        conv(substring(col("hx"), 3, 15), 16, 10).cast("long").as("v"))
      .groupBy("lang", "bucket")
      .agg(max(when(col("v") === 0, lit(61))
        .otherwise(lit(61) - length(bin(col("v"))))).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))

    // The estimate derived from the STREAMED registers matches the
    // oracle-checked batch query q82 on the same corpus, 4dp-exact.
    val p61 = math.pow(2.0, 61)
    val streamedEst = streamed.groupBy(_._1).map { case (lang, regs) =>
      val sHit = regs.map(t => math.pow(2.0, 61 - t._3)).sum
      lang -> BigDecimal(0.709 * 4096 * p61 / (sHit + (64 - regs.length) * p61))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val q82 = SparkEntry.queries("q82_hll_distinct")(spark, src)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(streamedEst.keySet == q82.keySet)
    streamedEst.foreach { case (lang, est) =>
      assert(math.abs(est - q82(lang)) < 1e-9, s"$lang streamed $est vs q82 ${q82(lang)}")
    }
  }

  test("streaming CMS counters across micro-batches == one-pass batch counters") {
    val in = tmpDir("cms_in")
    splitInput(in)
    graft.streaming.StreamingExtract
      .cmsCounterStream(spark, in, "cms_ctrs", maxFilesPerTrigger = Some(1))
      .awaitTermination()

    val streamed = spark.table("cms_ctrs")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val batch = spark.read.parquet(s"$src/documents.parquet")
      .select(explode(tokens(col("text"))).as("term"))
      .select(posexplode(array((0 until 4).map(i =>
        conv(substring(md5(concat(lit(s"$i:"), col("term"))), 1, 7), 16, 10)
          .cast("long") % 256): _*)).as(Seq("row", "cell")))
      .groupBy("row", "cell").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
    // Conservation: total counter mass per CMS row equals the token count.
    val nTokens = spark.read.parquet(s"$src/documents.parquet")
      .select(explode(tokens(col("text"))).as("t")).count()
    streamed.groupBy(_._1).foreach { case (row, cells) =>
      assert(cells.map(_._3).sum == nTokens, s"row $row mass != $nTokens")
    }
  }
}
