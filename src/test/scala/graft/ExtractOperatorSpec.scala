package graft

import graft.extract.Processor
import graft.model.Page
import graft.plans.ExtractOperator
import graft.synth.PageGen
import org.apache.spark.sql.functions._

/** GraftExtract as a first-class Catalyst operator: result parity with
  * the typed mapPartitions path, EXPLAIN visibility, and the
  * column-pruning win (unused `text` column never scanned).
  */
class ExtractOperatorSpec extends SparkSuite {

  test("operator output == typed mapPartitions kernel output") {
    import spark.implicits._
    val dir = tmpDir("op_pages")
    PageGen.generate(spark, 400).toDF().repartition(3)
      .write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)

    val viaOp = ExtractOperator.extract(pages, "balanced")
      .select("url", "pdf_type", "text", "word_count", "extraction_method",
        "confidence", "success")
      .orderBy("url").collect()
    val viaTyped = pages.select("url", "warc_ts", "html", "text", "lang").as[Page]
      .mapPartitions { it =>
        val proc = Processor.default
        it.map(p => proc.extract(p, "balanced"))
      }
      .select("url", "pdf_type", "text", "word_count", "extraction_method",
        "confidence", "success")
      .orderBy("url").collect()
    assert(viaOp.length == 400)
    assert(viaOp.sameElements(viaTyped))
  }

  test("EXPLAIN shows the named operator and prunes the unused text column") {
    val dir = tmpDir("op_pages2")
    PageGen.generate(spark, 50).toDF().write.mode("overwrite").parquet(dir)
    val df = ExtractOperator.extract(spark.read.parquet(dir), "fast")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftExtract"), plan)
    assert(!plan.contains("!GraftExtract"), s"invalid node: $plan")
    // The scan's ReadSchema must not include the legacy text column.
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("html"))
    assert(!readSchema.contains("text:"), s"text not pruned: $readSchema")
  }

  test("operator composes with downstream relational ops") {
    val dir = tmpDir("op_pages3")
    PageGen.generate(spark, 200).toDF().write.mode("overwrite").parquet(dir)
    val stats = ExtractOperator.extract(spark.read.parquet(dir), "balanced")
      .where(col("success"))
      .groupBy("pdf_type").agg(count(lit(1)).as("n"), sum("word_count").as("words"))
      .orderBy("pdf_type").collect()
    val expected = {
      import spark.implicits._
      val proc = Processor.default
      spark.read.parquet(dir).select("url", "warc_ts", "html", "text", "lang").as[Page]
        .mapPartitions(it => it.map(p => proc.extract(p, "balanced")))
        .where(col("success")).count()
    }
    assert(stats.map(_.getLong(1)).sum == expected)
  }
}
