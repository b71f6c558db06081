package graft

import graft.app.{ExtractJob, TwoPass}
import graft.model.KernelPage
import graft.synth.PageGen
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** K6 two-pass cascade (app.TwoPass): the chained-kernel shape — pass-1
  * output selects pass-2's input; merge keeps the better extraction.
  */
class TwoPassSpec extends SparkSuite {

  private def kernelPages(n: Long): Dataset[KernelPage] = {
    import spark.implicits._
    PageGen.generate(spark, n).map(p => KernelPage(p.url, p.html, p.lang))
  }

  test("two-pass: pass 2 runs exactly on the flagged subset and never regresses a doc") {
    val kp = kernelPages(600).cache()
    val pass1 = ExtractJob.extractKernel(kp, "fast")
      .select("url", "word_count", "success", "confidence").cache()
    val flagged = pass1.where(TwoPass.needsSecondPass)
      .select("url").collect().map(_.getString(0)).toSet
    assert(flagged.nonEmpty, "corpus must flag some docs for the second pass")
    assert(flagged.size < 600, "cascade must not flag everything")

    val merged = TwoPass.extract(kp).cache()
    // One row per url, url set preserved.
    assert(merged.count() == 600)
    assert(merged.select("url").distinct().count() == 600)
    // pass=2 rows appear only for flagged urls.
    val pass2Urls = merged.where(col("pass") === 2)
      .select("url").collect().map(_.getString(0)).toSet
    assert(pass2Urls.subsetOf(flagged), s"pass-2 escaped the flag gate: ${pass2Urls.diff(flagged).take(3)}")
    // Monotone improvement: every merged row has word_count >= its
    // pass-1 word_count (the merge keeps the max).
    val regressed = merged.alias("m")
      .join(pass1.select(col("url"), col("word_count").as("p1_words")), "url")
      .where(col("word_count") < col("p1_words"))
    assert(regressed.count() == 0)
    // Unflagged docs are the untouched pass-1 rows.
    val unflaggedPass = merged.where(!col("url").isin(flagged.toSeq: _*))
      .select("pass").distinct().collect().map(_.getInt(0)).toSet
    assert(unflaggedPass == Set(1))
    // The accurate pass genuinely rescues documents: some flagged doc
    // gains words (PageGen plants image/hybrid pages the fast path
    // skips and the accurate path OCR-substitutes).
    val improved = merged.where(col("pass") === 2)
      .join(pass1.select(col("url"), col("word_count").as("p1_words")), "url")
      .where(col("word_count") > col("p1_words")).count()
    assert(improved > 0, "second pass should improve at least one flagged doc")
    kp.unpersist(); pass1.unpersist(); merged.unpersist()
  }

  test("duplicate urls (revisit snapshots) fail loudly instead of silently collapsing") {
    import spark.implicits._
    // Same url twice with different payloads — the url-keyed flag join
    // and merge window cannot re-associate these with their pass-1
    // rows; the contract check must throw, not drop a snapshot.
    val revisit = kernelPages(10).collect().toSeq
    val dup = revisit ++ Seq(revisit.head.copy(
      html = "<html><body><p>changed content on revisit</p></body></html>".getBytes("UTF-8")))
    val ex = intercept[IllegalArgumentException] {
      TwoPass.extract(spark.createDataset(dup))
    }
    assert(ex.getMessage.contains("url-unique"), ex.getMessage)
    assert(ex.getMessage.contains(revisit.head.url), ex.getMessage)
  }

  test("x64 query surface: deterministic, tagged, ordered") {
    val df = SparkEntry.queries("x64_two_pass")(spark, "/unused")
    val rows = df.collect()
    assert(rows.length == 900)
    assert(rows.map(_.getAs[Int]("pass")).toSet.subsetOf(Set(1, 2)))
    // Deterministic across runs (the driver's rows-only check relies on it).
    val again = SparkEntry.queries("x64_two_pass")(spark, "/unused").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ExtractJob --two-pass: job output carries the pass column, matches the library merge") {
    import spark.implicits._
    val out = tmpDir("xjob-2p")
    ExtractJob.run(spark, ExtractJob.Args(rows = 400, out = out, buckets = 2,
      quality = "accurate", twoPass = true))
    val job = spark.read.parquet(out)
    assert(job.columns.contains("pass"))
    assert(job.count() == 400)
    val lib = TwoPass.extract(kernelPages(400), secondQuality = "accurate")
    val a = job.select("url", "pass", "word_count").orderBy("url")
      .collect().map(_.toString).toSeq
    val b = lib.select("url", "pass", "word_count").orderBy("url")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
