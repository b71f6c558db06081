package graft

import org.apache.spark.sql.functions._

/** Web-curation operators: canonicalization semantics, redaction
  * completeness, and filter behavior beyond the hash oracle.
  */
class WebOpsSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q54: canonical urls are lowercase, unported, untracked, defragmented") {
    val rows = SparkEntry.queries("q54_url_canonical")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getString(2)
      assert(!c.exists(_.isUpper), s"uppercase survived: $c")
      assert(!c.contains("www."), s"www survived: $c")
      assert(!c.contains(":80") && !c.contains(":443"), s"default port survived: $c")
      assert(!c.contains("//") || c.indexOf("//") == c.indexOf("://") + 1,
        s"duplicate path slashes survived: $c")
      assert(!c.contains("utm_"), s"tracking param survived: $c")
      assert(!c.contains("#"), s"fragment survived: $c")
      assert(!c.endsWith("?"), s"dangling query separator: $c")
    }
    // Non-tracking params survive.
    assert(rows.exists(_.getString(2).contains("?x=")))
  }

  test("q55: redacted text carries no PII shapes; counts are ≥ the planted ones") {
    val df = SparkEntry.queries("q55_pii_redact")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Every doc has the planted email+phone+ip at minimum.
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(2) >= 1 && r.getInt(3) >= 1, r.toString)
    }
  }

  test("q56: metrics are well-formed and the keep verdict matches its conjuncts") {
    val rows = SparkEntry.queries("q56_quality_filters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mwl, alpha, sym, ell) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(alpha >= 0 && alpha <= 1 && ell >= 0 && ell <= 1)
      val expect = mwl >= 3 && mwl <= 10 && alpha >= 0.8 && sym <= 0.1 && ell <= 0.3
      assert(r.getBoolean(6) == expect, r.toString)
    }
    // The corpus is natural-language: most docs pass.
    assert(rows.count(_.getBoolean(6)) > rows.length / 2)
  }
}
