package graft

/** Codegen gate: every query whose plan contains a graft custom
  * expression must EXECUTE with `spark.sql.codegen.fallback=false` —
  * a broken `doGenCode` then errors instead of silently dropping the
  * stage to interpreted mode (the failure class the spark-submit smoke
  * caught in Spark's own bloom probe: a Janino parse error that cost
  * codegen without costing correctness, invisible to every
  * result-comparing test).
  */
class CodegenGateSpec extends SparkSuite {

  test("custom-expression queries execute with codegen fallback disabled") {
    val sf = "/root/testdata/sf0.001"
    val markers = Seq("sorted_intersect_count", "vector_dot", "minhash_md5",
      "simhash_md5", "graft_might_contain", "bloom_filter_agg")
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val gated = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
        // Building the frame is enough to read its optimized plan; only
        // frames that actually carry a custom expression are executed.
        val df = fn(spark, sf)
        val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
        if (markers.exists(plan.contains)) { df.collect(); Some(n) } else None
      }
      info(s"codegen-gated: ${gated.size} queries (${gated.mkString(", ")})")
      // The expression surface must stay covered — if this shrinks, the
      // gate quietly stopped guarding something.
      assert(gated.size >= 12, s"only ${gated.size} queries hit the gate")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
