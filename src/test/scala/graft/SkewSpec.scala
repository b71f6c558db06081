package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew handling evidence (north-star: "salting for skewed hosts,
  * AQE skew-join splits"). The salting half is covered by q47's
  * two-phase (host, salt) aggregation; this spec proves the OTHER half:
  * a Zipf-style skewed join key makes AQE split the oversized partition
  * at runtime — visible as skew-marked shuffle reads in the final
  * adaptive plan — with results identical to the unskewed plan.
  */
class SkewSpec extends SparkSuite {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // Force a shuffle join and make the skew detector fire at test
      // scale (production thresholds are MBs; the SHAPE is identical).
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 90% of left rows share one host key — the Zipf head.
      val left = spark.range(0, 120000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("host"),
          col("id").as("v"))
      val right = spark.range(0, 2000)
        .select(col("id").as("host"), (col("id") * 7).as("w"))

      val joined = left.join(right, "host")
      // collect() on THIS dataframe so its own adaptive plan is the one
      // that executes (count() plans a separate aggregation query).
      val n = joined.collect().length.toLong
      // host 0 matches: 108000 left rows × 1 right row; plus the
      // non-skewed rows (host = id for ids ≡ 9 mod 10) whose host also
      // appears on the right (host < 2000): ids 9, 19, ..., 1999 →
      // 200 rows.
      assert(n == 108000L + 200L)

      val plan = joined.queryExecution.executedPlan
      val adaptive = plan.collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an adaptive plan")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew"),
        s"expected skew-split shuffle reads in the final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q79: manual salt-replicate join is semantics-preserving and spreads the hot key") {
    val d = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q79_salted_skew_join")(spark, d)
    val rows = df.collect()
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        when(col("doc_id") % 2 === 0, lit(0L)).otherwise(col("doc_id") % 25).as("host_id"))
    // Reference semantics: the plain unsalted join.
    val plain = docs.join(
        docs.groupBy("host_id").agg(count(lit(1)).as("host_docs"), sum("n_chars").as("host_chars")),
        Seq("host_id"))
      .select("doc_id", "host_id", "host_docs", "host_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      .sameElements(plain))
    // The join key really is (host_id, salt) and the plan is the
    // shuffled (merge-hinted) shape salting exists for — not a
    // broadcast that would make the salt moot; the hot host's rows
    // land on several salt values (xxhash64 is deterministic, so this
    // is a stable property of the planted data, not a flaky
    // distribution assertion).
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("salt"))
    assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
    val hotSalts = docs.where(col("host_id") === 0)
      .select(pmod(xxhash64(col("doc_id")), lit(8L)).cast("int").as("salt"))
      .distinct().count()
    assert(hotSalts >= 4, s"hot host spread over only $hotSalts salts")
  }
}
