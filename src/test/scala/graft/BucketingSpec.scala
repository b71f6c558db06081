package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location: writing both sides bucketed on the join
  * key lets repeated joins run with NO exchange on either side — the
  * pre-shuffle is amortized across every downstream join, the classic
  * layout decision for fact tables that join on the same key at 100 TB.
  */
class BucketingSpec extends SparkSuite {

  test("join of two tables bucketed on the key plans without Exchange") {
    import spark.implicits._
    val wh = tmpDir("warehouse")

    val docs = (0L until 2000L).map(i => (i, s"doc_$i")).toDF("id", "payload")
    val stats = (0L until 2000L).map(i => (i, i % 97)).toDF("id", "score")
    docs.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .option("path", s"$wh/b_docs").saveAsTable("b_docs")
    stats.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .option("path", s"$wh/b_stats").saveAsTable("b_stats")

    // merge hint: small test tables would otherwise broadcast (which
    // disables the bucketed scan); at fact-table scale SMJ is the
    // planner's own choice.
    val joined = spark.table("b_docs").hint("merge")
      .join(spark.table("b_stats").hint("merge"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    // The load-bearing assertion: no shuffle on either side.
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(joined.count() == 2000)

    // Same key, different bucket count would shuffle — prove the guard
    // by joining against an unbucketed side.
    val un = (0L until 2000L).map(i => (i, "x")).toDF("id", "tag")
    val mixed = spark.table("b_docs").join(un.hint("merge"), "id")
    assert(mixed.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }
}
