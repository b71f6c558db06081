package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** SortedIntersectCount: agreement with array_intersect on both element
  * types, across interpreted and codegen paths.
  */
class SortedIntersectSpec extends SparkSuite {

  override def beforeAll(): Unit = { super.beforeAll(); GraftFunctions.ensureRegistered(spark) }

  test("string variant equals size(array_intersect) on random sets") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def set() = Seq.fill(rng.nextInt(30))(s"w${rng.nextInt(40)}").distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", call_function("sorted_intersect_count", col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.where(col("fast") =!= col("ref")).count() == 0)
  }

  test("long variant equals size(array_intersect) on random sets") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      def set() = Seq.fill(rng.nextInt(30))(rng.nextInt(50).toLong).distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
      .withColumn("fast", call_function("sorted_intersect_count", col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))))
    assert(df.where(col("fast") =!= col("ref")).count() == 0)
  }

  test("empty/null inputs and SQL surface") {
    import spark.implicits._
    val df = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L), Seq.empty[Long]))
      .toDF("a", "b")
    val c = df.select(call_function("sorted_intersect_count", col("a"), col("b"))).collect()
    assert(c.forall(_.getInt(0) == 0))
    val viaSql = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d'))").collect()
    assert(viaSql(0).getInt(0) == 2)
    val nul = df.select(
      call_function("sorted_intersect_count", lit(null).cast("array<bigint>"), col("b"))).collect()
    assert(nul.forall(_.isNullAt(0)))
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq("a"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("sorted_intersect_count", col("a"), col("b"))).collect()
    }
  }
}
