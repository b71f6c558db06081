package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: runMain graft.tools.TimeQueries <sfDir> <name...> */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/graft_spark_local")
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .appName("timeq").getOrCreate()
    try names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(s, sfDir).count()
      println(f"[timeq] $n%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($c rows)")
    } finally s.stop()
  }
}
