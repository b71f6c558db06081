package graft.tools

import graft.extract.Processor
import graft.model.{KernelPage, Page}
import graft.synth.PageGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-Spark kernel throughput probe: full ExtractionRecord encoder vs
  * the SlimRecord scale schema, same kernel, same scan. Quantifies how
  * much of the in-Spark vs native gap is row-encoding cost.
  *   sbt -batch "runMain graft.tools.KernelSparkProbe [rows] [cpus]"
  */
object KernelSparkProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 1000000L
    val cpus = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", "/dev/shm/graft_spark_local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val path = s"/tmp/graft_bench/pages_v${PageGen.genVersion}_${rows}_42_p1.parquet"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      PageGen.generate(spark, rows).repartition(64).write.mode("overwrite").parquet(path)

    def run(label: String)(f: => Unit): Unit = {
      f // warmup
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] $label%-14s $secs%7.3f s  ${rows / secs}%9.0f docs/s  ${rows / secs / cpus}%7.0f /core")
    }

    run("full-record") {
      spark.read.parquet(path).as[Page]
        .mapPartitions { it => val p = Processor.default; it.map(x => p.extract(x, "balanced")) }
        .agg(count(lit(1)), sum(col("word_count").cast("long"))).collect()
    }
    run("slim-record") {
      spark.read.parquet(path).as[Page]
        .mapPartitions { it => val p = Processor.default; it.map(x => p.extract(x, "balanced").toSlim) }
        .agg(count(lit(1)), sum(col("word_count").cast("long"))).collect()
    }
    run("narrow-scan") {
      spark.read.parquet(path).select("url", "html", "lang").as[KernelPage]
        .mapPartitions { it => val p = Processor.default; it.map(x => p.extract(x, "balanced")) }
        .agg(count(lit(1)), sum(col("word_count").cast("long"))).collect()
    }
    run("narrow+slim") {
      spark.read.parquet(path).select("url", "html", "lang").as[KernelPage]
        .mapPartitions { it => val p = Processor.default; it.map(x => p.extract(x, "balanced").toSlim) }
        .agg(count(lit(1)), sum(col("word_count").cast("long"))).collect()
    }
    run("kernel-only") {
      spark.read.parquet(path).select("url", "html", "lang").as[KernelPage]
        .mapPartitions { it =>
          val p = Processor.default
          var words = 0L; var n = 0L
          it.foreach { x => val r = p.extract(x, "balanced"); words += r.word_count; n += 1 }
          Iterator((n, words))
        }.agg(sum("_1"), sum("_2")).collect()
    }
    spark.stop()
  }
}
