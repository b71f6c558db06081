package graft

import graft.app.CompactJob
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Small-file compaction: row-set preservation, idempotence, and the
  * crash-recovery rename protocol.
  */
class CompactJobSpec extends SparkSuite {

  private def mkFragmented(dir: String, buckets: Int, filesPer: Int): Unit = {
    import spark.implicits._
    (0 until buckets).foreach { b =>
      val df = (0 until 40).map(i => (b.toLong * 1000 + i, s"doc-$b-$i")).toDF("id", "text")
      df.repartition(filesPer).write.mode("overwrite").parquet(s"$dir/bucket=$b")
    }
  }

  private def partFiles(dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).filter(_.isDirectory).flatMap(d =>
      fs.listStatus(d.getPath).filter(f => f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)).toSeq
  }

  test("compaction preserves the row set, shrinks file count, and is idempotent") {
    import spark.implicits._
    val dir = tmpDir("compact_in")
    mkFragmented(dir, buckets = 6, filesPer = 5)
    assert(partFiles(dir).size == 30)
    val before = spark.read.parquet(s"$dir/bucket=*")
      .as[(Long, String)].collect().toSet

    val (n, fb, fa) = CompactJob.run(spark, dir)
    assert(n == 6 && fb == 30 && fa == 6)
    assert(partFiles(dir).size == 6)
    val after = spark.read.parquet(s"$dir/bucket=*").as[(Long, String)].collect().toSet
    assert(after == before)

    // Second run: nothing left to do.
    val (n2, _, _) = CompactJob.run(spark, dir)
    assert(n2 == 0)
    assert(partFiles(dir).size == 6)
  }

  test("--sort clusters each rewritten partition (rows come back ordered)") {
    import spark.implicits._
    val dir = tmpDir("compact_sort")
    mkFragmented(dir, buckets = 3, filesPer = 4)
    val (n, _, _) = CompactJob.run(spark, dir, sortCols = Seq("text"))
    assert(n == 3)
    (0 until 3).foreach { b =>
      // One file per bucket after compaction → read order is file
      // order; the sort key must be non-decreasing, which is what
      // gives parquet row-group min/max stats their pruning power.
      val texts = spark.read.parquet(s"$dir/bucket=$b").select("text")
        .as[String].collect().toSeq
      assert(texts == texts.sorted, s"bucket $b not clustered")
    }
    assert(spark.read.parquet(s"$dir/bucket=*").count() == 120)
  }

  test("ExtractJob --compact-target folds compaction into the job run") {
    import graft.app.ExtractJob
    val frag = tmpDir("xjob_frag")
    val tidy = tmpDir("xjob_tidy")
    // no-write-shuffle + repartition fragments each bucket (one file
    // per input partition) — the layout an incremental corpus accretes.
    ExtractJob.run(spark, ExtractJob.Args(rows = 600, out = frag, buckets = 4,
      writeShuffle = false, repartition = 5))
    assert(partFiles(frag).size > 4)
    ExtractJob.run(spark, ExtractJob.Args(rows = 600, out = tidy, buckets = 4,
      writeShuffle = false, repartition = 5, compactTarget = 128L * 1024 * 1024))
    assert(partFiles(tidy).size == 4, partFiles(tidy).mkString(","))
    // Identical content either way.
    val a = spark.read.parquet(s"$frag/bucket=*").select("url").collect().map(_.getString(0)).sorted
    val b = spark.read.parquet(s"$tidy/bucket=*").select("url").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }

  test("recovery restores a bucket stranded mid-swap and drops stale tmp/old dirs") {
    val dir = tmpDir("compact_rec")
    mkFragmented(dir, buckets = 2, filesPer = 3)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Crash between rename(live -> old) and rename(tmp -> live):
    // only the .compact_old dir exists for bucket=0.
    fs.rename(new Path(dir, "bucket=0"), new Path(dir, "bucket=0.compact_old"))
    // Crash after step 3 for bucket=1: live is intact, a stale old
    // copy remains; plus an orphaned tmp dir that must be dropped.
    fs.mkdirs(new Path(dir, "bucket=1.compact_old"))
    fs.mkdirs(new Path(dir, "bucket=1.compact_tmp"))

    val (n, _, _) = CompactJob.run(spark, dir) // runs recover() first
    val names = fs.listStatus(root).map(_.getPath.getName).toSet
    assert(names == Set("bucket=0", "bucket=1"), names.toString)
    assert(n >= 1) // the restored fragmented bucket gets compacted
    assert(spark.read.parquet(s"$dir/bucket=*").count() == 80)
  }
}
