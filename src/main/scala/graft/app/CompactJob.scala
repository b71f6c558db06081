package graft.app

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the bucket-partitioned results layout
  * (`bucket=NN/part-*.parquet`) that ExtractJob writes — the standard
  * table-maintenance pass a long-lived 100 TB corpus needs: every
  * incremental wave/run appends its own part files, and a year of
  * appends turns scans into open-file storms. Per bucket, if the file
  * count exceeds ceil(bytes / targetBytes), the partition is rewritten
  * into that many files.
  *
  * Crash safety (filesystem-rename based — HDFS/local; object stores
  * want the commit-protocol variant, noted below):
  *   1. write the rewritten partition to `bucket=NN.compact_tmp`;
  *   2. rename live → `bucket=NN.compact_old`;
  *   3. rename tmp → live;
  *   4. delete old.
  * A crash between 2 and 3 leaves only the .compact_old dir; recovery
  * (run at every startup) renames it back. A crash after 3 leaves a
  * stale .compact_old next to a complete live dir; recovery deletes
  * it. At no point can a reader observe duplicates, and data loss
  * would need a crash INSIDE a rename, which HDFS/POSIX make atomic.
  * On S3-style stores rename is copy+delete, so production there
  * swaps steps 2-4 for a manifest commit (Iceberg/Delta rewrite-files
  * action) — the per-bucket planning logic is unchanged.
  *
  * Scale shape: planning is pure file-listing (driver, O(files));
  * each rewrite is one narrow read→coalesce→write job per bucket, no
  * shuffle; buckets rewrite independently, so a scheduler can spread
  * them across a cluster or run them incrementally.
  *
  * Usage: CompactJob --in DIR [--target-bytes N] [--sort c1,c2]
  * (default target 128 MiB; --sort clusters each rewritten partition)
  */
object CompactJob {

  final case class Plan(bucket: String, files: Int, bytes: Long, outFiles: Int)

  def recover(fs: FileSystem, root: Path): Int = {
    val st = fs.listStatus(root)
    var restored = 0
    st.filter(s => s.isDirectory && s.getPath.getName.endsWith(".compact_old")).foreach { s =>
      val live = new Path(root, s.getPath.getName.stripSuffix(".compact_old"))
      if (!fs.exists(live)) { fs.rename(s.getPath, live); restored += 1 }
      else fs.delete(s.getPath, true)
    }
    // Orphaned tmp dirs are always safe to drop: the live dir still
    // holds the data (tmp only replaces it at step 3).
    st.filter(s => s.isDirectory && s.getPath.getName.endsWith(".compact_tmp"))
      .foreach(s => fs.delete(s.getPath, true))
    restored
  }

  def plan(fs: FileSystem, root: Path, targetBytes: Long): Seq[Plan] =
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .flatMap { dir =>
        val parts = fs.listStatus(dir.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        val bytes = parts.map(_.getLen).sum
        val outFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        if (parts.length > outFiles)
          Some(Plan(dir.getPath.getName, parts.length, bytes, outFiles))
        else None
      }.toSeq.sortBy(_.bucket)

  /** Compacts in place; returns (bucketsCompacted, filesBefore, filesAfter).
    *
    * `sortCols` additionally CLUSTERS each rewritten partition
    * (sortWithinPartitions) — compaction is the one moment the data is
    * being rewritten anyway, so locality comes shuffle-free: sorted
    * row groups give parquet min/max stats that let later scans with
    * a predicate on the sort key skip row groups wholesale (the same
    * reason Iceberg/Delta pair rewrite-files with a sort order).
    */
  def run(spark: SparkSession, inDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): (Int, Int, Int) = {
    val root = new Path(inDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, root)
    val todo = plan(fs, root, targetBytes)
    todo.foreach { p =>
      val live = new Path(root, p.bucket)
      val tmp = new Path(root, p.bucket + ".compact_tmp")
      val old = new Path(root, p.bucket + ".compact_old")
      val df = spark.read.parquet(live.toString).coalesce(p.outFiles)
      (if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
       else df)
        .write.mode("overwrite").parquet(tmp.toString)
      require(fs.rename(live, old), s"rename live->old failed for ${p.bucket}")
      require(fs.rename(tmp, live), s"rename tmp->live failed for ${p.bucket}")
      fs.delete(old, true)
    }
    (todo.size, todo.map(_.files).sum, todo.map(_.outFiles).sum)
  }

  def main(argv: Array[String]): Unit = {
    var in = ""; var target = 128L * 1024 * 1024; var sort = Seq.empty[String]
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--in" => in = argv(i + 1); i += 2
        case "--target-bytes" => target = argv(i + 1).toLong; i += 2
        case "--sort" => sort = argv(i + 1).split(",").toSeq; i += 2
        case other => throw new IllegalArgumentException(s"unknown arg: $other")
      }
    }
    require(in.nonEmpty, "--in is required")
    val spark = SparkUtil.session("graft-compact")
    val t0 = System.nanoTime()
    val (n, before, after) = run(spark, in, target, sort)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"job":"compact","buckets_compacted":$n,"files_before":$before,"files_after":$after,"sec":$secs%.3f}""")
    spark.stop()
  }
}
