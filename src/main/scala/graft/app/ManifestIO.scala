package graft.app

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-bucket file manifests — the object-store-safe commit protocol for
  * table rewrites (CompactJob `--commit-mode manifest`).
  *
  * On HDFS/POSIX, CompactJob's default directory-rename protocol is
  * atomic; on S3-style stores rename is per-key copy+delete, so the
  * industry pattern (Iceberg manifests, Delta transaction log) makes
  * data files immutable and commits by atomically swapping ONE small
  * metadata file. This is that pattern at its minimum viable size:
  *
  *  - `bucket=NN/_manifest` lists the bucket's live parquet file names
  *    (one per line, relative to the bucket dir). A bucket without a
  *    manifest is "legacy": all its `*.parquet` files are live — the
  *    layout ExtractJob writes.
  *  - Readers resolve manifests (`read` below — TableIO routes parquet
  *    reads here); unreferenced files are invisible, so writers may
  *    stage new files into the live prefix non-atomically.
  *  - Commit = write `_manifest.tmp`, rename over `_manifest` with
  *    single-file overwrite-rename — atomic on HDFS/POSIX
  *    (FileContext Rename.OVERWRITE) and modeled by an atomic PUT on
  *    object stores. At every instant the manifest names exactly one
  *    consistent file set.
  *  - ExtractJob's dynamic partition overwrite deletes the whole bucket
  *    dir (manifest included) and writes fresh part files — the bucket
  *    cleanly reverts to legacy mode; no writer-side manifest awareness
  *    is needed.
  *
  * The real production target remains an Iceberg catalog (TableIO's
  * format seam): there the table format owns this protocol. This class
  * exists so the compaction job's commit semantics — and their crash
  * points — are executable and spec-pinned in the sandbox
  * (CompactJobSpec).
  */
object ManifestIO {

  val ManifestFile = "_manifest"

  def manifestPath(bucketDir: Path): Path = new Path(bucketDir, ManifestFile)

  def readManifest(fs: FileSystem, bucketDir: Path): Option[Seq[String]] = {
    val m = manifestPath(bucketDir)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toVector)
      finally in.close()
    }
  }

  /** The bucket's live data files: manifest-listed if one is committed,
    * otherwise every `*.parquet` in the dir (legacy layout).
    */
  def liveFiles(fs: FileSystem, bucketDir: Path): Seq[Path] =
    readManifest(fs, bucketDir) match {
      case Some(names) => names.map(new Path(bucketDir, _))
      case None => fs.listStatus(bucketDir)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath).toSeq.sortBy(_.getName)
    }

  /** Atomically commit `names` as the bucket's live set (tmp write +
    * single-file overwrite-rename).
    */
  def commit(conf: Configuration, fs: FileSystem, bucketDir: Path,
      names: Seq[String]): Unit = {
    val tmp = new Path(bucketDir, ManifestFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((names.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(bucketDir.toUri, conf)
      .rename(tmp, manifestPath(bucketDir), Options.Rename.OVERWRITE)
  }

  /** Exactly `bucket=NN` — NOT the `bucket=NN.compact_stage` /
    * `.compact_tmp` / `.compact_old` siblings a mid-compaction crash
    * leaves behind. A prefix match here made a manifest-aware read
    * count a staged rewrite as an extra legacy bucket and return its
    * rows twice, violating the protocol's no-duplicates invariant.
    */
  private val LiveBucketDir = "^bucket=\\d+$".r

  private def bucketDirs(fs: FileSystem, root: Path) =
    fs.listStatus(root)
      .filter(s => s.isDirectory && LiveBucketDir.matches(s.getPath.getName))
      .map(_.getPath)

  /** Manifest-aware read of a bucket-partitioned parquet table. Fast
    * path: no bucket has a manifest (the overwhelmingly common case —
    * ExtractJob output before any manifest-mode compaction) → plain
    * directory read, byte-for-byte the previous behavior. The probe is
    * ONE metadata call (server-side glob on HDFS, one prefix LIST on an
    * object store), not a per-bucket exists sweep — this runs on every
    * parquet TableIO.read, including ExtractJob's per-wave metrics
    * read. Otherwise the driver resolves each bucket's live file list
    * (O(buckets) metadata ops) and reads exactly those files;
    * `basePath` keeps the `bucket` partition column and its pruning.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifested =
      Option(fs.globStatus(new Path(rootPath, "bucket=*/" + ManifestFile)))
        .getOrElse(Array.empty)
        .map(_.getPath.getParent.getName)
        .filter(LiveBucketDir.matches(_))
    if (manifested.isEmpty)
      spark.read.parquet(root)
    else {
      val files = bucketDirs(fs, rootPath).flatMap(b => liveFiles(fs, b)).map(_.toString)
      spark.read.option("basePath", root).parquet(files.toIndexedSeq: _*)
    }
  }
}
