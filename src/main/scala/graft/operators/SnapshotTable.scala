package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Minimal table-format layering over the sink: versioned snapshots with
  * an atomic manifest commit, so rewrites (compaction, overwrite) are
  * safe under concurrent readers — the ACID property [[Sink.compact]]'s
  * raw directory swap cannot give (its two renames leave a window with
  * no `path` at all, and a reader that listed files before the swap can
  * see a mix).
  *
  * Layout (the Iceberg-on-HDFS commit idea reduced to its kernel):
  * {{{
  *   path/snap-00000001/...            immutable data files, never edited
  *   path/_versions/v00000001.txt      manifest: the snapshot dir name
  * }}}
  * A commit WRITES a fresh snapshot directory, then publishes it by
  * renaming a temp manifest to `v<next>.txt` — rename-into-place is the
  * one atomic filesystem primitive, and create-if-absent semantics make
  * it double as the concurrency lock: if two committers race for the
  * same version number, exactly one rename succeeds and the loser
  * retries at the next number on top of the winner's state.
  *
  * Snapshot isolation falls out of immutability: a reader resolves the
  * manifest ONCE and from then on reads only that snapshot's files,
  * which no later commit touches — it sees entirely-old or entirely-new,
  * never a mix. Old snapshots accumulate until [[expire]] drops the
  * unreferenced ones (the reader-vs-cleanup grace window is the
  * retention count, as in every production table format).
  */
object SnapshotTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsDir(path: String) = new Path(path, "_versions")
  private def manifest(path: String, v: Long) =
    new Path(versionsDir(path), f"v$v%08d.txt")
  private def snapDir(path: String, v: Long) = f"snap-$v%08d"

  /** Latest committed version, if any. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] = {
    val vd = versionsDir(path)
    val f = fs(spark, vd)
    if (!f.exists(vd)) None
    else {
      val vs = f.listStatus(vd).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".txt"))
        .flatMap(n => scala.util.Try(n.stripPrefix("v").stripSuffix(".txt").toLong).toOption)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(spark: SparkSession, path: String, v: Long): (String, String) = {
    val f = fs(spark, manifest(path, v))
    val in = f.open(manifest(path, v))
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val Array(dir, format) = content.trim.split("\n").take(2)
    (dir, format)
  }

  /** Atomic publish: write a temp manifest, rename to the versioned name.
    * Returns the committed version; retries (writing on top of the new
    * state is the CALLER's job, so a lost race throws for writers that
    * staged against a stale parent — optimistic concurrency).
    */
  private def commit(spark: SparkSession, path: String, expectedNext: Long,
                     dir: String, format: String): Long = {
    val vd = versionsDir(path)
    val f = fs(spark, vd)
    f.mkdirs(vd)
    val tmp = new Path(vd, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"$dir\n$format\n".getBytes("UTF-8")) finally out.close()
    val target = manifest(path, expectedNext)
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"concurrent commit won version $expectedNext at $path; " +
          "re-stage against the current snapshot and retry")
    }
    expectedNext
  }

  /** Commit `df` as the table's next snapshot (the full-table-overwrite
    * write path; incremental appends would stage file lists the same
    * way).
    */
  def write(spark: SparkSession, df: DataFrame, path: String,
            format: String = "parquet"): Long = {
    val next = currentVersion(spark, path).getOrElse(0L) + 1
    val dir = snapDir(path, next)
    df.write.mode("overwrite").format(format).save(new Path(path, dir).toString)
    commit(spark, path, next, dir, format)
  }

  /** Read the CURRENT snapshot. The manifest resolves here, once — the
    * returned DataFrame is pinned to this snapshot's immutable files and
    * is unaffected by any later commit (snapshot isolation).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val (dir, format) = readManifest(spark, path, v)
    spark.read.format(format).load(new Path(path, dir).toString)
  }

  /** Size-targeted compaction as a SNAPSHOT COMMIT: the rewrite stages
    * into the next snapshot directory and becomes visible atomically at
    * manifest rename; the previous snapshot's files are retained, so
    * in-flight readers finish on the exact file set they resolved.
    * Same rewrite kernel as [[Sink.compact]] (scan → repartition to
    * ceil(bytes/target) → write), different publication contract.
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): Sink.CompactionStats = {
    val v = currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val (dir, format) = readManifest(spark, path, v)
    val dataDir = new Path(path, dir)
    val f = fs(spark, dataDir)
    val before = f.listStatus(dataDir).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.format(format).load(dataDir.toString)
    val repart = df.repartition(nOut)
    val sorted =
      if (sortCols.nonEmpty) repart.sortWithinPartitions(sortCols.map(df(_)): _*) else repart
    val nextDir = snapDir(path, v + 1)
    sorted.write.mode("overwrite").format(format).save(new Path(path, nextDir).toString)
    commit(spark, path, v + 1, nextDir, format)
    val after = f.listStatus(new Path(path, nextDir)).count(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    Sink.CompactionStats(before.length, after, totalBytes)
  }

  /** Drop snapshots older than the `keep` most recent manifests — the
    * retention window concurrent readers get to finish inside.
    */
  def expire(spark: SparkSession, path: String, keep: Int = 2): Int = {
    require(keep >= 1, "must retain at least the current snapshot")
    val vd = versionsDir(path)
    val f = fs(spark, vd)
    if (!f.exists(vd)) return 0
    val versions = f.listStatus(vd).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .flatMap(n => scala.util.Try(n.stripPrefix("v").stripSuffix(".txt").toLong).toOption)
      .sorted
    val drop = versions.dropRight(keep)
    drop.foreach { v =>
      val (dir, _) = readManifest(spark, path, v)
      f.delete(new Path(path, dir), true)
      f.delete(manifest(path, v), false)
    }
    drop.length
  }
}
