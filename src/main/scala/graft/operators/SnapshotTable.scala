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

  /** Manifest line 1 is a comma-separated DIR LIST: an overwrite commit
    * lists one directory; an append commit ([[ingest]]) lists the
    * parent's directories plus its delta directory, so appending is
    * O(delta) — no snapshot ever rewrites prior files. Line 2 is the
    * format.
    */
  private def readManifest(spark: SparkSession, path: String, v: Long): (Seq[String], String) = {
    val f = fs(spark, manifest(path, v))
    val in = f.open(manifest(path, v))
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val Array(dirs, format) = content.trim.split("\n").take(2)
    (dirs.split(",").toSeq, format)
  }

  /** Atomic publish: write a temp manifest, rename to the versioned name.
    * Returns the committed version; retries (writing on top of the new
    * state is the CALLER's job, so a lost race throws for writers that
    * staged against a stale parent — optimistic concurrency).
    */
  private def commit(spark: SparkSession, path: String, expectedNext: Long,
                     dirs: Seq[String], format: String): Long = {
    val vd = versionsDir(path)
    val f = fs(spark, vd)
    f.mkdirs(vd)
    val tmp = new Path(vd, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"${dirs.mkString(",")}\n$format\n".getBytes("UTF-8")) finally out.close()
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
    * write path; [[ingest]] is the incremental append path).
    */
  def write(spark: SparkSession, df: DataFrame, path: String,
            format: String = "parquet"): Long = {
    val next = currentVersion(spark, path).getOrElse(0L) + 1
    val dir = snapDir(path, next)
    df.write.mode("overwrite").format(format).save(new Path(path, dir).toString)
    commit(spark, path, next, Seq(dir), format)
  }

  /** Read the CURRENT snapshot. The manifest resolves here, once — the
    * returned DataFrame is pinned to this snapshot's immutable files and
    * is unaffected by any later commit (snapshot isolation). An
    * append-chain snapshot lists several directories; the scan unions
    * their file lists (same format, one multi-path scan node).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val (dirs, format) = readManifest(spark, path, v)
    spark.read.format(format)
      .load(dirs.map(d => new Path(path, d).toString): _*)
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
    val (dirs, format) = readManifest(spark, path, v)
    val f = fs(spark, new Path(path))
    val before = dirs.flatMap(d => f.listStatus(new Path(path, d))).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.format(format)
      .load(dirs.map(d => new Path(path, d).toString): _*)
    val repart = df.repartition(nOut)
    val sorted =
      if (sortCols.nonEmpty) repart.sortWithinPartitions(sortCols.map(df(_)): _*) else repart
    val nextDir = snapDir(path, v + 1)
    sorted.write.mode("overwrite").format(format).save(new Path(path, nextDir).toString)
    // Compaction also collapses an append chain back to ONE directory.
    // Its bloom carries over unchanged (same content, same set), and the
    // hash sidecar — when the whole chain has one — collapses by pure
    // hash union, no payload re-hash.
    val srcSidecars = dirs.map(d => hashesDir(path, d))
    if (srcSidecars.nonEmpty && srcSidecars.forall(f.exists))
      spark.read.format(format).load(srcSidecars.map(_.toString): _*)
        .write.mode("overwrite").format(format)
        .save(hashesDir(path, nextDir).toString)
    commit(spark, path, v + 1, Seq(nextDir), format)
    copyBloom(spark, path, v, v + 1)
    val after = f.listStatus(new Path(path, nextDir)).count(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    Sink.CompactionStats(before.length, after, totalBytes)
  }

  /** Drop snapshots older than the `keep` most recent manifests — the
    * retention window concurrent readers get to finish inside. With
    * append chains, directories are SHARED between consecutive
    * manifests: a directory is deleted only when no retained manifest
    * still references it.
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
    val retainedDirs = versions.takeRight(keep)
      .flatMap(v => readManifest(spark, path, v)._1).toSet
    drop.foreach { v =>
      val (dirs, _) = readManifest(spark, path, v)
      dirs.filterNot(retainedDirs).foreach { d =>
        f.delete(new Path(path, d), true)
        f.delete(hashesDir(path, d), true)
      }
      f.delete(manifest(path, v), false)
      f.delete(bloomFile(path, v), false)
    }
    drop.length
  }

  // ---- incremental content-dedup ingest (the d14 bloom path over
  // commits) --------------------------------------------------------------

  private def bloomFile(path: String, v: Long) =
    new Path(versionsDir(path), f"b$v%08d.bin")

  /** Per-data-directory md5 sidecar (`_hashes/<dirname>`): the exact-
    * verify anti-join's build side as hash-only parquet (~16 B/row), so
    * verifying probe-positives reads hashes, never the full payload — at
    * 100 TB that is the difference between a hash-column scan and a
    * whole-table scan per ingest. `read()` loads only manifest dirs, so
    * sidecars never pollute table reads; a missing sidecar (e.g. a
    * snapshot written by plain [[write]]) falls back to hashing the
    * payload once.
    */
  private def hashesDir(path: String, dataDir: String) =
    new Path(new Path(path, "_hashes"), dataDir)

  private def writeHashSidecar(spark: SparkSession, path: String, dataDir: String,
                               data: DataFrame, textCol: String, format: String): Unit = {
    import org.apache.spark.sql.functions._
    data.select(md5(col(textCol)).as("__h"))
      .write.mode("overwrite").format(format)
      .save(hashesDir(path, dataDir).toString)
  }

  /** Union of the chain's hash sidecars when they all exist; else one
    * fallback scan hashing the current snapshot's payload.
    */
  private def existingHashes(spark: SparkSession, path: String, dirs: Seq[String],
                             textCol: String, format: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val f = fs(spark, new Path(path))
    val sidecars = dirs.map(d => hashesDir(path, d))
    if (sidecars.nonEmpty && sidecars.forall(f.exists))
      spark.read.format(format).load(sidecars.map(_.toString): _*)
    else read(spark, path).select(md5(col(textCol)).as("__h"))
  }

  private def readBloom(spark: SparkSession, path: String,
                        v: Long): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val bf = bloomFile(path, v)
    val f = fs(spark, bf)
    if (!f.exists(bf)) None
    else {
      val in = f.open(bf)
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in)) finally in.close()
    }
  }

  private def writeBloom(spark: SparkSession, path: String, v: Long,
                         bloom: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val bf = bloomFile(path, v)
    val f = fs(spark, bf)
    val out = f.create(bf, true)
    try bloom.writeTo(out) finally out.close()
  }

  private def copyBloom(spark: SparkSession, path: String, from: Long, to: Long): Unit =
    readBloom(spark, path, from).foreach(writeBloom(spark, path, to, _))

  final case class IngestStats(version: Long, nIncoming: Long, nNew: Long)

  /** Incremental content-dedup ingest — "this batch minus ALL prior
    * content" as one committed operator (the cronjob shape of corpus
    * dedup at 100 TB, [[Dedup.newDocuments]] wired over snapshot
    * commits). Three properties make it scale:
    *
    *  1. The content bloom is a PERSISTED SIDECAR (`_versions/bNNN.bin`)
    *     updated by merging the delta's bloom — bloom-of-union is the
    *     bitwise OR at fixed (expectedItems, fpp), so no ingest ever
    *     rescans history to rebuild the filter; the filter cost is
    *     O(delta) per commit forever.
    *  2. The commit APPENDS: the new manifest lists the parent's
    *     directories plus one delta directory, so the write cost is
    *     O(new rows), never a table rewrite. [[compact]] collapses the
    *     chain back to one directory when file counts grow.
    *  3. Probe-negative rows (the overwhelming majority at normal dup
    *     rates) are definitely-new and never join; probe-positive rows
    *     (true dups + the fpp share) resolve EXACTLY against the
    *     chain's md5 HASH SIDECARS (`_hashes/<dir>`, ~16 B/row — the
    *     verify pass reads hashes, never the payload; a sidecar-less
    *     snapshot falls back to hashing the payload once), keyed
    *     anti-join sized by the bloom's positive rate. The sketch is a
    *     pure prefilter: output is exactly "incoming minus exact
    *     content duplicates", fully deterministic.
    *
    * Re-ingesting a batch is idempotent (its content is now in the
    * table, so the delta is empty and version still advances by one —
    * commit history stays an audit log). Within-batch duplicates pass
    * through, matching [[Dedup.newDocuments]]. `expectedItems`/`fpp`
    * must stay constant per table (sidecar blooms merge only at equal
    * parameters); a parameter change or missing sidecar falls back to
    * one rebuild scan of the current snapshot.
    */
  def ingest(spark: SparkSession, incoming: DataFrame, path: String,
             textCol: String, expectedItems: Long = 1000000L,
             fpp: Double = 0.01, format: String = "parquet"): IngestStats = {
    import org.apache.spark.sql.functions._
    val cur = currentVersion(spark, path)
    val next = cur.getOrElse(0L) + 1
    val deltaDir = snapDir(path, next)
    val parentDirs = cur.map(v => readManifest(spark, path, v)._1).getOrElse(Nil)
    // Prior-content bloom: the sidecar when present (O(1)), else ONE
    // rebuild scan of the current snapshot. It MUST cover all existing
    // content — a gap would let a duplicate pass as probe-negative.
    val priorBloom = cur.map { v =>
      readBloom(spark, path, v).getOrElse(
        read(spark, path).stat.bloomFilter(xxhash64(col(textCol)), expectedItems, fpp))
    }
    val delta = priorBloom match {
      case None => incoming
      case Some(bloom) =>
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        val probe = call_function("graft_might_contain",
          lit(bos.toByteArray), xxhash64(col(textCol)))
        val definitelyNew = incoming.filter(!probe)
        val needsCheck = incoming.filter(probe)
        val verifiedNew = needsCheck.join(
          existingHashes(spark, path, parentDirs, textCol, format).distinct(),
          md5(needsCheck(textCol)) === col("__h"), "left_anti")
        definitelyNew.unionByName(verifiedNew)
    }
    delta.write.mode("overwrite").format(format)
      .save(new Path(path, deltaDir).toString)
    // The delta is on disk: count it and build its bloom from the
    // WRITTEN files (one small scan — never re-executes the dedup plan).
    val written = spark.read.format(format).load(new Path(path, deltaDir).toString)
    val nNew = written.count()
    // Spark's stat.bloomFilter NPEs on zero rows (its merge sees a null
    // partial) — an empty delta contributes an empty filter anyway.
    val deltaBloom =
      if (nNew == 0) org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else written.stat.bloomFilter(xxhash64(col(textCol)), expectedItems, fpp)
    val merged = priorBloom match {
      case Some(prior) if prior.isCompatible(deltaBloom) =>
        prior.mergeInPlace(deltaBloom); prior
      case Some(_) =>
        // caller changed (expectedItems, fpp) mid-table: rebuild once
        // over the whole next snapshot so coverage stays total
        read(spark, path).select(col(textCol))
          .unionByName(written.select(col(textCol)))
          .stat.bloomFilter(xxhash64(col(textCol)), expectedItems, fpp)
      case None => deltaBloom
    }
    // Publish sidecars BEFORE the manifest rename: when the version
    // becomes visible its bloom and the delta's hash sidecar already
    // exist. A lost commit race leaves the staged delta dir + sidecars
    // as orphans — harmless (never referenced by any manifest; expire()
    // only walks committed manifests, so production cleanup of
    // never-committed staging dirs is a separate janitor concern, as in
    // every manifest-based table format).
    writeHashSidecar(spark, path, deltaDir, written, textCol, format)
    writeBloom(spark, path, next, merged)
    commit(spark, path, next, parentDirs :+ deltaDir, format)
    IngestStats(next, incoming.count(), nNew)
  }
}
