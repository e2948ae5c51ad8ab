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

  /** UNIQUE staging name for version v's new directory. Two racers for
    * the same version number stage into DIFFERENT directories, so the
    * loser's writes can never land inside (or overwrite) the winner's
    * committed files — the manifest rename stays the single point of
    * truth. The version prefix keeps listings readable; the suffix is
    * what makes the optimistic-concurrency retry actually safe.
    */
  private def stageDir(v: Long): String =
    f"snap-$v%08d-${java.util.UUID.randomUUID().toString.take(8)}"

  /** All committed versions still retained, ascending — the time-travel
    * index ([[expire]] trims the left edge). One directory listing; no
    * manifest is opened.
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val vd = versionsDir(path)
    val f = fs(spark, vd)
    if (!f.exists(vd)) Nil
    else f.listStatus(vd).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .flatMap(n => scala.util.Try(n.stripPrefix("v").stripSuffix(".txt").toLong).toOption)
      .toSeq.sorted
  }

  /** Latest committed version, if any. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Manifest line 1 is a comma-separated DIR LIST: an overwrite commit
    * lists one directory; an append commit ([[ingest]]) lists the
    * parent's directories plus its delta directory, so appending is
    * O(delta) — no snapshot ever rewrites prior files. Line 2 is the
    * format. Optional line 3 names the version's content-bloom sidecar
    * file (absent for plain [[write]] commits and pre-bloom manifests);
    * naming the bloom IN the manifest — instead of a deterministic
    * per-version filename — is what lets two commit racers stage
    * independent blooms without either overwriting the other's.
    */
  private def readManifestFull(spark: SparkSession, path: String,
                               v: Long): (Seq[String], String, Option[String]) = {
    val f = fs(spark, manifest(path, v))
    val in = f.open(manifest(path, v))
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = content.trim.split("\n")
    (lines(0).split(",").toSeq, lines(1), lines.drop(2).headOption.filter(_.nonEmpty))
  }

  private def readManifest(spark: SparkSession, path: String, v: Long): (Seq[String], String) = {
    val (dirs, format, _) = readManifestFull(spark, path, v)
    (dirs, format)
  }

  /** Atomic publish: write a temp manifest, rename to the versioned name.
    * Returns the committed version; retries (writing on top of the new
    * state is the CALLER's job, so a lost race throws for writers that
    * staged against a stale parent — optimistic concurrency). Staged
    * artifacts all carry caller-unique names ([[stageDir]], uniquely
    * named blooms), so a lost race leaves only unreferenced orphans.
    */
  private def commit(spark: SparkSession, path: String, expectedNext: Long,
                     dirs: Seq[String], format: String,
                     bloomName: Option[String] = None): Long = {
    val vd = versionsDir(path)
    val f = fs(spark, vd)
    f.mkdirs(vd)
    val tmp = new Path(vd, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(
      (s"${dirs.mkString(",")}\n$format\n" + bloomName.map(_ + "\n").getOrElse(""))
        .getBytes("UTF-8")) finally out.close()
    val target = manifest(path, expectedNext)
    // Publish = atomic create-if-absent of the target name. HDFS rename
    // refuses an existing destination, so exists+rename suffices there —
    // but POSIX rename(2) silently REPLACES an existing file, making
    // exists-then-rename a TOCTOU on file:// (two racers could both
    // "win", the second replacing the first's manifest and orphaning its
    // committed delta). On local paths we publish via link(2) instead:
    // hard-linking the tmp file to the target fails atomically with
    // EEXIST when the slot is taken. CONTRACT for other schemes: the
    // non-local branch requires HDFS-style refuse-existing rename
    // semantics; an object-store FS whose rename replaces the
    // destination (e.g. some Hadoop S3 connectors) re-opens the TOCTOU
    // and needs a create(target, overwrite=false)-based publish or an
    // external commit lock instead — as every manifest-based table
    // format documents for the same reason.
    val isLocal = {
      val scheme = target.toUri.getScheme
      scheme == null || scheme == "file"
    }
    val won =
      if (isLocal) {
        val tgt = java.nio.file.Paths.get(f.makeQualified(target).toUri.getPath)
        val src = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
        try { java.nio.file.Files.createLink(tgt, src); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !f.exists(target) && f.rename(tmp, target)
    if (isLocal || !won) f.delete(tmp, false)
    if (!won) throw new java.io.IOException(
      s"concurrent commit won version $expectedNext at $path; " +
        "re-stage against the current snapshot and retry")
    expectedNext
  }

  /** Commit `df` as the table's next snapshot (the full-table-overwrite
    * write path; [[ingest]] is the incremental append path).
    */
  def write(spark: SparkSession, df: DataFrame, path: String,
            format: String = "parquet"): Long = {
    val next = currentVersion(spark, path).getOrElse(0L) + 1
    val dir = stageDir(next)
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
    readAt(spark, path, v)
  }

  /** Time travel: read a PINNED committed version (the Iceberg/Delta
    * `VERSION AS OF` contract). The manifest chain already retains every
    * version inside the [[expire]] window and snapshot directories are
    * immutable, so an old version's read is exactly as stable as the
    * current one: later commits (including concurrent ingests racing
    * this read) never touch its files. Reading an expired or
    * never-committed version fails loudly with the retained range — a
    * silent fallback to "current" would turn an audit query into a lie.
    */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val f = fs(spark, manifest(path, version))
    if (!f.exists(manifest(path, version))) {
      val have = versions(spark, path)
      throw new IllegalArgumentException(
        s"version $version not committed at $path" +
          (if (have.isEmpty) " (no committed snapshot)"
           else s" (retained versions: ${have.min}..${have.max}; earlier ones expired)"))
    }
    val (dirs, format) = readManifest(spark, path, version)
    spark.read.format(format)
      .load(dirs.map(d => new Path(path, d).toString): _*)
  }

  /** Size-targeted compaction as a SNAPSHOT COMMIT: the rewrite stages
    * into the next snapshot directory and becomes visible atomically at
    * manifest rename; the previous snapshot's files are retained, so
    * in-flight readers finish on the exact file set they resolved.
    * Same rewrite kernel as [[Sink.compact]] (scan → repartition to
    * ceil(bytes/target) → write), different publication contract.
    *
    * With `textCol` set, compaction also REPAIRS the incremental-ingest
    * sidecars for chains that started from a plain [[write]] (which
    * commits neither hash sidecar nor bloom): when they cannot be
    * carried forward — a source dir lacks its hash sidecar, or the
    * manifest names no bloom — they are rebuilt from the compacted
    * output this pass is already rewriting (one hash-projection scan of
    * freshly-written, page-cache-hot files; never an extra pass over the
    * old chain). After that, [[ingest]] on the compacted table keeps the
    * never-reads-payloads invariant: the bloom gates probe-negatives and
    * probe-positives verify against ~16 B/row hash sidecars. Without
    * `textCol` the prior behavior stands (sidecars collapse only when
    * the whole chain has them; a gap falls back to one payload scan at
    * the next ingest). `expectedItems`/`fpp` here MUST match the values
    * the table's ingests use — blooms merge only at equal parameters,
    * so a repaired bloom built at different ones is incompatible with
    * the next ingest's delta bloom and that ingest pays the one
    * full-table rebuild scan the repair exists to avoid (correctness
    * is unaffected either way).
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil,
              textCol: Option[String] = None,
              expectedItems: Long = 1000000L,
              fpp: Double = 0.01): Sink.CompactionStats = {
    val v = currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val (dirs, format, bloomName) = readManifestFull(spark, path, v)
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
    val nextDir = stageDir(v + 1)
    sorted.write.mode("overwrite").format(format).save(new Path(path, nextDir).toString)
    // Compaction also collapses an append chain back to ONE directory.
    // The hash sidecar — when the whole chain has one — collapses by
    // pure hash union (no payload re-hash), and the bloom carries over
    // BY REFERENCE: the new manifest names the same bloom file (same
    // content, same set — expire refcounts bloom names like dirs).
    // When either is missing and the caller named the content column,
    // rebuild it from the just-written compacted output (see scaladoc).
    import org.apache.spark.sql.functions.{col, xxhash64}
    lazy val written = spark.read.format(format).load(new Path(path, nextDir).toString)
    val srcSidecars = dirs.map(d => hashesDir(path, d))
    if (srcSidecars.nonEmpty && srcSidecars.forall(f.exists))
      spark.read.format(format).load(srcSidecars.map(_.toString): _*)
        .write.mode("overwrite").format(format)
        .save(hashesDir(path, nextDir).toString)
    else textCol.foreach(tc => writeHashSidecar(spark, path, nextDir, written, tc, format))
    // Only a manifest-NAMED bloom carries forward; a legacy per-version
    // file is keyed on the pre-contentKey hash and must not be laundered
    // into a named reference (readBloom would then trust it). A chain
    // with NO named bloom gets one built from the compacted output when
    // textCol is given, so the next ingest's probe path is O(delta).
    val outBloomName = (bloomName, textCol) match {
      case (some @ Some(_), _) => some
      case (None, Some(tc)) =>
        val name = f"b${v + 1}%08d-${nextDir.takeRight(8)}.bin"
        writeBloomAt(spark, path, name,
          bloomOf(written, xxhash64(contentKey(col(tc))), expectedItems, fpp))
        Some(name)
      case (None, None) => None
    }
    commit(spark, path, v + 1, Seq(nextDir), format, outBloomName)
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
    val f = fs(spark, versionsDir(path))
    val vs = versions(spark, path)
    if (vs.isEmpty) return 0
    val drop = vs.dropRight(keep)
    val retained = vs.takeRight(keep).map(v => readManifestFull(spark, path, v))
    val retainedDirs = retained.flatMap(_._1).toSet
    // bloom files are shared by reference across compactions — refcount
    // their names exactly like dirs
    val retainedBlooms = retained.flatMap(_._3).toSet
    drop.foreach { v =>
      val (dirs, _, bloomName) = readManifestFull(spark, path, v)
      dirs.filterNot(retainedDirs).foreach { d =>
        f.delete(new Path(path, d), true)
        f.delete(hashesDir(path, d), true)
      }
      f.delete(manifest(path, v), false)
      (bloomName.toSeq :+ legacyBloomFile(path, v).getName)
        .filterNot(retainedBlooms)
        .foreach(n => f.delete(new Path(versionsDir(path), n), false))
    }
    drop.length
  }

  /** O(delta) changelog: the rows APPENDED after `fromVersion` (exclusive)
    * up to `toVersion` (inclusive, default current). Valid when the chain
    * is append-only across the range — every directory `fromVersion`
    * lists is still listed by `toVersion`, which is exactly what
    * [[ingest]] commits guarantee. The scan loads ONLY the added
    * directories, never the base, so a daily "what arrived since v"
    * reads O(new data) regardless of table size — the CDC-read shape
    * every table format pairs with time travel (vs d11's full-outer
    * diff, which is the right tool when versions DON'T share files).
    * An intervening [[compact]]/[[write]] rewrites the file set, making
    * the delta unidentifiable by directory — that range fails loudly
    * instead of silently returning the whole rewritten table.
    */
  def addedBetween(spark: SparkSession, path: String, fromVersion: Long,
                   toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.getOrElse(currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path")))
    require(fromVersion <= to, s"fromVersion $fromVersion is after toVersion $to")
    // an expired/unknown endpoint gets readAt's loud retained-range
    // error, not a raw missing-file failure from the manifest read
    val f = fs(spark, versionsDir(path))
    Seq(fromVersion, to).filterNot(v => f.exists(manifest(path, v))).foreach { v =>
      readAt(spark, path, v) // throws with the retained range
    }
    val (fromDirs, format) = readManifest(spark, path, fromVersion)
    val (toDirs, _) = readManifest(spark, path, to)
    val missing = fromDirs.filterNot(toDirs.toSet)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"versions $fromVersion..$to at $path are not an append-only chain " +
        s"(${missing.mkString(", ")} rewritten by a compact/overwrite in the range); " +
        "use a keyed diff of readAt frames instead")
    val added = toDirs.filterNot(fromDirs.toSet)
    if (added.isEmpty) readAt(spark, path, to).limit(0)
    else spark.read.format(format)
      .load(added.map(d => new Path(path, d).toString): _*)
  }

  /** Cheap chain shape probe for maintenance policies: (number of
    * directories the CURRENT manifest lists, total data bytes in every
    * dir after the first). The first-listed dir is the chain's base
    * (post-compaction snapshots list exactly one); the rest are the
    * appended deltas a compaction would fold in — their byte total is
    * what decides whether an O(table) rewrite is worth paying. File
    * metadata listings only; no data is read.
    */
  private[graft] def chainInfo(spark: SparkSession, path: String): (Int, Long) = {
    val v = currentVersion(spark, path).getOrElse(return (0, 0L))
    val (dirs, _) = readManifest(spark, path, v)
    val f = fs(spark, new Path(path))
    val deltaBytes = dirs.drop(1).map { d =>
      val p = new Path(path, d)
      if (!f.exists(p)) 0L
      else f.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .map(_.getLen).sum
    }.sum
    (dirs.size, deltaBytes)
  }

  final case class VacuumStats(nDataDirs: Int, nHashSidecars: Int, nVersionFiles: Int)

  /** Staging-orphan janitor. A lost commit race or a crashed ingest
    * leaves artifacts no manifest ever came to reference: a staged
    * `snap-*` directory, its `_hashes/<dir>` sidecar, a committer-unique
    * bloom, a `.tmp-*` manifest. They are harmless to correctness
    * (nothing resolves them) but at cronjob cadence they accumulate
    * storage forever. Vacuum deletes everything a retained manifest does
    * not reference — data dirs, hash sidecars, bloom/tmp files under
    * `_versions/` — PROVIDED it is older than `graceMs`: the grace
    * window is what keeps an in-flight committer's freshly staged (not
    * yet committed) artifacts safe, exactly the remove-orphan-files
    * contract of production table formats. Manifests themselves are
    * never touched ([[expire]] owns version retention). Legacy
    * per-version bloom files are always unreferenced (manifests name
    * their blooms) and age out with the rest.
    */
  def vacuum(spark: SparkSession, path: String,
             graceMs: Long = 24L * 3600 * 1000): VacuumStats = {
    val root = new Path(path)
    val f = fs(spark, root)
    if (!f.exists(root)) return VacuumStats(0, 0, 0)
    val retained = versions(spark, path).map(v => readManifestFull(spark, path, v))
    val refDirs = retained.flatMap(_._1).toSet
    val refBlooms = retained.flatMap(_._3).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    def deletable(s: org.apache.hadoop.fs.FileStatus): Boolean =
      s.getModificationTime < cutoff
    val dataDirs = f.listStatus(root).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("snap-") && !refDirs(s.getPath.getName) && deletable(s))
    dataDirs.foreach(s => f.delete(s.getPath, true))
    val hd = new Path(path, "_hashes")
    val sidecars =
      if (!f.exists(hd)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else f.listStatus(hd).filter(s => !refDirs(s.getPath.getName) && deletable(s))
    sidecars.foreach(s => f.delete(s.getPath, true))
    val vd = versionsDir(path)
    val versionFiles =
      if (!f.exists(vd)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else f.listStatus(vd).filter { s =>
        val n = s.getPath.getName
        val isManifest = n.startsWith("v") && n.endsWith(".txt")
        !isManifest && !refBlooms(n) && deletable(s)
      }
    versionFiles.foreach(s => f.delete(s.getPath, false))
    VacuumStats(dataDirs.length, sidecars.length, versionFiles.length)
  }

  // ---- incremental content-dedup ingest (the d14 bloom path over
  // commits) --------------------------------------------------------------

  /** Pre-manifest-named bloom location (versions written before blooms
    * were named in the manifest); also the fallback read path.
    */
  private def legacyBloomFile(path: String, v: Long) =
    new Path(versionsDir(path), f"b$v%08d.bin")

  /** Content identity key: md5 of the payload, with NULL payloads mapped
    * to a sentinel no 32-hex-char md5 can equal. NULL content is still
    * content — two null-payload rows are duplicates of each other — and
    * nothing in the probe/verify path may be nullable: a null join key
    * would evaluate the anti-join condition to NULL, the left_anti
    * would KEEP the row, and every replay would re-admit it.
    */
  private def contentKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    coalesce(md5(c), lit("<null>"))
  }

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
    data.select(contentKey(col(textCol)).as("__h"))
      .write.mode("overwrite").format(format)
      .save(hashesDir(path, dataDir).toString)
  }

  /** Union of the chain's hash sidecars when they all exist; else one
    * fallback scan hashing the current snapshot's payload. No distinct:
    * the consumer is a left_anti probe ("does a match exist"), which
    * duplicate build keys cannot change — deduplicating the whole
    * history's key set per ingest would buy nothing.
    */
  private def existingHashes(spark: SparkSession, path: String, dirs: Seq[String],
                             textCol: String, format: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val f = fs(spark, new Path(path))
    val sidecars = dirs.map(d => hashesDir(path, d))
    if (sidecars.nonEmpty && sidecars.forall(f.exists))
      spark.read.format(format).load(sidecars.map(_.toString): _*)
    else read(spark, path).select(contentKey(col(textCol)).as("__h"))
  }

  /** Resolve version v's bloom: ONLY the manifest-named sidecar. A
    * legacy per-version file (pre-manifest-naming vintage) is
    * deliberately NOT trusted: those blooms were keyed on
    * xxhash64(payload), while the probe key is now xxhash64 of the
    * [[contentKey]] — every legacy bit would be a false negative and a
    * silently-broken coverage invariant. Returning None instead routes
    * the caller to the one-scan rebuild, after which the table carries
    * a correctly-keyed named bloom forever.
    */
  private def readBloom(spark: SparkSession, path: String,
                        v: Long): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val f = fs(spark, versionsDir(path))
    readManifestFull(spark, path, v)._3
      .map(n => new Path(versionsDir(path), n))
      .filter(f.exists)
      .map { bf =>
        val in = f.open(bf)
        try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
      }
  }

  /** stat.bloomFilter NPEs on zero input rows (its merge sees a null
    * partial) — every bloom-build site routes through this guard.
    */
  private def bloomOf(df: DataFrame, keyCol: org.apache.spark.sql.Column,
                      expectedItems: Long, fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    if (df.limit(1).count() == 0)
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    else df.stat.bloomFilter(keyCol, expectedItems, fpp)

  private def writeBloomAt(spark: SparkSession, path: String, name: String,
                           bloom: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val bf = new Path(versionsDir(path), name)
    val f = fs(spark, bf)
    f.mkdirs(versionsDir(path))
    val out = f.create(bf, false) // unique name per committer: never overwrite
    try bloom.writeTo(out) finally out.close()
  }

  final case class IngestStats(version: Long, nIncoming: Long, nNew: Long)

  /** Incremental content-dedup ingest — "this batch minus ALL prior
    * content" as one committed operator (the cronjob shape of corpus
    * dedup at 100 TB, [[Dedup.newDocuments]] wired over snapshot
    * commits). Three properties make it scale:
    *
    *  1. The content bloom is a PERSISTED SIDECAR (a committer-unique
    *     file under `_versions/`, NAMED in the manifest) updated by
    *     merging the delta's bloom — bloom-of-union is the bitwise OR
    *     at fixed (expectedItems, fpp), so no ingest ever rescans
    *     history to rebuild the filter; the filter cost is O(delta)
    *     per commit forever.
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
    * through, matching [[Dedup.newDocuments]]. NULL payloads dedup like
    * any other content (the key is [[contentKey]]'s non-null sentinel —
    * a raw md5 key would be NULL, the anti-join condition would
    * evaluate to NULL, and every replay would re-admit the row).
    * `expectedItems`/`fpp` must stay constant per table (sidecar blooms
    * merge only at equal parameters); a parameter change or missing
    * sidecar falls back to one rebuild scan of the current snapshot.
    */
  def ingest(spark: SparkSession, incoming: DataFrame, path: String,
             textCol: String, expectedItems: Long = 1000000L,
             fpp: Double = 0.01, format: String = "parquet"): IngestStats = {
    import org.apache.spark.sql.functions._
    val cur = currentVersion(spark, path)
    val next = cur.getOrElse(0L) + 1
    val deltaDir = stageDir(next)
    val parentDirs = cur.map(v => readManifest(spark, path, v)._1).getOrElse(Nil)
    // Cache the batch: both probe branches and the stats count scan it,
    // and a crawl batch is expensive to recompute (batch-sized to hold).
    // Only cache what WE cached: unpersisting a caller-established cache
    // would silently evict it (persist is not refcounted).
    val weCached = incoming.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (weCached) incoming.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nIncoming = incoming.count()
      // Prior-content bloom (keyed on xxhash64 of the CONTENT KEY): the
      // sidecar when present (O(1)), else ONE rebuild scan of the
      // current snapshot (zero-row-guarded — a committed EMPTY snapshot
      // is legal). It MUST cover all existing content — a gap would let
      // a duplicate pass as probe-negative.
      val priorBloom = cur.map { v =>
        readBloom(spark, path, v).getOrElse(
          bloomOf(read(spark, path), xxhash64(contentKey(col(textCol))),
            expectedItems, fpp))
      }
      val delta = priorBloom match {
        case None => incoming
        case Some(bloom) =>
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          val probe = call_function("graft_might_contain",
            lit(bos.toByteArray), xxhash64(contentKey(col(textCol))))
          val definitelyNew = incoming.filter(!probe)
          val needsCheck = incoming.filter(probe)
          val verifiedNew = needsCheck.join(
            existingHashes(spark, path, parentDirs, textCol, format),
            contentKey(needsCheck(textCol)) === col("__h"), "left_anti")
          definitelyNew.unionByName(verifiedNew)
      }
      delta.write.mode("overwrite").format(format)
        .save(new Path(path, deltaDir).toString)
      // The delta is on disk: count it and build its bloom from the
      // WRITTEN files (one small scan — never re-executes the dedup plan).
      val written = spark.read.format(format).load(new Path(path, deltaDir).toString)
      val nNew = written.count()
      val deltaBloom = bloomOf(written,
        xxhash64(contentKey(col(textCol))), expectedItems, fpp)
      val merged = priorBloom match {
        case Some(prior) if prior.isCompatible(deltaBloom) =>
          prior.mergeInPlace(deltaBloom); prior
        case Some(_) =>
          // caller changed (expectedItems, fpp) mid-table: rebuild once
          // over the whole next snapshot so coverage stays total
          bloomOf(read(spark, path).select(col(textCol))
            .unionByName(written.select(col(textCol))),
            xxhash64(contentKey(col(textCol))), expectedItems, fpp)
        case None => deltaBloom
      }
      // Publish sidecars BEFORE the manifest rename: when the version
      // becomes visible, its bloom and the delta's hash sidecar already
      // exist. All staged names are committer-unique (stageDir suffix,
      // bloom named after it), so a lost commit race leaves only
      // unreferenced orphans — the winner's files are untouched, and
      // [[vacuum]] reclaims never-committed staging artifacts once they
      // age past its grace window.
      val bloomName = f"b$next%08d-${deltaDir.takeRight(8)}.bin"
      writeHashSidecar(spark, path, deltaDir, written, textCol, format)
      writeBloomAt(spark, path, bloomName, merged)
      commit(spark, path, next, parentDirs :+ deltaDir, format, Some(bloomName))
      IngestStats(next, nIncoming, nNew)
    } finally { if (weCached) { incoming.unpersist(); () } }
  }
}
