package graft.streaming

import graft.sources.v2.SnapshotLogSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Consumer wiring for the [[SnapshotLogSource]] version-log stream:
  * the streaming twin of [[graft.operators.SnapshotTable.addedBetween]].
  * The log source emits one metadata row per commit; this helper turns
  * each into a fully parallel batch read of just that commit's added
  * directories and hands it to the caller — "each new commit's delta,
  * exactly once across restarts" with the offset cursor living in the
  * query checkpoint.
  */
object SnapshotChangelog {

  /** One emitted commit. `rewrite` marks compact/write/COW-merge
    * commits, whose `dirs` are the NEW snapshot's full file set rather
    * than an append delta (see [[SnapshotLogSource]]). `tombstones`
    * carries a merge-on-read commit's added key sidecars — together
    * with `dirs` (the upserts) they are a complete upsert+delete CDC
    * event; on a rewrite row they list the version's full outstanding
    * overlay instead (empty after compact/write/merge, which
    * materialize it). `kind` is the manifest-recorded operator
    * (`overwrite`/`append`/`compact`/`merge`/`merge-on-read`) — what
    * makes "skip compactions, re-sync on merges" implementable: both
    * arrive as rewrite rows, but only a compaction is a content no-op.
    */
  final case class Commit(version: Long, rewrite: Boolean, format: String,
                          dirs: Seq[String], tombstones: Seq[String],
                          kind: String)

  /** The keys a commit's tombstones name (deleted or updated by that
    * commit) as one parallel batch read — the DELETE half of applying a
    * merge-on-read commit downstream. Empty frame for pure appends.
    */
  def tombstoneKeys(spark: SparkSession, c: Commit): Option[DataFrame] =
    if (c.tombstones.isEmpty) None
    else Some(spark.read.format(c.format).load(c.tombstones: _*))

  /** The raw log stream: one row per commit, offset = version. The
    * provider is addressed by class name (same convention as the ios
    * source specs — robust under classloaders that hide service files);
    * `format("graft-snapshot-log")` works wherever ServiceLoader
    * registration is visible.
    */
  def readLog(spark: SparkSession, tablePath: String,
              startVersion: Option[String] = None,
              maxVersionsPerBatch: Option[Long] = None,
              startTimestamp: Option[Long] = None): DataFrame = {
    val r0 = spark.readStream.format(classOf[SnapshotLogSource].getName)
    val r1 = startVersion.fold(r0)(v => r0.option("startVersion", v))
    val r2 = startTimestamp.fold(r1)(t => r1.option("startTimestamp", t.toString))
    maxVersionsPerBatch.fold(r2)(n => r2.option("maxVersionsPerBatch", n.toString))
      .load(tablePath)
  }

  /** Tail the table: for every commit, load its added directories as a
    * normal parallel batch frame and invoke `onCommit(delta, commit)` in
    * version order. Commits that are not pure appends fail the query
    * loudly by default — a compaction's "delta" is the whole table and
    * silently re-emitting it would duplicate every downstream row, and
    * a merge-on-read commit's delta DELETES/UPDATES keys a pure-append
    * consumer would double-count. Pass `allowRewrites = true` to
    * receive them and decide per commit: skip compactions, re-sync on
    * COW merges (the rewrite delta arrives as the version's correct
    * masked read, never a raw over-reporting dir list), APPLY a
    * merge-on-read commit precisely — `delta` is its upserts,
    * [[tombstoneKeys]] its deleted/updated keys. With a checkpoint
    * the cursor survives restarts: commits processed before a clean
    * stop are never redelivered, commits landed while the stream was
    * down arrive on resume (foreachBatch keeps its usual at-least-once
    * edge on a crash mid-batch — make `onCommit` idempotent, exactly as
    * with every Spark sink). `maxVersionsPerBatch` bounds a backfill:
    * each micro-batch spans at most that many commits, and the cursor
    * checkpoints at every slice boundary — on a long table an
    * `earliest` consumer makes bounded, restartable progress instead of
    * loading the whole history as one batch.
    */
  def changelogSink(spark: SparkSession, tablePath: String,
                    onCommit: (DataFrame, Commit) => Unit,
                    checkpoint: Option[String] = None,
                    startVersion: Option[String] = None,
                    allowRewrites: Boolean = false,
                    maxVersionsPerBatch: Option[Long] = None): StreamingQuery = {
    val w = readLog(spark, tablePath, startVersion, maxVersionsPerBatch).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // a micro-batch can span several commits; rows are metadata-tiny
        val commits = batch.collect().map { r =>
          Commit(r.getAs[Long]("version"), r.getAs[Boolean]("rewrite"),
            r.getAs[String]("format"), r.getSeq[String](r.fieldIndex("added_dirs")),
            r.getSeq[String](r.fieldIndex("added_tombstones")),
            r.getAs[String]("kind"))
        }.sortBy(_.version)
        commits.foreach { c =>
          if (c.rewrite && !allowRewrites) throw new IllegalStateException(
            s"version ${c.version} of $tablePath is a rewrite commit " +
              "(compact/write/merge/rollback); its by-directory delta does not exist. " +
              "Pass allowRewrites = true and handle the flagged commit, or pause " +
              "maintenance while this stream runs")
          if (c.tombstones.nonEmpty && !c.rewrite && !allowRewrites)
            throw new IllegalStateException(
              s"version ${c.version} of $tablePath is a merge-on-read commit; its delta " +
                "deletes/updates keys that a pure-append consumer would double-count. Pass " +
                "allowRewrites = true and apply added_dirs (upserts) + tombstoneKeys (deletes)")
          val delta =
            if (c.rewrite)
              // the snapshot's real row set: a raw load of the full dir
              // list would over-report rows masked by an outstanding
              // merge-on-read overlay (e.g. an `earliest` baseline on a
              // MOR table whose parent expired)
              graft.operators.SnapshotTable.readAt(batch.sparkSession, tablePath, c.version)
            else if (c.dirs.isEmpty)
              graft.operators.SnapshotTable.readAt(batch.sparkSession, tablePath, c.version)
                .filter(org.apache.spark.sql.functions.lit(false))
            else
              // through the manifest machinery, not a raw load: the
              // delta must arrive under the version's LOGICAL schema
              // (column mapping aliased, evolved columns null-filled)
              graft.operators.SnapshotTable.scanDirsAt(
                batch.sparkSession, tablePath, c.version, c.dirs)
          onCommit(delta, c)
        }
        ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
