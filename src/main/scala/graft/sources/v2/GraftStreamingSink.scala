package graft.sources.v2

import graft.operators.SnapshotTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** The NATIVE streaming sink — `df.writeStream.format("graft")
  * .start(path)` — completing the DSv2 surface's write half (the read
  * half is [[GraftDataStream]]): each micro-batch's rows are staged as
  * parquet EXECUTOR-side (the same task writers as the SQL row-level
  * commands — constraints gated per row, hive partition layout,
  * physical column names) and the driver lands them as ONE ordinary
  * append commit per epoch, carrying a `(queryId, epochId)` marker in
  * the manifest.
  *
  * That marker is what makes the sink EXACTLY-ONCE (Delta's
  * SetTransaction contract): Spark re-delivers the last epoch after a
  * crash, and [[SnapshotTable.streamEpochCommitted]] detects an
  * already-landed `(queryId, epochId)` in the retained chain — the
  * redelivery drops its staged files and no-ops. The same gate inside
  * the commit-race loop handles ZOMBIE incarnations: two drivers of
  * one query racing the same epoch resolve to one commit, the loser
  * discards. No foreachBatch wrapper anywhere — the data path is
  * Spark's executors writing parquet straight into the table's staging
  * area, one rename into the commit, O(epoch rows) work per epoch.
  *
  * Contract notes: Append output mode only (Complete/Update have no
  * append representation — [[GraftWriteBuilder]] refuses them loudly);
  * the schema contract resolves ONCE at query start (additive drift
  * refuses like ingest — restart the query after evolving the table);
  * a first epoch against an empty path CREATES the table from the
  * stream's schema, unpartitioned (pre-create the table to get
  * partitioning/stats/constraints). Epoch markers live in retained
  * manifests, so `expire` bounds how stale a redelivery can still be
  * deduplicated — the documented Delta-equivalent retention caveat.
  */
class GraftStreamingWrite(spark: SparkSession, path: String,
                          incoming: StructType, queryId: String)
    extends StreamingWrite {

  private val plan = SnapshotTable.streamWritePlan(spark, path, incoming)
  if (plan.format != "parquet") throw new UnsupportedOperationException(
    s"the graft streaming sink stages parquet task files; table at $path " +
      s"is committed as '${plan.format}' — stream through " +
      "EventStream.ingestSink (foreachBatch) for non-parquet chains")

  private val tmpRoot = new Path(new Path(path, "_staging_stream"),
    java.util.UUID.randomUUID().toString).toString

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val partSet = plan.partitionCols.toSet
    val physPayload = StructType(
      incoming.fields.filterNot(f => partSet(f.name))
        .map(f => f.copy(name = plan.physmap.getOrElse(f.name, f.name))))
    GraftStreamingWriterFactory(GraftDeltaWriterFactory(
      tmpRoot, incoming, physPayload,
      plan.partitionCols.map(c =>
        (incoming.fieldIndex(c), plan.physmap.getOrElse(c, c))),
      GraftWriteUtil.boundConstraints(spark, incoming, plan.constraints),
      GraftWriteUtil.writeConf(spark),
      spark.sessionState.conf.sessionLocalTimeZone))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case g: GraftDeltaMessage => g }
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dropStaged(): Unit =
      msgs.foreach(m => f.delete(new Path(m.taskDir), true))
    try {
      // redelivery of an epoch that already landed (crash between the
      // commit and the checkpoint advance) must be a no-op
      if (SnapshotTable.streamEpochCommitted(spark, path, queryId, epochId)) {
        dropStaged(); return
      }
      if (!msgs.exists(_.dataFiles.nonEmpty)) { dropStaged(); return } // empty epoch
      val stagedDir = SnapshotTable.streamStagingDir(spark, path)
      msgs.foreach { msg =>
        msg.dataFiles.foreach { rel =>
          val from = new Path(new Path(msg.taskDir), rel)
          val to = new Path(new Path(path, stagedDir), rel)
          f.mkdirs(to.getParent)
          if (!f.rename(from, to)) throw new java.io.IOException(
            s"streaming epoch commit could not publish $from to $to")
        }
      }
      try SnapshotTable.commitStreamAppend(spark, path, stagedDir, plan,
        queryId, epochId)
      catch {
        case e: Throwable =>
          // publish-phase leftovers; the kernel reclaims its own
          // post-rename names — idempotent double-delete is fine
          try f.delete(new Path(path, stagedDir), true)
          catch { case _: Throwable => () }
          throw e
      }
      ()
    } finally {
      dropStaged()
      // best-effort husk removal: succeeds only once no epoch is staging
      try { f.delete(new Path(tmpRoot), false); () }
      catch { case _: Throwable => () }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case g: GraftDeltaMessage => g }
      .foreach(m => f.delete(new Path(m.taskDir), true))
  }

  override def toString: String = s"GraftStreamingWrite(query=$queryId, $path)"
}

/** Executor-side factory: delegates to the row-level task writers
  * ([[GraftDeltaWriter]]) in insert-only form — same private task dirs
  * (speculative attempts never mix), same per-row constraint gate, same
  * hive-layout parquet output the commit publishes by rename.
  */
case class GraftStreamingWriterFactory(delta: GraftDeltaWriterFactory)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val w = delta.createWriter(partitionId, taskId)
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = w.insert(row)
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}
