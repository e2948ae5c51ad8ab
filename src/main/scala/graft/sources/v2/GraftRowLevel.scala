package graft.sources.v2

import graft.operators.SnapshotTable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL row-level commands (UPDATE / MERGE INTO / subquery DELETE) for
  * graft tables — the DELTA-based DSv2 contract ([[SupportsDelta]]),
  * which maps EXACTLY onto the positional merge-on-read tier:
  *
  *  - the operation's SCAN is the ordinary [[GraftScanBuilder]] read
  *    (stats/bloom/partition pruned, overlay-masked) plus the
  *    `_graft_file`/`_graft_pos` metadata columns — the rowId Spark
  *    carries through the rewrite;
  *  - Spark computes per-row DELETE / INSERT operations (updates are
  *    represented as delete + reinsert);
  *  - the DELTA WRITE stages them from the executors: deleted rowIds
  *    become a `_posdel/` sidecar (O(matches) rows), inserted rows
  *    become one ordinary delta directory (physical column names, hive
  *    layout), and the driver commits both atomically with the same
  *    kind/rebase rules as [[SnapshotTable.updateWherePositional]].
  *
  * So `UPDATE t SET ...`, `MERGE INTO t USING ...`, and DELETEs whose
  * predicates the metadata path cannot express (subqueries, joins) all
  * work from plain SQL against the format, at O(touched rows) cost —
  * never a table rewrite. CHECK constraints gate every INSERTED row
  * with FAIL semantics (SQL has no silent-drop contract for UPDATE;
  * the API operators keep merge's drop rule).
  */
class GraftRowLevelOperation(spark: SparkSession, path: String,
                             m: SnapshotTable.Manifest, logical: StructType,
                             cmd: RowLevelOperation.Command,
                             scannedV: Long)
    extends RowLevelOperation with SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftMeta.FileCol), Expressions.column(GraftMeta.PosCol))
  override def representUpdateAsDeleteAndInsert(): Boolean = true
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, path, m, logical, options)
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(spark, path, m, logical, cmd, scannedV)
    }
  override def description(): String = s"graft positional $cmd"
}

/** One task's commit message: the files it staged under its private
  * temp dir (paths RELATIVE to that dir, partition segments included)
  * plus its op counts.
  */
case class GraftDeltaMessage(taskDir: String, dataFiles: Seq[String],
                             sidecarFiles: Seq[String],
                             nDeleted: Long, nInserted: Long)
    extends WriterCommitMessage

class GraftDeltaWrite(spark: SparkSession, path: String,
                      m: SnapshotTable.Manifest, logical: StructType,
                      cmd: RowLevelOperation.Command, scannedV: Long)
    extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = new GraftDeltaBatchWrite(
    spark, path, m, logical, cmd, scannedV)
  override def description(): String = s"GraftDeltaWrite($cmd, $path)"
}

/** Driver-side pieces shared by every executor-staged graft write (the
  * row-level delta writers and the native streaming sink): the hadoop
  * conf snapshot parquet task writers need, and CHECK constraints bound
  * to a concrete row layout.
  */
object GraftWriteUtil {
  /** Hadoop conf snapshot carrying the session's parquet write settings
    * (the keys ParquetWriteSupport.init asserts on — mirrored from the
    * session conf the way ParquetFileFormat.prepareWrite does).
    */
  def writeConf(spark: SparkSession): SerializableConfiguration = {
    val c = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val sql = spark.sessionState.conf
    c.set("spark.sql.parquet.writeLegacyFormat",
      sql.getConfString("spark.sql.parquet.writeLegacyFormat", "false"))
    c.set("spark.sql.parquet.outputTimestampType",
      sql.getConfString("spark.sql.parquet.outputTimestampType", "INT96"))
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite",
      sql.getConfString("spark.sql.parquet.datetimeRebaseModeInWrite", "EXCEPTION"))
    c.set("spark.sql.parquet.int96RebaseModeInWrite",
      sql.getConfString("spark.sql.parquet.int96RebaseModeInWrite", "EXCEPTION"))
    c.set("spark.sql.parquet.fieldId.write.enabled",
      sql.getConfString("spark.sql.parquet.fieldId.write.enabled", "true"))
    // every key SparkToParquetSchemaConverter's Configuration ctor reads
    // WITHOUT a default must be present (it toBoolean's the raw string)
    Seq(org.apache.spark.sql.internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
        org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
        org.apache.spark.sql.internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
        org.apache.spark.sql.internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => c.set(e.key, sql.getConf(e).toString))
    new SerializableConfiguration(c)
  }

  /** CHECK constraints as serializable BOUND expressions over `rowSchema`
    * (FAIL semantics). Resolution runs on the driver through the
    * analyzer exactly like the operators' constraint gate, then binds to
    * the row layout the writers see.
    */
  def boundConstraints(spark: SparkSession, rowSchema: StructType,
                       constraints: Seq[SnapshotTable.Constraint])
      : Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] =
    constraints.map { c =>
      val parsed = spark.sessionState.sqlParser.parseExpression(c.expr)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowSchema)
      val analyzed = empty.filter(org.apache.spark.sql.GraftSqlShim.column(parsed))
        .queryExecution.analyzed
      val (cond, childOut) = analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          (f.condition, f.child.output)
      }.head
      c.name -> org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(cond, childOut)
    }
}

class GraftDeltaBatchWrite(spark: SparkSession, path: String,
                           m: SnapshotTable.Manifest, logical: StructType,
                           cmd: RowLevelOperation.Command, scannedV: Long)
    extends DeltaBatchWrite {
  import scala.jdk.CollectionConverters._

  private val tmpRoot = new Path(new Path(path, "_staging_rl"),
    java.util.UUID.randomUUID().toString).toString

  /** The parquet payload schema: logical fields minus partition columns
    * (hive layout carries them in the path), renamed to PHYSICAL names.
    */
  private val partSet = m.partitionCols.toSet
  private val dataFieldsLogical = logical.fields.filterNot(f => partSet(f.name))
  private val physPayload = StructType(dataFieldsLogical.map(f =>
    f.copy(name = m.physOf(f.name))))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    GraftDeltaWriterFactory(tmpRoot, logical, physPayload,
      m.partitionCols.map(c => (logical.fieldIndex(c), m.physOf(c))),
      GraftWriteUtil.boundConstraints(spark, logical, m.constraints),
      GraftWriteUtil.writeConf(spark),
      spark.sessionState.conf.sessionLocalTimeZone)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case g: GraftDeltaMessage => g }
    val anyDeletes = msgs.exists(_.sidecarFiles.nonEmpty)
    val anyInserts = msgs.exists(_.dataFiles.nonEmpty)
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      if (!anyDeletes && !anyInserts) return // a no-op command: no commit
      val (stagedDir, sidecarName) = SnapshotTable.rowLevelStagingNames(scannedV)
      // move ONLY the files the committed task attempts reported —
      // zombie/speculative attempts' leftovers die with tmpRoot below
      def move(taskDir: String, rel: String, destRoot: Path): Unit = {
        val from = new Path(new Path(taskDir), rel)
        val to = new Path(destRoot, rel)
        f.mkdirs(to.getParent)
        if (!f.rename(from, to)) throw new java.io.IOException(
          s"row-level commit could not publish $from to $to")
      }
      try {
        msgs.foreach { msg =>
          msg.dataFiles.foreach(move(msg.taskDir, _, new Path(path, stagedDir)))
          msg.sidecarFiles.foreach(move(msg.taskDir, _,
            SnapshotTable.posDeletePath(path, sidecarName)))
        }
        // anchored at the snapshot the SCAN resolved: every commit that
        // interleaved during the write goes through the kernel's rebase
        // validation (rewrites refuse; overlapping positional racers are
        // write-write conflicts)
        SnapshotTable.commitPositionalDelta(spark, path, scannedV,
          if (anyInserts) Some(stagedDir) else None,
          if (anyDeletes) Some(sidecarName) else None,
          s"row-level $cmd")
      } catch {
        case e: Throwable =>
          // the published staged dir and sidecar are uniquely named and
          // referenced by no manifest on failure — reclaim them instead
          // of leaking (the kernel cleans its own post-rename names;
          // this covers publish-phase failures and is idempotent)
          try {
            f.delete(new Path(path, stagedDir), true)
            f.delete(SnapshotTable.posDeletePath(path, sidecarName), true)
          } catch { case _: Throwable => () }
          throw e
      }
      ()
    } finally { f.delete(new Path(tmpRoot), true); () }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(tmpRoot), true)
    ()
  }
}

/** Executor-side factory: each task writes its deletes and inserts as
  * parquet under a PRIVATE temp dir (task-attempt-unique), so
  * speculative or failed attempts never mix with committed output —
  * the driver publishes exactly the files the winning attempts report.
  */
case class GraftDeltaWriterFactory(
    tmpRoot: String, logical: StructType, physPayload: StructType,
    partitionCols: Seq[(Int, String)], // (index in logical row, physical name)
    constraints: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    conf: SerializableConfiguration,
    sessionTz: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(this, partitionId, taskId)
}

class GraftDeltaWriter(fa: GraftDeltaWriterFactory, partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.metadata.CompressionCodecName
  import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

  private val sidecarSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("ord", LongType, nullable = false)))

  private val taskDir =
    new Path(fa.tmpRoot, f"task-$partitionId%05d-$taskId").toString
  private val uid = java.util.UUID.randomUUID().toString.take(8)

  private class Builder(p: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](p) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private def open(rel: String, schema: StructType): ParquetWriter[InternalRow] = {
    val c = new Configuration(fa.conf.value)
    ParquetWriteSupport.setSchema(schema, c)
    new Builder(new Path(new Path(taskDir), rel))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  // exactly one sidecar writer; one data writer per PARTITION VALUE
  // combination this task touches (hive layout demands separate dirs).
  // A cap guards against a pathological high-cardinality update blowing
  // executor memory on open column writers.
  private var sidecar: ParquetWriter[InternalRow] = _
  private var sidecarRel: String = _
  private val dataWriters =
    scala.collection.mutable.LinkedHashMap.empty[String, ParquetWriter[InternalRow]]
  private val maxOpenWriters = 64
  private var nDel = 0L
  private var nIns = 0L

  private val payloadProj = {
    val partIdx = fa.partitionCols.map(_._1).toSet
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      fa.logical.fields.indices.filterNot(partIdx)
        .map(i => org.apache.spark.sql.catalyst.expressions.BoundReference(
          i, fa.logical.fields(i).dataType, fa.logical.fields(i).nullable)))
  }
  private val sidecarProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(sidecarSchema)

  /** The row's hive path segments (`phys=value/...`), matching the
    * escaping Spark's own dynamic-partition writer uses so discovery
    * parses the values back identically.
    */
  private def partitionRel(row: InternalRow): String =
    fa.partitionCols.map { case (idx, phys) =>
      val dt = fa.logical.fields(idx).dataType
      val v =
        if (row.isNullAt(idx)) null
        else org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(row.get(idx, dt), dt),
          // SESSION timezone: the string must parse back identically to
          // what Spark's own dynamic-partition writer would have named
          StringType, Some(fa.sessionTz)).eval(null)
      val s =
        if (v == null) "__HIVE_DEFAULT_PARTITION__"
        else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v.toString)
      s"$phys=$s"
    }.mkString("/")

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (sidecar == null) {
      sidecarRel = s"del-$partitionId-$uid.parquet"
      sidecar = open(sidecarRel, sidecarSchema)
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    out.update(0, id.getUTF8String(0).copy())
    out.setLong(1, id.getLong(1))
    sidecar.write(sidecarProj(out))
    nDel += 1
  }

  override def insert(row: InternalRow): Unit = {
    fa.constraints.foreach { case (name, expr) =>
      if (expr.eval(row) == false) throw new IllegalArgumentException(
        s"write violates CHECK constraint '$name' — executor-staged writes " +
          "(SQL UPDATE/MERGE, the streaming sink) enforce every table " +
          "constraint with fail semantics")
    }
    val rel = {
      val p = partitionRel(row)
      val fname = f"part-$partitionId%05d-$uid.snappy.parquet"
      if (p.isEmpty) fname else s"$p/$fname"
    }
    val w = dataWriters.getOrElseUpdate(rel, {
      if (dataWriters.size >= maxOpenWriters) throw new IllegalStateException(
        s"row-level write touched more than $maxOpenWriters partition values " +
          "in one task; repartition the command's input by the partition " +
          "columns and retry")
      open(rel, fa.physPayload)
    })
    w.write(payloadProj(row))
    nIns += 1
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (sidecar != null) sidecar.close()
    dataWriters.values.foreach(_.close())
    GraftDeltaMessage(taskDir, dataWriters.keys.toSeq,
      Option(sidecarRel).toSeq, nDel, nIns)
  }

  override def abort(): Unit = {
    try {
      if (sidecar != null) sidecar.close()
      dataWriters.values.foreach(_.close())
    } catch { case _: Throwable => () }
    val p = new Path(taskDir)
    val f = p.getFileSystem(fa.conf.value)
    f.delete(p, true)
    ()
  }

  override def close(): Unit = ()
}
