package graft.sources.v2

import graft.operators.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, NoopCache, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.Path
import java.util

/** DataSource V2 integration for graft snapshot tables — the surface
  * that makes the table format Spark-NATIVE rather than API-only:
  *
  * {{{
  *   spark.read.format("graft").load(path)                        // current
  *   spark.read.format("graft").option("versionAsOf", 3).load(p)  // pinned
  *   spark.read.format("graft").option("timestampAsOf", ts).load(p)
  * }}}
  *
  * plus the SQL path through [[GraftCatalog]] (`SELECT ... FROM
  * graft_cat.t VERSION AS OF 3`). The scan wires Spark's pushdown
  * hooks straight into [[SnapshotTable.planPrunedFiles]] — the SAME
  * stats/bloom/partition pruning `readWhere` runs — so a SQL consumer
  * gets file skipping identical to the Scala API's, then delegates the
  * surviving files to Spark's own vectorized [[ParquetScan]] (full
  * whole-stage codegen + columnar batches; nothing re-implemented).
  *
  * Scale shape: planning touches manifest + stats sidecars only
  * (driver metadata, O(files) rows); file contents stream through
  * Spark's parquet reader executor-side. Column mapping is handled
  * POSITIONALLY: the scan reports LOGICAL names while the delegated
  * parquet scan reads the PHYSICAL schema in the same field order —
  * rows are positional at this layer, so no rename projection is
  * needed. Tables with an outstanding merge-on-read overlay refuse
  * loudly (the overlay is an anti-join no bare file scan can express;
  * compact first, or read through [[SnapshotTable.read]]).
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.resolve(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    GraftTable.resolve(new CaseInsensitiveStringMap(properties))
}

object GraftTable {
  /** Resolve (path, version) from read options and load the manifest.
    * `versionAsOf` and `timestampAsOf` mirror Delta's reader options;
    * the timestamp accepts epoch millis or `yyyy-MM-dd HH:mm:ss[.f]`.
    */
  def resolve(options: CaseInsensitiveStringMap): GraftTable = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "graft source requires a single table path: " +
          "spark.read.format(\"graft\").load(<table dir>)"))
    val vOpt = Option(options.get("versionAsOf")).map(_.trim.toLong)
    val tsOpt = Option(options.get("timestampAsOf")).map(_.trim)
    if (vOpt.isDefined && tsOpt.isDefined) throw new IllegalArgumentException(
      "pass versionAsOf OR timestampAsOf, not both")
    val version = vOpt.getOrElse {
      tsOpt match {
        case Some(ts) =>
          val millis =
            if (ts.matches("-?\\d+")) ts.toLong
            else java.sql.Timestamp.valueOf(ts).getTime
          SnapshotTable.versionAtTimestamp(spark, path, millis)
        case None => SnapshotTable.currentVersion(spark, path).getOrElse(
          throw new IllegalArgumentException(
            s"no committed graft snapshot at $path"))
      }
    }
    forVersion(spark, path, version)
  }

  def forVersion(spark: SparkSession, path: String, version: Long): GraftTable = {
    val m = SnapshotTable.readManifestChecked(spark, path, version)
    val logical = m.schema
      .map(s => StructType(s.fields.map(_.copy(nullable = true))))
      .getOrElse(SnapshotTable.readAt(spark, path, version).schema)
    new GraftTable(spark, path, version, m, logical)
  }
}

class GraftTable(spark: SparkSession, path: String, version: Long,
                 m: SnapshotTable.Manifest, logical: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft.`$path` @ v$version"
  override def schema(): StructType = logical
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, path, m, logical, options)
}

/** Pushdown bridge: the V2 filter hooks feed the SAME planning kernel
  * as [[SnapshotTable.readWhere]]. Every accepted filter is translated
  * back to a Column predicate (so the kernel's analyzer/cast handling
  * and OR-of-ranges extraction run unchanged), every filter is ALSO
  * returned as residual — pruning is an optimization, Spark re-applies
  * the exact predicate. Column pruning reaches the parquet scan as a
  * physical read schema (positional logical↔physical alignment).
  */
class GraftScanBuilder(spark: SparkSession, path: String,
                       m: SnapshotTable.Manifest, logical: StructType,
                       options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var required: StructType = logical
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftFilters.toColumn(f).isDefined)
    filters // all residual: pruning must never change the answer
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep only known table columns, in TABLE order with partition
    // columns last (the FileScan row layout: data fields then
    // partition fields)
    val want = requiredSchema.fieldNames.toSet
    required = StructType(logical.fields.filter(f => want.contains(f.name)))
  }

  override def build(): Scan = {
    val predicate = pushed.flatMap(GraftFilters.toColumn)
      .reduceOption(_ && _)
    val (perDir, report) = SnapshotTable.planPrunedFiles(spark, path, m, predicate)
    val keptPaths = perDir.flatMap(_._3).map(_.toString).toSet
    val partSet = m.partitionCols.toSet
    def phys(s: StructType) = StructType(s.fields.map(f =>
      f.copy(name = m.physOf(f.name))))
    val dataPhys = phys(StructType(logical.fields.filterNot(f => partSet(f.name))))
    val readDataPhys = phys(StructType(required.fields.filterNot(f => partSet(f.name))))
    val readPartPhys = phys(StructType(required.fields.filter(f => partSet(f.name))))
    // logical output names in FileScan's row order: data, then partition
    val logicalRead = StructType(
      required.fields.filterNot(f => partSet(f.name)) ++
        required.fields.filter(f => partSet(f.name)))
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots = m.dirs.map(d => new Path(path, d)).filter(f.exists)
    val index = new GraftPrunedFileIndex(spark, roots, keptPaths,
      Some(phys(logical)))
    val parquet = ParquetScan(
      spark,
      spark.sessionState.newHadoopConfWithOptions(Map.empty),
      index,
      dataPhys,
      readDataPhys,
      readPartPhys,
      pushed.flatMap(GraftFilters.rename(_, m.physOf)),
      CaseInsensitiveStringMap.empty())
    new GraftScan(parquet, logicalRead, pushed, report, path, spark, m, index,
      StreamSchemas(dataPhys, readDataPhys, readPartPhys, phys(logical),
        pushed.flatMap(GraftFilters.rename(_, m.physOf))),
      options)
  }
}

/** The schema slices a micro-batch stream needs per batch (captured at
  * scan build so every batch reads under the stream-start projection).
  */
case class StreamSchemas(dataPhys: StructType, readDataPhys: StructType,
                         readPartPhys: StructType, fullPhys: StructType,
                         pushedPhys: Array[org.apache.spark.sql.sources.Filter])

/** [[InMemoryFileIndex]] restricted to the files the snapshot planning
  * kept: partition discovery (hive `k=v` layout under each snapshot
  * dir) stays Spark's own, while stats/bloom-pruned files never reach
  * the scan. `NoopCache` keeps listings fresh across snapshot commits
  * in one JVM (the shared session cache would serve a replaced chain's
  * listing).
  */
class GraftPrunedFileIndex(spark: SparkSession, roots: Seq[Path],
                           kept0: Set[String],
                           userSchema: Option[StructType])
    extends InMemoryFileIndex(spark, roots, Map.empty[String, String],
      userSchema, NoopCache) {
  @volatile private var kept: Set[String] = kept0
  /** Runtime-filter hook: shrink the kept set further (never grows —
    * runtime information can only rule files OUT).
    */
  def restrict(to: Set[String]): Unit = kept = kept.intersect(to)
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] =
    super.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(st => kept(st.getPath.toString))))
      .filter(_.files.nonEmpty)
}

/** Thin veneer over the delegated [[ParquetScan]]: reports LOGICAL
  * column names (the delegate reads physical ones at the same
  * positions) and a description carrying the pushdown + prune decision
  * so `.explain` shows what the planning did. Statistics delegate to
  * the parquet scan's (kept-files byte/row estimate), so Catalyst can
  * broadcast-size a pruned graft table in joins exactly like a plain
  * parquet relation — after pruning, not before.
  */
class GraftScan(delegate: ParquetScan, logicalRead: StructType,
                pushed: Array[org.apache.spark.sql.sources.Filter],
                report: SnapshotTable.PruneReport, path: String,
                spark: SparkSession, m: SnapshotTable.Manifest,
                index: GraftPrunedFileIndex,
                streamSchemas: StreamSchemas = null,
                options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Scan with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  override def readSchema(): StructType = logicalRead
  override def toBatch: Batch = {
    // the overlay refusal lives HERE, not at table load: a bare file
    // scan cannot apply the mask, but a STREAM over pre-overlay history
    // is perfectly streamable (it fails loudly only when the cursor
    // reaches the row-mutating commit itself)
    if (m.hasOverlay) throw new IllegalArgumentException(
      s"graft table at $path has an outstanding merge-on-read overlay " +
        s"(${m.tombstones.size} key tombstone(s), ${m.posDeletes.size} " +
        "positional-delete sidecar(s)); the V2 file scan cannot apply " +
        "it — compact the table first, or read through the SnapshotTable API")
    delegate.toBatch
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val maxPerBatch = Option(options.get("maxVersionsPerBatch")).map { s =>
      val n = scala.util.Try(s.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"maxVersionsPerBatch must be a positive integer; got '$s'"))
      require(n > 0, s"maxVersionsPerBatch must be a positive integer; got $n")
      n
    }
    new GraftDataStream(path, streamSchemas, m.format, m.partitionCols,
      Option(options.get("startVersion")), maxPerBatch)
  }
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    delegate.estimateStatistics()
  /** Runtime filtering — the DSv2 analogue of dynamic partition
    * pruning, the way Iceberg ships it: when this scan probes a
    * selective join, Spark delivers the build side's key set AFTER
    * planning; any key on a stats or partition column re-runs the SAME
    * metadata-only planning ([[SnapshotTable.planPrunedFiles]] — driver,
    * O(files) sidecar rows) and files no surviving key can touch never
    * open. Pruning only ever shrinks (runtime information can only rule
    * files out), and Spark re-applies the real join afterwards.
    */
  override def filterAttributes(): Array[NamedReference] =
    (m.statsCols ++ m.partitionCols).distinct.map(Expressions.column).toArray
  override def filter(runtime: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtime.flatMap(GraftFilters.toColumn).reduceOption(_ && _).foreach { p =>
      val (perDir, _) = SnapshotTable.planPrunedFiles(spark, path, m, Some(p))
      index.restrict(perDir.flatMap(_._3).map(_.toString).toSet)
    }
  override def description(): String =
    s"GraftScan(path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"files=${report.nFilesKept}/${report.nFilesTotal}" +
      (if (report.nPartDirsTotal > 0)
         s", partitions=${report.nPartDirsKept}/${report.nPartDirsTotal}"
       else "") + ")"
}

/** Streaming DATA read of a graft table — the Delta-streaming-source
  * contract through the SAME short name as batch
  * (`spark.readStream.format("graft").load(path)`): each micro-batch
  * delivers the rows the commits in its version range APPENDED, read
  * directly from the delta directories with Spark's vectorized parquet
  * readers (fully parallel — the metadata-row changelog source
  * `graft-snapshot-log` remains the CDC form for consumers that want
  * commits, not rows).
  *
  * Offsets are version numbers (the version log is the WAL; the
  * checkpoint just remembers the cursor). Streamable commits: appends
  * emit their added dirs' rows; content no-ops (compact/binpack) and
  * metadata-only commits (constraints, renamecol — physical names are
  * immutable, so the stream-start projection keeps reading later dirs)
  * emit nothing and the cursor rolls past; version 1 emits the initial
  * snapshot whatever its kind. Anything that changes or removes
  * existing rows (overwrite/merge/merge-on-read/posdelete/dropcol/
  * rollback) has NO append representation and fails the query loudly —
  * silently skipping would present an incomplete changelog as complete
  * (Delta's "data update detected" contract). A version expired while
  * the stream was down fails with the retained range, like the
  * changelog source. `startVersion` = latest (default) / earliest / N;
  * `maxVersionsPerBatch` caps a backfill's batch size;
  * `Trigger.AvailableNow` drains to a fence and stops.
  */
class GraftDataStream(path: String, schemas: StreamSchemas, format: String,
                      partitionCols: Seq[String],
                      startVersion: Option[String], maxPerBatch: Option[Long])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadLimit, ReadMaxRows}
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

  private def spark = SparkSession.active

  @volatile private var availableNowFence: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowFence = Some(SnapshotTable.currentVersion(spark, path).getOrElse(0L))

  override def initialOffset(): Offset = {
    val vs = SnapshotTable.versions(spark, path)
    val v = startVersion.map(_.trim.toLowerCase) match {
      case None | Some("latest") => vs.lastOption.getOrElse(0L)
      case Some("earliest") => vs.headOption.map(_ - 1).getOrElse(0L)
      case Some(n) => scala.util.Try(n.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"startVersion must be 'latest', 'earliest', or a version number; got '$n'"))
    }
    VersionOffset(v)
  }

  // one version ≈ one "row" for admission purposes: ReadMaxRows caps how
  // many commits a micro-batch spans (the maxFilesPerTrigger analogue)
  override def getDefaultReadLimit: ReadLimit =
    maxPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head0 = SnapshotTable.currentVersion(spark, path).getOrElse(0L)
    val head = availableNowFence.fold(head0)(math.min(head0, _))
    val from = start.asInstanceOf[VersionOffset].v
    def cap(l: ReadLimit): Long = l match {
      case r: ReadMaxRows => from + r.maxRows()
      case c: CompositeReadLimit => c.getReadLimits.map(cap).min
      case _ => head
    }
    VersionOffset(math.min(head, cap(limit)))
  }
  override def reportLatestOffset(): Offset =
    VersionOffset(SnapshotTable.currentVersion(spark, path).getOrElse(0L))
  override def deserializeOffset(json: String): Offset = VersionOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VersionOffset].v
    val to = end.asInstanceOf[VersionOffset].v
    val retained = SnapshotTable.versions(spark, path).toSet
    val addedDirs = ((from + 1) to to).flatMap { v =>
      val mv = SnapshotTable.readManifestChecked(spark, path, v)
      val kind = mv.kind.getOrElse("unknown")
      if (v == 1) mv.dirs // initial snapshot: the table's baseline rows
      else kind match {
        case "append" =>
          if (!retained(v - 1)) throw new IllegalStateException(
            s"version ${v - 1} of $path expired while the stream was down — " +
              s"the delta of version $v is unprovable by directory; restart " +
              "from startVersion=latest or re-baseline the consumer")
          mv.dirs.filterNot(
            SnapshotTable.readManifestChecked(spark, path, v - 1).dirs.toSet)
        case "compact" | "binpack" | "constraint" | "drop-constraint" |
             "renamecol" | "posdelete-compact" =>
          Nil // logical content no-ops for an append stream
        case other => throw new IllegalStateException(
          s"version $v of $path is a '$other' commit — it changes or removes " +
            "existing rows and has no append representation; a row stream " +
            "cannot deliver it (consume the 'graft-snapshot-log' changelog " +
            "source, or restart this stream past it with startVersion)")
      }
    }
    if (addedDirs.isEmpty) Array.empty
    else batchScan(addedDirs).planInputPartitions()
  }

  /** One throwaway delegated parquet batch over specific dirs: the
    * stream-start projection (physical read schemas captured at scan
    * build) applied to the delta files — identical machinery to the
    * batch path, so evolution null-fill and column mapping behave the
    * same (physical names are immutable, so the capture stays valid).
    */
  private def batchScan(dirs: Seq[String]): Batch = {
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots = dirs.map(d => new Path(path, d)).filter(f.exists)
    val index = new InMemoryFileIndex(spark, roots, Map.empty[String, String],
      Some(schemas.fullPhys), NoopCache)
    ParquetScan(
      spark,
      spark.sessionState.newHadoopConfWithOptions(Map.empty),
      index,
      schemas.dataPhys,
      schemas.readDataPhys,
      schemas.readPartPhys,
      schemas.pushedPhys,
      CaseInsensitiveStringMap.empty()).toBatch
  }

  override def createReaderFactory(): PartitionReaderFactory =
    batchScan(Nil).createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object GraftFilters {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.Column

  private def simpleName(a: String): Boolean =
    a.nonEmpty && !a.contains('.') && !a.contains('`')

  /** V2 [[Filter]] → Column predicate for the planning kernel. Only
    * shapes the kernel's range extraction understands translate;
    * everything else stays residual-only (no pruning, full filter
    * re-applied by Spark).
    */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) if simpleName(a) && v != null => Some(col(a) === lit(v))
    case GreaterThan(a, v) if simpleName(a) && v != null => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) if simpleName(a) && v != null => Some(col(a) >= lit(v))
    case LessThan(a, v) if simpleName(a) && v != null => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) if simpleName(a) && v != null => Some(col(a) <= lit(v))
    case In(a, vs) if simpleName(a) && vs.nonEmpty && vs.forall(_ != null) =>
      Some(col(a).isin(vs.toSeq: _*))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case _ => None
  }

  /** Rewrite a filter's attribute names logical→physical for the
    * delegated parquet row-group filters; shapes with un-renameable
    * parts drop (parquet-side filtering is an optimization too).
    */
  def rename(f: Filter, physOf: String => String): Option[Filter] = f match {
    case EqualTo(a, v) => Some(EqualTo(physOf(a), v))
    case GreaterThan(a, v) => Some(GreaterThan(physOf(a), v))
    case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(physOf(a), v))
    case LessThan(a, v) => Some(LessThan(physOf(a), v))
    case LessThanOrEqual(a, v) => Some(LessThanOrEqual(physOf(a), v))
    case In(a, vs) => Some(In(physOf(a), vs))
    case And(l, r) => for (lc <- rename(l, physOf); rc <- rename(r, physOf)) yield And(lc, rc)
    case Or(l, r) => for (lc <- rename(l, physOf); rc <- rename(r, physOf)) yield Or(lc, rc)
    case _ => None
  }
}
