package graft.sources.v2

import graft.operators.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange, NamespaceChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.Path
import java.util

/** A [[TableCatalog]] over a directory of graft snapshot tables — what
  * makes the table format reachable from PLAIN SQL, including Spark's
  * standard time-travel syntax and the DML/DDL a Delta/Iceberg user
  * expects:
  *
  * {{{
  *   spark.conf:
  *     spark.sql.catalog.graft_cat = graft.sources.v2.GraftCatalog
  *     spark.sql.catalog.graft_cat.warehouse = /data/tables
  *
  *   SELECT * FROM graft_cat.docs
  *   SELECT * FROM graft_cat.docs VERSION AS OF 3
  *   SELECT * FROM graft_cat.docs TIMESTAMP AS OF '2026-08-15 12:00:00'
  *   CREATE TABLE graft_cat.t (id BIGINT, s STRING)
  *     PARTITIONED BY (lang) TBLPROPERTIES ('stats' = 'id')
  *   CREATE TABLE graft_cat.t2 AS SELECT ...
  *   INSERT INTO graft_cat.t VALUES / SELECT ...    -- append commit
  *   INSERT OVERWRITE graft_cat.t SELECT ...        -- overwrite commit
  *   DELETE FROM graft_cat.t WHERE <predicate>      -- positional delete
  *   TRUNCATE TABLE graft_cat.t
  *   ALTER TABLE graft_cat.t RENAME COLUMN a TO b   -- metadata-only
  *   ALTER TABLE graft_cat.t DROP COLUMN a          -- metadata-only
  * }}}
  *
  * An identifier maps to `warehouse/<ns parts>/<name>`; a table is any
  * such directory with a committed `_versions` chain. Loads delegate to
  * [[GraftTable]], so every SQL read gets the same stats/bloom/
  * partition pruned planning as `SnapshotTable.readWhere`, and every
  * SQL write lands as the SAME committed operator the Scala API runs
  * (INSERT INTO → [[SnapshotTable.append]], INSERT OVERWRITE →
  * [[SnapshotTable.write]], DELETE → positional-delete sidecars) —
  * ACID manifests, constraint gates, column-mapping translation,
  * stats sidecars, optimistic-concurrency rebase included. The
  * content-GATED commit classes (dedup ingest, fuzzy ingest, keyed
  * merge) remain API operators: SQL INSERT is row-preserving by
  * definition and must not silently drop duplicates.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  /** SQL `CALL graft_cat.system.<proc>(...)` — the maintenance surface
    * ([[GraftProcedures]]): compact / binpack / expire / vacuum /
    * compact_pos_deletes / rollback, each routing to the same committed
    * operator as the Scala API and returning its stats as a one-row
    * relation. A table-name argument resolves against this catalog's
    * warehouse like any identifier.
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, table => {
      val parts = table.split('.').toSeq
      val p = dirOf(parts)
      if (!isTable(p)) throw new NoSuchTableException(
        Identifier.of(parts.init.toArray, parts.last))
      p.toString
    }).getOrElse {
      // a typo'd CALL target is an ANALYSIS-class failure (Spark's own
      // catalogs raise ROUTINE_NOT_FOUND / sqlstate 42883), not an
      // internal error — surface it the way CALL resolution expects
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "ROUTINE_NOT_FOUND",
        messageParameters = Map("routineName" ->
          (s"`$catalogName`.${(ident.namespace() :+ ident.name()).mkString(".")}" +
            s" (available: ${GraftProcedures.list().map(_.name())
              .mkString("system.{", ", ", "}")})")))
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      GraftProcedures.list()
    else Array.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' requires a warehouse directory: set " +
          s"spark.sql.catalog.$name.warehouse=<dir>"))
  }
  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def dirOf(parts: Seq[String]): Path =
    parts.foldLeft(new Path(warehouse))((p, s) => new Path(p, s))
  private def tablePath(ident: Identifier): Path =
    dirOf(ident.namespace().toSeq :+ ident.name())
  private def isTable(p: Path): Boolean = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(new Path(p, "_versions"))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = dirOf(namespace.toSeq)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && isTable(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata tables: `t$history` / `t$tags` / `t$files`
    // surface the commit log, tag pins, and live file inventory to SQL
    // (`SELECT * FROM graft_cat.`docs$history``) — driver-metadata-scale
    // frames computed from the manifest chain, never data files.
    val dollar = ident.name().indexOf('$')
    if (dollar > 0) {
      val base = Identifier.of(ident.namespace(), ident.name().substring(0, dollar))
      val kind = ident.name().substring(dollar + 1)
      val p = tablePath(base)
      if (!isTable(p)) throw new NoSuchTableException(base)
      val s = spark
      import s.implicits._
      val df = kind match {
        case "history" => SnapshotTable.history(s, p.toString)
        case "tags" =>
          SnapshotTable.tags(s, p.toString).toSeq.sortBy(_._1)
            .toDF("tag", "version")
        case "refs" =>
          // every named ref: tags (read-only pins) and branches
          // (writable chains) with their base/head positions
          (SnapshotTable.tags(s, p.toString).toSeq.sortBy(_._1)
            .map { case (n, v) => (n, "tag", v, v) } ++
           SnapshotTable.branches(s, p.toString).toSeq.sortBy(_._1)
            .map { case (n, (b, h)) => (n, "branch", b, h) })
            .toDF("name", "type", "base_version", "head_version")
        case "files" =>
          val v = SnapshotTable.currentVersion(s, p.toString).getOrElse(
            throw new NoSuchTableException(base))
          val m = SnapshotTable.readManifestChecked(spark, p.toString, v)
          val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          m.dirs.flatMap { d =>
            val dir = new Path(p, d)
            def walk(q: Path): Seq[org.apache.hadoop.fs.FileStatus] =
              fsys.listStatus(q).toSeq.flatMap(st =>
                if (st.isFile) {
                  if (st.getPath.getName.startsWith("_") ||
                    st.getPath.getName.startsWith(".")) Nil
                  else Seq(st)
                } else walk(st.getPath))
            if (fsys.exists(dir)) walk(dir).map(st =>
              (d, st.getPath.getName, st.getLen)) else Nil
          }.toDF("dir", "file", "bytes")
        case "changes" =>
          // row-scale (the table's full retained change feed) — served
          // DISTRIBUTED through the V1Scan bridge, never collected;
          // `WHERE _commit_version ...` bounds PUSH DOWN so the feed
          // only builds event frames for the windowed versions
          return new GraftChangesTable(ident.toString, s, p.toString)
        case b if b.startsWith("branch_") && b.length > "branch_".length =>
          // `t$branch_<name>`: the ref's head as a relation —
          // batch-read-only (see [[GraftTable.forBranch]])
          return GraftTable.forBranch(s, p.toString, b.stripPrefix("branch_"))
        case other => throw new NoSuchTableException(ident)
      }
      return GraftMetadataTable(ident.toString, df)
    }
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val v = SnapshotTable.currentVersion(spark, p.toString).getOrElse(
      throw new NoSuchTableException(ident))
    GraftTable.forVersion(spark, p.toString, v)
  }

  /** SQL `VERSION AS OF <n>` (also accepts a snapshot TAG name or a
    * BRANCH name — the Iceberg ref-resolution order: tag first).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    if (!version.matches("\\d+")) {
      val tagged = SnapshotTable.tags(spark, p.toString).get(version)
      tagged match {
        case Some(v) => return GraftTable.forVersion(spark, p.toString, v, pinned = true)
        case None =>
          if (SnapshotTable.branches(spark, p.toString).contains(version))
            return GraftTable.forBranch(spark, p.toString, version)
          throw new IllegalArgumentException(
            s"'$version' is neither a version number, a tag, nor a branch on " +
              s"graft table $p")
      }
    }
    GraftTable.forVersion(spark, p.toString, version.toLong, pinned = true)
  }

  /** SQL `TIMESTAMP AS OF <ts>` — Spark delivers epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val v = SnapshotTable.versionAtTimestamp(spark, p.toString,
      math.floorDiv(timestamp, 1000L))
    GraftTable.forVersion(spark, p.toString, v, pinned = true)
  }

  private def unsupported(op: String, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog does not support $op: $why")

  /** SQL `CREATE TABLE` (and the create half of CTAS): commits version 1
    * as an EMPTY overwrite snapshot carrying the declared schema,
    * partitioning (identity transforms only — the format partitions by
    * column value, Hive layout), and table properties `format` (default
    * parquet) and `stats` (comma-separated stats-sidecar columns, the
    * scan-pruning config every later commit maintains). The data half of
    * CTAS then lands as an ordinary INSERT (append commit) — non-atomic
    * two-commit CTAS, the non-staging-catalog contract.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (ident.name().contains('$')) throw new IllegalArgumentException(
      s"'$$' is reserved for metadata tables; cannot create ${ident.name()}")
    val p = tablePath(ident)
    if (isTable(p)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(ident.toString)
    val partCols = partitions.toSeq.map {
      case t if t.name() == "identity" && t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1 =>
        t.references()(0).fieldNames()(0)
      case t => unsupported(s"partition transform '$t'",
        "graft tables partition by column value (identity transforms) only")
    }
    // one lowercase view of the properties: the unknown-key guard, the
    // readers, and the LOCATION refusal must agree on case handling
    import scala.jdk.CollectionConverters._
    val props = properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap
    val format = props.getOrElse("format", "parquet")
    val statsCols = props.get("stats").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    // a custom LOCATION would silently diverge from the warehouse path
    // every later lookup derives — refuse rather than ignore
    props.get("location").filter(_.nonEmpty)
      .filterNot(l => new Path(l) == p).foreach(l =>
        unsupported(s"CREATE TABLE ... LOCATION '$l'",
          s"graft catalog tables live at <warehouse>/<namespace>/<name> ($p); " +
            "external locations are reachable through " +
            "spark.read.format(\"graft\").load(<path>) instead"))
    val known = Set("format", "stats", "provider", "owner", "location",
      "comment")
    val unknown = props.keys.filterNot(known.contains).toSeq.sorted
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"unknown graft table propert${if (unknown.length == 1) "y" else "ies"} " +
        s"${unknown.mkString(", ")} — supported: format, stats")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(schema.fields.map(_.copy(nullable = true))))
    SnapshotTable.write(spark, empty, p.toString, format,
      statsCols = statsCols, partitionCols = partCols)
    loadTable(ident)
  }

  /** SQL `ALTER TABLE ... RENAME COLUMN / DROP COLUMN` — routed to the
    * column-mapping metadata commits ([[SnapshotTable.renameColumn]] /
    * [[SnapshotTable.dropColumn]]: zero data files touched, physical
    * names immutable, time travel reads every version under its own
    * names). Every other change class refuses loudly — graft has no
    * in-place type change, and properties are fixed at create.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    // validate EVERY change before applying ANY: each supported change
    // is its own metadata commit, so a mixed statement failing midway
    // would otherwise leave the table permanently half-altered while
    // the statement reports failure. The upfront pass rejects both
    // unsupported change CLASSES and semantic failures (column missing,
    // new name taken), simulated in statement order against the current
    // committed schema.
    val cur = SnapshotTable.currentVersion(spark, p.toString).getOrElse(
      throw new NoSuchTableException(ident))
    var names = GraftTable.forVersion(spark, p.toString, cur)
      .schema().fieldNames.toSeq
    def requireColumn(c: String, what: String): Unit =
      if (!names.contains(c)) throw new IllegalArgumentException(
        s"ALTER TABLE $ident: $what '$c' does not exist " +
          s"(columns: ${names.mkString(", ")}); no change was applied")
    val planned: Seq[() => Unit] = changes.map {
      case r: TableChange.RenameColumn if r.fieldNames().length == 1 =>
        val (from, to) = (r.fieldNames()(0), r.newName())
        requireColumn(from, "RENAME COLUMN source")
        if (names.contains(to)) throw new IllegalArgumentException(
          s"ALTER TABLE $ident: RENAME COLUMN target '$to' already exists; " +
            "no change was applied")
        names = names.map(n => if (n == from) to else n)
        () => { SnapshotTable.renameColumn(spark, p.toString, from, to); () }
      case d: TableChange.DeleteColumn if d.fieldNames().length == 1 =>
        val from = d.fieldNames()(0)
        requireColumn(from, "DROP COLUMN")
        names = names.filterNot(_ == from)
        () => { SnapshotTable.dropColumn(spark, p.toString, from); () }
      case c => unsupported(s"ALTER TABLE change $c",
        "supported changes: RENAME COLUMN, DROP COLUMN (top-level columns); " +
          "schema-widening happens through ingest(evolveSchema = true)")
    }
    planned.foreach(_.apply())
    loadTable(ident)
  }

  /** SQL `DROP TABLE`: removes the table directory (all snapshots, all
    * sidecars). Destructive and immediate — graft keeps history INSIDE
    * the directory, so dropping the directory is the whole contract.
    */
  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTable(p)) return false
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = tablePath(newIdent)
    val f = from.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(to)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(newIdent.toString)
    if (!f.exists(to.getParent)) throw new NoSuchNamespaceException(
      catalogName +: newIdent.namespace().toSeq)
    if (!f.rename(from, to)) throw new java.io.IOException(
      s"could not rename graft table $from to $to")
  }

  // ---- namespaces: directories under the warehouse ----------------------

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = {
    val root = dirOf(Nil)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && !isTable(st.getPath) &&
        !st.getPath.getName.startsWith("_"))
      .map(st => Array(st.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val root = dirOf(namespace.toSeq)
      val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(root)) throw new NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
      f.listStatus(root).toSeq
        .filter(st => st.isDirectory && !isTable(st.getPath) &&
          !st.getPath.getName.startsWith("_"))
        .map(st => namespace :+ st.getPath.getName).toArray
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = dirOf(namespace.toSeq)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.exists(p) && !isTable(p)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val p = dirOf(namespace.toSeq)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) throw new org.apache.spark.sql.catalyst.analysis
      .NamespaceAlreadyExistsException((catalogName +: namespace.toSeq).toArray)
    if (!f.mkdirs(p)) throw new java.io.IOException(
      s"could not create namespace directory $p")
  }
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    unsupported("ALTER NAMESPACE", "namespaces are plain directories and " +
      "carry no mutable metadata")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    val p = dirOf(namespace.toSeq)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!cascade && f.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty; " +
          "use DROP NAMESPACE ... CASCADE")
    f.delete(p, true)
  }
}

/** The `t$changes` relation — the SQL face of [[SnapshotTable.changes]],
  * served through Spark's V1 read bridge: the Catalyst plan behind the
  * feed executes DISTRIBUTED when the scan runs (delta-scale scans and
  * keyed semi-joins per commit), nothing materializes at load, and
  * `_commit_version` comparison predicates PUSH DOWN into the feed's
  * version window — a query over the last few commits of a
  * long-retained chain builds event frames for THOSE versions only
  * (every filter is also kept residual, so pruning never changes the
  * answer). The [[org.apache.spark.sql.connector.read.V1Scan]] seam is
  * the same one file-source fallbacks ship on; column pruning is
  * deliberately not plumbed (a change feed is consumed whole).
  */
class GraftChangesTable(tname: String, spark: SparkSession, path: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, V1Scan}
  import org.apache.spark.sql.sources._

  // table logical schema + the event columns — computed from the
  // manifest alone (never builds the feed's frames just for a schema)
  private lazy val tschema: StructType = {
    val v = SnapshotTable.currentVersion(spark, path).getOrElse(
      throw new NoSuchTableException(Seq(tname)))
    StructType(GraftTable.forVersion(spark, path, v).schema().fields ++
      GraftCdf.metaFields)
  }

  override def name(): String = tname
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private val cur0 = SnapshotTable.currentVersion(spark, path).getOrElse(0L)
      private var lo = 1L
      private var hi = cur0
      private var pushedList: Array[Filter] = Array.empty

      private def asLong(v: Any): Option[Long] = v match {
        case l: Long => Some(l)
        case i: Int => Some(i.toLong)
        case s: Short => Some(s.toLong)
        case _ => None
      }
      private def tighten(f: Filter): Boolean = f match {
        case EqualTo("_commit_version", v) => asLong(v).exists { l =>
          lo = math.max(lo, l); hi = math.min(hi, l); true }
        case GreaterThan("_commit_version", v) => asLong(v).exists { l =>
          lo = math.max(lo, l + 1); true }
        case GreaterThanOrEqual("_commit_version", v) => asLong(v).exists { l =>
          lo = math.max(lo, l); true }
        case LessThan("_commit_version", v) => asLong(v).exists { l =>
          hi = math.min(hi, l - 1); true }
        case LessThanOrEqual("_commit_version", v) => asLong(v).exists { l =>
          hi = math.min(hi, l); true }
        case In("_commit_version", vs)
            if vs.nonEmpty && vs.forall(asLong(_).isDefined) =>
          lo = math.max(lo, vs.flatMap(asLong).min)
          hi = math.min(hi, vs.flatMap(asLong).max); true
        case And(l, r) => tighten(l) | tighten(r)
        case _ => false
      }

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushedList = filters.filter(tighten)
        filters // all residual: windowing is an optimization only
      }
      override def pushedFilters(): Array[Filter] = pushedList

      override def build(): Scan = new V1Scan {
        private lazy val df =
          if (hi < lo)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tschema)
          // schema anchored at the RESOLVED current version, not the
          // window's end — the relation's shape must not shift when a
          // rename/drop landed after the windowed range
          else SnapshotTable.changes(spark, path, lo, Some(hi),
            schemaVersion = Some(cur0))
        override def readSchema(): StructType = tschema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: org.apache.spark.sql.SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: org.apache.spark.sql.SQLContext = context
            override def schema: StructType = tschema
            override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
              df.rdd
          }.asInstanceOf[T]
        override def description(): String =
          s"GraftChangesScan($tname, versions=[$lo, $hi])"
      }
    }
}

/** A metadata table (`t$history` / `t$tags` / `t$files`): the frame is
  * computed ONCE at load from the manifest chain — driver metadata
  * scale, bounded by the retention window, zero data files opened —
  * and served back through a one-partition V2 scan with column
  * pruning. Snapshot semantics match the manifest read the frame came
  * from (a later commit needs a re-resolve, like any table load).
  */
object GraftMetadataTable {
  def apply(name: String, df: org.apache.spark.sql.DataFrame): GraftMetadataTable =
    new GraftMetadataTable(name, df.schema, df.collect().map(_.toSeq.toArray))
}

class GraftMetadataTable(tname: String, tschema: StructType,
                         rows: Array[Array[Any]])
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read._
  override def name(): String = tname
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = tschema
      override def pruneColumns(r: StructType): Unit = {
        val want = r.fieldNames.toSet
        required = StructType(tschema.fields.filter(f => want(f.name)))
      }
      override def build(): Scan = new Scan with Batch {
        private val idx = required.fieldNames.map(tschema.fieldIndex)
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def description(): String = s"GraftMetadataScan($tname)"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftMetaPartition(rows.map(r => idx.map(r(_)))))
        override def createReaderFactory(): PartitionReaderFactory =
          new GraftMetaReaderFactory(required)
      }
    }
}

case class GraftMetaPartition(rows: Array[Array[Any]])
  extends org.apache.spark.sql.connector.read.InputPartition

class GraftMetaReaderFactory(schema: StructType)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
  import org.apache.spark.sql.catalyst.InternalRow
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[GraftMetaPartition].rows
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        conv(org.apache.spark.sql.Row.fromSeq(rows(i).toSeq))
          .asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}
