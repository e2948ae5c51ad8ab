package graft.sources.v2

import graft.operators.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL table MAINTENANCE through Spark's stored-procedure surface
  * (SPARK-44167, the `CALL` statement Spark 4 ships for DSv2 catalogs —
  * the role Iceberg's system procedures play):
  *
  * {{{
  *   CALL graft_cat.system.compact('docs')
  *   CALL graft_cat.system.zorder('docs', cols => 'n_chars,slot')
  *   CALL graft_cat.system.binpack('docs', target_file_mb => 256)
  *   CALL graft_cat.system.expire('docs', keep => 5)
  *   CALL graft_cat.system.vacuum('docs', grace_ms => 86400000)
  *   CALL graft_cat.system.compact_pos_deletes('docs')
  *   CALL graft_cat.system.rollback('docs', version => 3)
  *   CALL graft_cat.system.create_branch('docs', branch => 'audit')
  *   CALL graft_cat.system.fast_forward('docs', branch => 'audit')
  *   CALL graft_cat.system.drop_branch('docs', branch => 'audit')
  * }}}
  *
  * so a SQL-only session can run the full table lifecycle — no Scala
  * entrypoint required. Each procedure routes to the SAME committed
  * operator the API exposes (same rebase rules, same refusals) and
  * returns its stats as a one-row result relation. Table names resolve
  * in the catalog's warehouse exactly like table identifiers
  * (`'ns.name'` for namespaced tables).
  */
object GraftProcedures {
  private def spark = SparkSession.active

  private case class Param(name: String, dt: DataType, default: Option[String],
                           comment: String)

  private def params(ps: Param*): Array[ProcedureParameter] =
    ps.map { p =>
      val b = ProcedureParameter.in(p.name, p.dt).comment(p.comment)
      p.default.foreach(b.defaultValue)
      b.build()
    }.toArray

  private final class Proc(procName: String, ps: Array[ProcedureParameter],
                           out: StructType,
                           run: (SparkSession, String, InternalRow) => InternalRow)
                          (pathOf: String => String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = ps
    override def isDeterministic: Boolean = false // commits table versions
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val row = run(spark, pathOf(table), input)
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = Array(row)
        override def description(): String = s"GraftProcedureResult($procName)"
      }).iterator()
    }
  }

  private val tableParam =
    Param("table", StringType, None, "table name within this catalog's warehouse")

  def list(): Array[Identifier] =
    Array("compact", "zorder", "binpack", "expire", "vacuum",
      "compact_pos_deletes", "rollback",
      "create_branch", "fast_forward", "drop_branch")
      .map(Identifier.of(Array("system"), _))

  /** Resolve a procedure by identifier; `pathOf` maps a table-name
    * argument to its warehouse directory (supplied by the catalog).
    */
  def load(ident: Identifier, pathOf: String => String): Option[UnboundProcedure] = {
    if (ident.namespace().toSeq != Seq("system")) return None
    def row(vals: Any*): InternalRow = new GenericInternalRow(vals.toArray)
    ident.name() match {
      case "compact" => Some(new Proc("compact",
        params(tableParam,
          Param("target_file_mb", IntegerType, Some("128"), "output file size target"),
          Param("text_col", StringType, Some("CAST(NULL AS STRING)"),
            "content column; set it to rebuild the dedup bloom/hash sidecars")),
        StructType(Seq(StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false),
          StructField("bytes", LongType, nullable = false))),
        (s, path, in) => {
          val st = SnapshotTable.compact(s, path,
            targetFileBytes = in.getInt(1).toLong * 1024 * 1024,
            textCol = if (in.isNullAt(2)) None else Some(in.getUTF8String(2).toString))
          row(st.filesBefore, st.filesAfter, st.bytes)
        })(pathOf))
      case "zorder" => Some(new Proc("zorder",
        params(tableParam,
          Param("cols", StringType, None,
            "comma-separated z-order columns (non-negative integral " +
              "domains; 2..3 selective filter columns is the sweet spot)"),
          Param("target_file_mb", IntegerType, Some("128"), "output file size target"),
          Param("bits", IntegerType, Some("16"),
            "interleaved bits per column (bits * n_cols must fit 63)"),
          Param("text_col", StringType, Some("CAST(NULL AS STRING)"),
            "content column; set it to rebuild the dedup bloom/hash sidecars")),
        StructType(Seq(StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false),
          StructField("bytes", LongType, nullable = false))),
        (s, path, in) => {
          val cols = in.getUTF8String(1).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          require(cols.nonEmpty, "zorder needs at least one column in `cols`")
          val st = SnapshotTable.compact(s, path,
            targetFileBytes = in.getInt(2).toLong * 1024 * 1024,
            textCol = if (in.isNullAt(4)) None else Some(in.getUTF8String(4).toString),
            zorderCols = cols, zorderBits = in.getInt(3))
          row(st.filesBefore, st.filesAfter, st.bytes)
        })(pathOf))
      case "binpack" => Some(new Proc("binpack",
        params(tableParam,
          Param("small_dir_mb", IntegerType, Some("64"),
            "dirs at or under this size merge"),
          Param("target_file_mb", IntegerType, Some("128"), "output file size target")),
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("dirs_merged", IntegerType, nullable = false),
          StructField("dirs_kept", IntegerType, nullable = false))),
        (s, path, in) => {
          val st = SnapshotTable.compactSmall(s, path,
            smallDirBytes = in.getInt(1).toLong * 1024 * 1024,
            targetFileBytes = in.getInt(2).toLong * 1024 * 1024)
          row(st.version, st.nDirsMerged, st.nDirsKept)
        })(pathOf))
      case "expire" => Some(new Proc("expire",
        params(tableParam,
          Param("keep", IntegerType, Some("2"), "retained trailing versions")),
        StructType(Seq(StructField("n_expired", IntegerType, nullable = false))),
        (s, path, in) => row(SnapshotTable.expire(s, path, in.getInt(1))))(pathOf))
      case "vacuum" => Some(new Proc("vacuum",
        params(tableParam,
          Param("grace_ms", LongType, Some("86400000"),
            "age an unreferenced artifact must reach before reclaim " +
              "(the executor-staging sweep floors this at 10 minutes)")),
        StructType(Seq(StructField("n_data_dirs", IntegerType, nullable = false),
          StructField("n_hash_sidecars", IntegerType, nullable = false),
          StructField("n_version_files", IntegerType, nullable = false))),
        (s, path, in) => {
          val st = SnapshotTable.vacuum(s, path, graceMs = in.getLong(1))
          row(st.nDataDirs, st.nHashSidecars, st.nVersionFiles)
        })(pathOf))
      case "compact_pos_deletes" => Some(new Proc("compact_pos_deletes",
        params(tableParam),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        (s, path, _) => row(SnapshotTable.compactPosDeletes(s, path)))(pathOf))
      case "create_branch" => Some(new Proc("create_branch",
        params(tableParam,
          Param("branch", StringType, None, "branch name to create"),
          Param("version", LongType, Some("CAST(NULL AS BIGINT)"),
            "fork-point version (default: current head)")),
        StructType(Seq(StructField("base_version", LongType, nullable = false))),
        (s, path, in) => row(SnapshotTable.createBranch(s, path,
          in.getUTF8String(1).toString,
          if (in.isNullAt(2)) None else Some(in.getLong(2)))))(pathOf))
      case "fast_forward" => Some(new Proc("fast_forward",
        params(tableParam,
          Param("branch", StringType, None, "branch to publish onto main")),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        (s, path, in) => row(SnapshotTable.fastForward(s, path,
          in.getUTF8String(1).toString)))(pathOf))
      case "drop_branch" => Some(new Proc("drop_branch",
        params(tableParam,
          Param("branch", StringType, None, "branch name to remove")),
        StructType(Seq(StructField("dropped", IntegerType, nullable = false))),
        (s, path, in) => {
          SnapshotTable.dropBranch(s, path, in.getUTF8String(1).toString)
          row(1)
        })(pathOf))
      case "rollback" => Some(new Proc("rollback",
        params(tableParam,
          Param("version", LongType, None, "retained version to restore")),
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("restored", LongType, nullable = false))),
        (s, path, in) => {
          val st = SnapshotTable.rollback(s, path, in.getLong(1))
          row(st.version, st.toVersion)
        })(pathOf))
      case _ => None
    }
  }
}
