package graft.sources.v2

import graft.sources.IosFileParser
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSource V2 integration for the IOS observation format:
  * `spark.read.format("ios").load(glob)` yields the long observation
  * layout with real source-level column pruning.
  *
  * Scale shape: the driver only expands the glob; each file is one
  * InputPartition, parsed executor-side by the same pure
  * [[IosFileParser]] the mapPartitions reader uses — a million-file
  * archive reads with a million-way parallelizable scan and no driver
  * content I/O.
  */
class IosDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ios"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = IosTable.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // multi-path load() arrives as a JSON-encoded array in "paths" —
    // parse it properly (paths may contain commas/escapes)
    val patterns = Option(properties.get("paths")) match {
      case Some(json) if json.startsWith("[") =>
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(json, classOf[Array[String]]).toSeq.filter(_.nonEmpty)
      case _ => Seq(properties.getOrDefault("path", ""))
    }
    new IosTable(patterns)
  }
}

object IosTable {
  val fullSchema: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("channel_no", IntegerType),
    StructField("channel_name", StringType),
    StructField("units", StringType),
    StructField("row_idx", IntegerType),
    StructField("raw", StringType),
    StructField("value", DoubleType),
    StructField("obs_time_utc", TimestampType)))

  def expandGlob(pattern: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(pattern)
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
    matched.filter(_.isFile).map(_.getPath.toString)
  }
}

class IosTable(pathPatterns: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"ios(${pathPatterns.mkString(",")})"
  override def schema(): StructType = IosTable.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IosScanBuilder(pathPatterns)
}

class IosScanBuilder(pathPatterns: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = IosTable.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }
  override def build(): Scan = new IosScan(pathPatterns, required)
}

class IosScan(pathPatterns: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"IosScan(files=${pathPatterns.mkString(",")}, columns=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    pathPatterns.flatMap(IosTable.expandGlob).distinct
      .map(f => IosFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new IosReaderFactory(required.fieldNames)
}

case class IosFilePartition(path: String) extends InputPartition

class IosReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new IosPartitionReader(partition.asInstanceOf[IosFilePartition].path, columns)
}

/** Parses one file and streams observation rows, emitting only the
  * pruned columns (projection applied at the source, like a columnar
  * format would).
  */
class IosPartitionReader(path: String, columns: Array[String])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    val content = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "ISO-8859-1")
    } finally in.close()
    val p = IosFileParser.parse(path.split('/').last, content)
    val fname = UTF8String.fromString(p.filename)
    val pads: Int => Option[Double] = i =>
      p.details.lift(i).map(_.pad.trim).filter(_.nonEmpty)
        .orElse(p.file.get("PAD").map(_.trim))
        .flatMap(s => scala.util.Try(s.toDouble).toOption)
    p.data.iterator.zipWithIndex.flatMap { case (row, ri) =>
      p.channels.iterator.zipWithIndex.map { case (ch, ci) =>
        val rawV = row.lift(ci).getOrElse("")
        val v = scala.util.Try(rawV.toDouble).toOption
          .filterNot(d => pads(ci).contains(d))
        val obsMicros: Option[Long] = for {
          st <- p.startTimeUtc
          dt <- p.timeIncrementSeconds
          // epoch micros from second+nano (toEpochMilli would drop sub-ms
          // start fractions and drift from the mapPartitions reader)
        } yield st.getEpochSecond * 1000000L + st.getNano / 1000L + (dt * 1e6 * ri).toLong
        val all: Map[String, Any] = Map(
          "filename" -> fname,
          "channel_no" -> ch.no,
          "channel_name" -> UTF8String.fromString(ch.name),
          "units" -> UTF8String.fromString(ch.units),
          "row_idx" -> ri,
          "raw" -> UTF8String.fromString(rawV),
          "value" -> v.orNull,
          "obs_time_utc" -> obsMicros.orNull)
        InternalRow.fromSeq(columns.toSeq.map(all))
      }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
