package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-group bloom filter over a string column as a custom
  * TypedImperativeAggregate — the build side of POINT-LOOKUP file
  * skipping in `SnapshotTable`'s stats sidecars (SURVEY.md §2.E).
  * `df.stat.bloomFilter` builds one filter for a whole frame; file-level
  * skipping needs one PER GROUP (per data file), which only an aggregate
  * can express without a per-file driver loop.
  *
  * Input: the raw string column (UTF-8 bytes are fed to the filter, so
  * the probe side — `mightContainBinary(value.getBytes(UTF_8))` — needs
  * no session to replay the hash). Partials combine map-side (bloom
  * union is bitwise OR at equal parameters), so the aggregate is
  * merge-safe and sized `~1.2·expectedItems` BYTES per group regardless
  * of input rows — the mergeable-metadata contract every sketch in this
  * package follows. NULLs are skipped (a NULL never equals a literal,
  * so the probe side never asks). An over-full group degrades the false
  * -positive rate, never correctness — bloom pruning is always
  * conservative.
  *
  * Output: the serialized filter (binary), readable by
  * `BloomFilter.readFrom` with no Spark session.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems >= 1, s"bloom expectedItems must be >= 1, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"bloom fpp must be in (0, 1), got $fpp")

  // type contract checked at ANALYSIS (the child is unresolved at
  // construction time when built through the Column API)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom input must be a string column, got ${child.dataType.simpleString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Probe a PER-ROW serialized bloom (left, binary) for a byte value
  * (right, binary or string) — the read half of [[BloomAgg]]. Built for
  * metadata-scale inputs (one row per file × column in a stats
  * sidecar), where per-row deserialization IS the whole job: probing
  * distributed keeps the planner's driver footprint at O(files)
  * booleans instead of O(files × bloom bytes) — the difference between
  * planning a point lookup over a 100 TB chain and OOMing the driver on
  * its own metadata. CodegenFallback is deliberate at this row count.
  */
case class BloomMightContainBinary(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType &&
        (right.dataType == BinaryType || right.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects (binary, binary|string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(bloom: Any, value: Any): Any = {
    val bf = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]]))
    val bytes = value match {
      case b: Array[Byte] => b
      case s: UTF8String => s.getBytes
    }
    bf.mightContainBinary(bytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainBinary =
    copy(left = newLeft, right = newRight)
}
