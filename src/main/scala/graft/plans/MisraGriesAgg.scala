package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a custom TypedImperativeAggregate
  * (SURVEY.md §2.E) — the "which items dominate" companion to the CMS
  * frequency sketch: CMS answers "how often is X", Misra-Gries answers
  * "which X matter" without knowing the candidates up front.
  *
  * Buffer: at most k (item → counter) entries. Update is the classic
  * decrement-all step; merge is the Agarwal et al. mergeable-summaries
  * rule (sum counters, then subtract the (k+1)-th largest count and drop
  * non-positive entries), which keeps the sketch mergeable in ANY order —
  * the property that lets map-side partials combine across a 100 TB
  * shuffle with ≤ k·(8+item) bytes per partition in flight.
  *
  * Guarantees (standard MG with k counters over N rows): every item with
  * true frequency > N/(k+1) is present, and each reported counter
  * underestimates the true count by at most N/(k+1). Spec-pinned in
  * Round5Spec.
  *
  * Output: array<struct<item:string, cnt:long>> sorted by (-cnt, item) —
  * deterministic, engine-portable, and explodable with plain SQL.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra-gries needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // decrement-all; drop zeros (amortized O(1) per row)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (_, c) => c - 1L }
          buf.foreach { case (key, c) => if (c <= 0L) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) => b1.update(item, b1.getOrElse(item, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from everything
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val s = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace { (_, c) => c - s }
      b1.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    val rows: Array[Any] = sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // int-length-prefixed bytes, not writeUTF: writeUTF caps the encoded
    // item at 64 KiB, which a sketch over whole documents would exceed
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
