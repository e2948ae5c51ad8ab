package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One decoded media payload (stub feature = 8-bin byte histogram). */
case class DecodedMedia(media_id: Long, format: String, byte_len: Int, feature: Seq[Double])

/** Multimodal column plumbing (SURVEY.md §2.C, m1): image/audio/video
  * travel as opaque `binary` columns with typed metadata. The Spark-side
  * mechanics — schema, partition-preserving batch iteration, typed
  * encoders — are real; the codec itself is a clearly marked
  * deterministic STUB (no image/audio libraries in this environment).
  */
object Multimodal {

  /** Magic-byte container sniffing — pure column expressions, codegen'd.
    * (Same detection bytes as the public file(1) magic database.)
    */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(bin, 1, 4)) // Spark hex() is uppercase
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8"), "jpeg")
      .when(head.startsWith("52494646"), "riff") // WAV/AVI family
      .when(head.startsWith("474946"), "gif")
      .otherwise("unknown")
  }

  /** "Frame sample": byte slices at a fixed stride — the shape of a video
    * frame-sampler (seek offsets known from container metadata), kept
    * declarative so Catalyst prunes/pushes around it.
    */
  def byteSample(bin: org.apache.spark.sql.Column, stride: Int, n: Int, width: Int): org.apache.spark.sql.Column =
    array((0 until n).map(j => substring(bin, 1 + j * stride, width)): _*)

  /** Strided frame fingerprints — the TYPED consumer API behind
    * m3_frame_sample: one 8-hex-char fingerprint per sampled
    * `frameLen`-byte frame at `stride` spacing, in frame order, as
    * array<string> (consumers index frames directly). Pure column
    * expressions over a per-row bounded sequence — no explode, order
    * preserved. `nFrames` must be the matching frame count
    * (`frameCount(payload, frameLen, stride)`). Registry twins that
    * need a driver-sortable scalar wrap this in `array_join(_, ",")`.
    */
  def frameCount(payload: org.apache.spark.sql.Column, frameLen: Int, stride: Int): org.apache.spark.sql.Column = {
    val n = length(payload)
    when(n >= frameLen, floor((n - frameLen) / stride).cast("int") + 1).otherwise(0)
  }

  def frameFingerprints(payload: org.apache.spark.sql.Column, nFrames: org.apache.spark.sql.Column,
                        frameLen: Int, stride: Int): org.apache.spark.sql.Column =
    // nFrames = 0 must yield an EMPTY array: Spark's sequence(0, -1)
    // counts DOWN to [0, -1] (the same pitfall Text.shinglesAt guards),
    // which would fabricate two garbage fingerprints for a payload that
    // has no frames at all.
    when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1),
        i => substring(md5(encode(payload.substr(i * stride + 1, lit(frameLen)), "UTF-8")), 1, 8)))
      .otherwise(array().cast("array<string>"))

  /** Batch "decode + featurize" over binary payloads via mapPartitions —
    * the partition-preserving, executor-local iteration a real codec
    * would use (one codec init per partition, streaming rows, no driver
    * involvement, explicit output encoder).
    *
    * STUB: the real decoder (e.g. JPEG → pixels) is replaced by a
    * deterministic 8-bin byte histogram so the pipeline shape is testable
    * in this environment. Swap `decodeOne` for a codec call in
    * production.
    */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol), sniffFormat(col(binCol)))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // a real implementation initializes its codec once per partition here
        it.map { case (id, bytes, fmt) => decodeOne(id, fmt, bytes) }
      }
      .toDF()
  }

  private def decodeOne(id: Long, fmt: String, bytes: Array[Byte]): DecodedMedia = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % 8) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    DecodedMedia(id, fmt, bytes.length, hist.map(_ / n).toSeq)
  }
}
