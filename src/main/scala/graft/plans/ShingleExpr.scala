package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positioned k-token-shingle md5 hashes as ONE primitive per-row loop —
  * the fused form of
  * `transform(shinglesAt(split(trim(text), "\\s+"), k), s => md5Long(s))`
  * (see [[graft.functions.Text.md5Long]] / [[graft.functions.Text.shinglesAt]]).
  * Element i+1 is the 60-bit portable hash of the shingle starting at
  * 0-based token position i, so `posexplode` recovers (position, hash)
  * pairs exactly like the declarative form.
  *
  * Why a native Expression (same tier as [[WinnowingFpExpr]]): the
  * composable form evaluates interpretively per SHINGLE — a concat_ws
  * UTF8String allocation, an md5 hex-string allocation, a substring and
  * a base-16 `conv` parse — and at corpus scale the shingle count IS the
  * corpus token count. Here the text is tokenized once with a byte-range
  * walk, each shingle feeds the (thread-local, reused) MessageDigest
  * directly from the original byte array — zero per-shingle allocation
  * beyond the 16-byte digest — and the 60-bit prefix is read from the
  * raw digest bytes, skipping the hex round trip entirely.
  *
  * Parity contract (pinned bit-for-bit by ShingleExprSpec against the
  * declarative form, and transitively by the DuckDB oracle gate):
  *  - tokenization is `split(trim(text), "\\s+")`: ASCII-space (0x20)
  *    trim at both ends, then a Java-regex split with limit -1 — a
  *    LEADING separator run yields a leading empty token and a TRAILING
  *    (non-space, e.g. \t) separator run yields a trailing empty token,
  *    both of which participate in shingles; the empty string yields
  *    one empty token. Separators are Java `\s` = [ \t\n\x0B\f\r]
  *    (all ASCII, so byte-level scanning is UTF-8-safe).
  *  - the shingle string is the k tokens joined with a single 0x20, and
  *    the hash is `conv(substring(md5(s),1,15),16,10)` = the digest's
  *    first 60 bits big-endian (what DuckDB replays).
  *
  * `skipEmpty` drops empty tokens before shingling — the fused form of
  * `filter(split(trim(text), "\\s+"), t => t =!= "")` feeding per-token
  * (k = 1) hashes (the t34 shape).
  *
  * `full` emits the COMPLETE 16-byte digest per shingle (array<binary>)
  * instead of the 60-bit prefix long — the fused form of
  * `md5(shingle-string)` used as a JOIN IDENTITY (t11/t35/t30): binary
  * equality of the raw digest is exactly hex-string equality of `md5()`
  * (hex encoding is injective), so join/distinct results are unchanged
  * while keys shrink from 32-char strings to 16 bytes.
  *
  * Docs shorter than k tokens yield an empty array. Null text yields
  * null (nullSafeEval), which every consumer explodes to zero rows —
  * the same rows the declarative form produces.
  */
case class ShingleMd5Expr(child: Expression, k: Int, skipEmpty: Boolean,
                          full: Boolean, distinct: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"degenerate shingle length k=$k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_md5 expects string, got $other")
    }
  override def dataType: DataType =
    if (full) ArrayType(BinaryType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_shingle_md5"

  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  override def nullSafeEval(v: Any): Any =
    hashShingles(v.asInstanceOf[UTF8String])

  /** Codegen entry point — the interpreted eval and the generated code
    * both call THIS method, so the two execution paths cannot diverge
    * (r17 shipped these kernels as CodegenFallback, which split the
    * enclosing WholeStageCodegen span and re-entered the interpreted
    * evaluator per row; a static-shaped call from generated code keeps
    * the span whole — VERDICT r17 §3 / ADVICE r17).
    */
  def hashShingles(v: UTF8String): ArrayData = {
    val bytes = v.getBytes
    // trim: ASCII space (0x20) only — Spark's trim(), not the regex class
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    // tokenize: byte ranges between separator runs, Java split(re, -1)
    // semantics — leading sep run => leading empty token, trailing sep
    // run => trailing empty token, "" => one empty token
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var n = 0
    def add(s: Int, e: Int): Unit = {
      if (n == starts.length) {
        starts = java.util.Arrays.copyOf(starts, n * 2)
        ends = java.util.Arrays.copyOf(ends, n * 2)
      }
      starts(n) = s; ends(n) = e; n += 1
    }
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isSep(bytes(i))) {
        var j = i + 1
        while (j < hi && isSep(bytes(j))) j += 1
        if (!(skipEmpty && tokStart == i)) add(tokStart, i)
        tokStart = j
        i = j
      } else i += 1
    }
    // the final segment: possibly empty (trailing separator run, or "")
    if (!(skipEmpty && tokStart == hi)) add(tokStart, hi)
    if (n < k)
      return new GenericArrayData(
        if (full) Array.empty[Array[Byte]] else Array.empty[Long])
    val md = ShingleMd5Expr.digest.get()
    val nOut = n - k + 1
    val outL = if (full) null else new Array[Long](nOut)
    val outB = if (full) new Array[Array[Byte]](nOut) else null
    // `distinct` dedups IN the hashing pass, first occurrence kept —
    // exactly array_distinct's contract, minus the extra array walk.
    // For the binary (full) mode this matters beyond the saved pass:
    // Spark's array_distinct over array<binary> hits the
    // non-proper-equals fallback that compares elements PAIRWISE —
    // O(shingles²) per document (r17 ADVICE) — where the ByteBuffer
    // hash set here stays O(shingles).
    val seenL = if (distinct && !full) new java.util.HashSet[java.lang.Long]() else null
    val seenB = if (distinct && full) new java.util.HashSet[java.nio.ByteBuffer]() else null
    var o = 0
    var p = 0
    while (p <= n - k) {
      md.reset()
      var j = p
      while (j < p + k) {
        if (j > p) md.update(' '.toByte)
        md.update(bytes, starts(j), ends(j) - starts(j))
        j += 1
      }
      val d = md.digest()
      if (full) {
        if (seenB == null || seenB.add(java.nio.ByteBuffer.wrap(d))) { outB(o) = d; o += 1 }
      } else {
        // first 15 hex chars of md5 parsed base-16 = first 60 bits BE
        var acc = 0L
        var b = 0
        while (b < 7) { acc = (acc << 8) | (d(b) & 0xffL); b += 1 }
        val h = (acc << 4) | ((d(7) & 0xffL) >>> 4)
        if (seenL == null || seenL.add(h)) { outL(o) = h; o += 1 }
      }
      p += 1
    }
    new GenericArrayData(
      if (full) { if (o == nOut) outB else java.util.Arrays.copyOf(outB, o) }
      else { if (o == nOut) outL else java.util.Arrays.copyOf(outL, o) })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMd5", this, classOf[ShingleMd5Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hashShingles($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleMd5Expr {
  /** MessageDigest is stateful and not thread-safe — one per task thread. */
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Column-facing constructor (60-bit prefix longs). */
  def apply(text: org.apache.spark.sql.Column, k: Int, skipEmpty: Boolean,
            distinct: Boolean = false): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      new ShingleMd5Expr(org.apache.spark.sql.GraftSqlShim.expression(text), k, skipEmpty,
        full = false, distinct = distinct))

  /** Column-facing constructor, full 16-byte digests (join-identity mode). */
  def full(text: org.apache.spark.sql.Column, k: Int, distinct: Boolean = false)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      new ShingleMd5Expr(org.apache.spark.sql.GraftSqlShim.expression(text), k,
        skipEmpty = false, full = true, distinct = distinct))
}
