package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches as a pure counter — the fused
  * form of `size(regexp_extract_all(text, pattern, 0))`, which (like
  * Spark's own `regexp_count`, a RuntimeReplaceable to exactly that
  * expression) materializes EVERY match into a UTF8String array just to
  * take its length. For token-piece counting (t1/t31/t36's bpePattern,
  * where every token and symbol is a match) that array is the document
  * itself re-allocated. Here the same compiled Pattern runs the same
  * `find()` loop over the same `toString` — match count is definitionally
  * identical — and only a counter survives.
  */
case class MatchCountExpr(child: Expression, pattern: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_match_count expects string, got $other")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_match_count"

  @transient private lazy val matcher: ThreadLocal[java.util.regex.Matcher] = {
    val p = Pattern.compile(pattern)
    ThreadLocal.withInitial(() => p.matcher(""))
  }

  override def nullSafeEval(v: Any): Any =
    countMatches(v.asInstanceOf[UTF8String])

  /** Shared by the interpreted eval and the generated code (one body,
    * two entry points — the paths cannot diverge). The final reset("")
    * releases the document reference the ThreadLocal matcher would
    * otherwise pin until the thread's next row (ADVICE r17).
    */
  def countMatches(v: UTF8String): Int = {
    val m = matcher.get()
    m.reset(v.toString)
    var n = 0
    while (m.find()) n += 1
    m.reset("")
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matchCount", this, classOf[MatchCountExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countMatches($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MatchCountExpr {
  def apply(text: org.apache.spark.sql.Column, pattern: String)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      new MatchCountExpr(org.apache.spark.sql.GraftSqlShim.expression(text), pattern))
}

/** a–z occurrence counts in ONE byte scan — the fused form of t15's 26
  * `length(lt) - length(replace(lt, ch, ""))` char counts, each of which
  * allocates a full copy of the (lowered) document. Element i+1 is the
  * count of ASCII letter ('a' + i). The input is the ALREADY-LOWERED
  * text (lower() stays outside: Unicode lowercasing can produce ASCII
  * letters, e.g. KELVIN SIGN → k, so folding it in here would change
  * counts); ASCII bytes never occur inside UTF-8 multibyte sequences, so
  * the byte scan counts exactly what the per-char replace-diff counted.
  */
case class LetterCountsExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_letter_counts expects string, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_letter_counts"

  override def nullSafeEval(v: Any): Any =
    letterCounts(v.asInstanceOf[UTF8String])

  /** Shared by the interpreted eval and the generated code. */
  def letterCounts(v: UTF8String): ArrayData = {
    val bytes = v.getBytes
    val counts = new Array[Int](26)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("letterCounts", this, classOf[LetterCountsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.letterCounts($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LetterCountsExpr {
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      new LetterCountsExpr(org.apache.spark.sql.GraftSqlShim.expression(text)))
}
