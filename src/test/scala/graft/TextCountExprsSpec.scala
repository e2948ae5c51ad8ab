package graft

import graft.functions.Text
import graft.plans.{LetterCountsExpr, MatchCountExpr}
import org.apache.spark.sql.functions._

/** Parity pins for the counting kernels against the declarative forms
  * they replace (match counts via size(regexp_extract_all(...)), letter
  * counts via length-after-replace diffs).
  */
class TextCountExprsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "",
    "plain words and digits 123 mixed-symbols; {braces} (parens)",
    "tabs\tand\nnewlines\r\nand   spaces",
    "UPPER lower MiXeD 42x7",
    "éàü unicode wörds 漢字テキスト with ascii too",
    "aaa bbb aaa zzz qqq",
    "!@#$%^&*()",
    "a" * 500 + " " + "b" * 300,
    "the quick brown fox jumps over 99 lazy dogs!"
  )

  test("MatchCountExpr(bpePattern) == size(regexp_extract_all(bpePattern))") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bad = df.select(col("id"),
        MatchCountExpr(col("text"), Text.bpePattern).as("a"),
        size(regexp_extract_all(col("text"), lit(Text.bpePattern), lit(0))).as("b"))
      .collect().filter(r => r.getInt(1) != r.getInt(2))
    assert(bad.isEmpty, bad.map(r =>
      s"id=${r.getLong(0)}: ${r.getInt(1)} vs ${r.getInt(2)}").mkString("; "))
  }

  test("LetterCountsExpr == 26 length-after-replace counts over lower(text)") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val lt = lower(col("text"))
    def cnt(ch: Char) = length(lt) - length(replace(lt, lit(ch.toString), lit("")))
    val declared = array(('a' to 'z').map(cnt): _*)
    val bad = df.select(col("id"),
        LetterCountsExpr(lower(col("text"))).as("a"), declared.as("b"))
      .collect().filter(r => r.getSeq[Int](1) != r.getSeq[Int](2))
    assert(bad.isEmpty, bad.map(r =>
      s"id=${r.getLong(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}").mkString("; "))
  }

  test("null text yields null counts") {
    val df = Seq((1L, null: String)).toDF("id", "text")
    val r = df.select(MatchCountExpr(col("text"), Text.bpePattern).as("a"),
      LetterCountsExpr(col("text")).as("b")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
