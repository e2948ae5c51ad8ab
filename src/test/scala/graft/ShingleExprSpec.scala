package graft

import graft.functions.Text
import graft.plans.ShingleMd5Expr
import org.apache.spark.sql.functions._

/** Bit-parity pin for the fused shingle-hash kernel against the
  * declarative form it replaces (split/trim tokenization, concat_ws
  * shingle build, md5→hex→conv 60-bit hash). The kernel is a pure
  * per-task-work optimization — any divergence here is a correctness
  * bug, not a tuning regression.
  */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(k: Int) =
    transform(Text.shinglesAt(Text.tokens(col("text")), k), s => Text.md5Long(s))

  private val edgeCases = Seq(
    "",
    " ",
    "   ",
    "\t",
    "\t\t\t",
    "a",
    " a ",
    "a b",
    "a b ",
    " a b",
    "a  b",
    "the quick brown fox jumps over the lazy dog",
    "\tfoo bar\n",
    "  x\ty  ",
    "a \t b  c \r\n d e f g",
    "héllo wörld ünïcode tókens here now",
    "  nbsp is not a java regex separator  ",
    "multi\nline\ntext with\ttabs and  double  spaces everywhere",
    "x " * 50,
    ("tok" + "漢字" + " ") * 20 // multibyte CJK inside tokens
  )

  test("kernel matches declarative positioned shingle hashes on edge cases (k=1,2,5)") {
    val df = edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (k <- Seq(1, 2, 5)) {
      val got = df.select(col("id"),
          ShingleMd5Expr(col("text"), k, skipEmpty = false).as("a"),
          declarative(k).as("b"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"k=$k id=${r.getLong(0)} text=${edgeCases(r.getLong(0).toInt)}: " +
            s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      }
    }
  }

  test("kernel matches declarative hashes on random whitespace soup") {
    val rng = new scala.util.Random(17)
    val alphabet = "ab c\td\ne\r é漢 fgh  "
    val rows = (0 until 400).map { i =>
      val len = rng.nextInt(120)
      (i.toLong, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "text")
    for (k <- Seq(1, 3)) {
      val bad = df.select(col("id"),
          ShingleMd5Expr(col("text"), k, skipEmpty = false).as("a"),
          declarative(k).as("b"))
        .collect()
        .filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
      assert(bad.isEmpty,
        if (bad.isEmpty) "" else s"k=$k mismatches on ids ${bad.map(_.getLong(0)).toSeq} " +
          s"e.g. '${rows(bad.head.getLong(0).toInt)._2}'")
    }
  }

  test("skipEmpty matches the filtered per-token hash form (t34 shape)") {
    val df = (edgeCases ++ Seq("skip  empty \t tokens ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val declared = transform(
      filter(split(trim(col("text")), "\\s+"), x => x =!= ""),
      t => Text.md5Long(t))
    val bad = df.select(col("id"),
        ShingleMd5Expr(col("text"), 1, skipEmpty = true).as("a"),
        declared.as("b"))
      .collect().filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
    assert(bad.isEmpty, s"mismatches on ids ${bad.map(_.getLong(0)).toSeq}")
  }

  test("full-digest mode matches md5(shingle-string) hex for hex (join identity)") {
    val df = edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (k <- Seq(1, 3, 13)) {
      val got = df.select(col("id"),
          transform(graft.plans.ShingleMd5Expr.full(col("text"), k),
            b => lower(hex(b))).as("a"),
          transform(Text.shinglesAt(Text.tokens(col("text")), k), s => md5(s)).as("b"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k id=${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("null text yields null, short docs yield empty") {
    val df = Seq((1L, null: String), (2L, "one two")).toDF("id", "text")
    val got = df.select(col("id"), ShingleMd5Expr(col("text"), 5, skipEmpty = false).as("a"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).exists(_.asInstanceOf[scala.collection.Seq[_]].isEmpty))
  }
}
