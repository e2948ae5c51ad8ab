package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the one
  * pipeline stage between raw corpus text and token-budget accounting
  * (t31 packing, t36 mixture sampling consume token counts; this is
  * where the vocabulary those counts assume comes from). Classic BPE
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"): start from characters, repeatedly merge the
  * most frequent adjacent symbol pair.
  *
  * What makes this formulation scale to a 100 TB corpus:
  *
  *  1. ONE corpus-sized pass total: the corpus collapses to a
  *     (word, count) table up front — one keyed aggregation — and every
  *     training round runs over DISTINCT WORDS (vocabulary-scale, many
  *     orders of magnitude smaller than the corpus).
  *  2. Each round is one keyed aggregation (pair counts, map-side
  *     combined) plus a 1-ROW argmax collect; the chosen merge is
  *     broadcast back into the next round as two string literals inside
  *     a codegen'd `replace` — no driver-side word data, ever.
  *  3. Segmentations are STRINGS, not arrays: a word's symbol sequence
  *     is `<0x01>sym<0x02><0x01>sym<0x02>…`, so applying a merge is a
  *     single non-overlapping left-to-right `replace` (whole-stage
  *     codegen; exactly the greedy semantics BPE specifies) instead of
  *     a lambda fold, and an external SQL engine can replay the round
  *     bit-for-bit with ITS `replace`.
  *  4. Rounds are vocab-bounded (`merges` is the vocabulary budget) and
  *     each round's plan is cut off with a localCheckpoint, so lineage
  *     stays O(1) instead of O(rounds).
  *
  * Determinism: pair counts are exact, and the argmax tie-breaks on
  * (count DESC, left ASC, right ASC) — a total order — so the learned
  * merge table is a pure function of the word-count table, invariant
  * under shuffle/partition layout (Round15Spec property-pins this).
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  private val O = "\u0001" // symbol open marker
  private val C = "\u0002" // symbol close marker

  /** Corpus → (w, cnt) word-frequency table: whitespace tokenization,
    * one keyed aggregation. Words carrying the segmentation marker
    * codepoints are dropped on BOTH the engine and oracle sides (they
    * cannot be represented; real pipelines byte-escape instead).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 &&
        !col("w").contains(O) && !col("w").contains(C))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** `word` → its initial character segmentation `<0x01>c<0x02>…`. */
  private def initialSeg(w: Column): Column =
    regexp_replace(w, "(.)", s"$O$$1$C")

  /** Symbol array of a segmentation string. */
  private def symbols(seg: Column): Column =
    split(regexp_replace(seg, s"^$O|$C$$", ""), s"$C$O")

  /** Train `merges` rounds over a (w, cnt) word table. Driver work per
    * round: exactly one 1-row collect (the argmax); all pair counting
    * and re-segmentation stays distributed. Stops early when no
    * adjacent pair remains (every word fused to one symbol).
    */
  def train(words: DataFrame, merges: Int): Seq[Merge] = {
    require(merges >= 0, s"merges must be >= 0, got $merges")
    var segs = words.select(col("cnt"), initialSeg(col("w")).as("seg"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val syms = symbols(col("seg"))
      val pairs = segs
        .select(col("cnt"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), posexplode(expr(
          "transform(slice(s, 1, size(s) - 1), (x, i) -> struct(x as l, s[i + 1] as r))")))
        .select(col("col.l").as("l"), col("col.r").as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("n"))
      val best = pairs.orderBy(desc("n"), asc("l"), asc("r")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rr, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(r + 1, l, rr, n)
        segs = segs.select(col("cnt"),
          replace(col("seg"), lit(s"$O$l$C$O$rr$C"), lit(s"$O$l$rr$C")).as("seg"))
          .localCheckpoint(true)
        r += 1
      }
    }
    val res = out.result()
    segs.unpersist()
    res
  }

  /** Re-segment a word table under an already-learned merge list (the
    * "apply tokenizer" half): merges apply in RANK order, each as the
    * same greedy left-to-right replace training used.
    */
  private def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val seg0 = initialSeg(col("w"))
    val seg = merges.foldLeft(seg0) { (s, m) =>
      replace(s, lit(s"$O${m.left}$C$O${m.right}$C"),
        lit(s"$O${m.left}${m.right}$C"))
    }
    words.withColumn("n_sym", size(symbols(seg)))
  }

  /** Per-document token counts under the learned vocabulary: explode
    * words, broadcast-join the vocab-scale (word → symbol count) table,
    * one keyed sum. Documents whose text yields no countable word get
    * n_tokens = 0 (they stay in the output).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val vocab = applyMerges(
      docs.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
        .filter(length(col("w")) > 0 &&
          !col("w").contains(O) && !col("w").contains(C))
        .distinct(), merges)
    val docWords = docs.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 &&
        !col("w").contains(O) && !col("w").contains(C))
    docs.select(col(idCol)).distinct()
      .join(
        docWords.join(broadcast(vocab), Seq("w"))
          .groupBy(idCol).agg(sum("n_sym").as("__n")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__n"), lit(0L)).as("n_tokens"))
  }
}
