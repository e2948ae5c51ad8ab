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

  /** Train `merges` rounds over a (w, cnt) word table. Stops early when
    * no adjacent pair remains (every word fused to one symbol).
    *
    * Bounded fast path (r18, the [[Dedup.connectedComponents]] pattern —
    * guide §1.2 step 1, fewer actions): the word table is VOCABULARY-
    * scale, so when it fits under `driverWordLimit` one bounded collect
    * replaces the whole per-round action ladder (a localCheckpoint job
    * plus a pair-count aggregation + 1-row argmax collect PER ROUND —
    * ~2·merges+1 Spark jobs) with a single job and an in-memory BPE loop
    * that replays the identical greedy semantics: exact pair counts,
    * argmax tie-broken on (count DESC, left ASC, right ASC) in UTF-8
    * BYTE order (Spark string ordering is unsigned byte comparison, NOT
    * Java's UTF-16 compareTo), merges applied left-to-right
    * non-overlapping exactly like the segmentation-string `replace`.
    * Round15Spec pins the two paths merge-for-merge.
    *
    * Overflowing word tables (a 100 TB corpus' open vocabulary) run the
    * distributed loop unchanged: per round one vocab-scale aggregation +
    * a 1-row argmax collect, no driver-side word data ever.
    */
  def train(words: DataFrame, merges: Int,
            driverWordLimit: Int = 1 << 20): Seq[Merge] = {
    require(merges >= 0, s"merges must be >= 0, got $merges")
    val bounded = words.select(col("w").cast("string"), col("cnt").cast("long"))
      .limit(driverWordLimit + 1).collect()
    if (bounded.length <= driverWordLimit)
      return trainLocal(bounded.map(r => (r.getString(0), r.getLong(1))), merges)
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

  /** Unsigned UTF-8 byte comparison — Spark's binary string ordering
    * (UTF8String.compareTo), which differs from Java String.compareTo
    * on supplementary characters (UTF-16 surrogates sort differently).
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** In-memory replay of the distributed training loop over a bounded
    * (word, count) table — same pair counts, same argmax total order,
    * same greedy left-to-right non-overlapping merge application (the
    * string `replace` never re-matches INTO its own replacement: the
    * merged symbol `lr` cannot equal the single symbol `l`, so scanning
    * resumes after the consumed pair exactly like the symbol-array walk
    * here).
    */
  private def trainLocal(words: Array[(String, Long)], merges: Int): Seq[Merge] = {
    // each word as its character-symbol array (codepoint-safe: the
    // initialSeg regex "(.)"-wraps CHARACTERS, and Java's "." matches a
    // full codepoint, so surrogate pairs stay one symbol)
    var segs: Array[Array[String]] = words.map { case (w, _) =>
      val out = new Array[String](w.codePointCount(0, w.length))
      var i = 0
      var o = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        out(o) = w.substring(i, i + n)
        i += n
        o += 1
      }
      out
    }
    val cnts = words.map(_._2)
    val out = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val pairCnt = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < segs.length) {
        val s = segs(wi)
        val c = cnts(wi)
        var i = 0
        while (i < s.length - 1) {
          pairCnt.merge((s(i), s(i + 1)), c, _ + _)
          i += 1
        }
        wi += 1
      }
      if (pairCnt.isEmpty) exhausted = true
      else {
        var bl: String = null
        var br: String = null
        var bn = Long.MinValue
        val it = pairCnt.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val (l, rr) = e.getKey
          val n = e.getValue
          val better = n > bn || (n == bn && {
            val dl = utf8Cmp(l, bl)
            dl < 0 || (dl == 0 && utf8Cmp(rr, br) < 0)
          })
          if (better) { bl = l; br = rr; bn = n }
        }
        out += Merge(r + 1, bl, br, bn)
        segs = segs.map { s =>
          if (s.length < 2) s
          else {
            val nb = Array.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == bl && s(i + 1) == br) {
                nb += bl + br
                i += 2
              } else {
                nb += s(i)
                i += 1
              }
            }
            nb.result()
          }
        }
        r += 1
      }
    }
    out.result()
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
