package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not an operator path): synthesize a larger scale factor from
  * the driver-generated sf0.1 fixture so Bench can smoke-test scaling
  * behavior the driver's fixtures stop short of (TESTDATA.md tops out at
  * sf0.1). Superlinear growth between sf0.1 and the synthesized sf1.0 —
  * hidden pair blowup, stream-key concentration — is exactly what
  * local[32]@sf0.1 structurally cannot catch.
  *
  * Synthesis rules, chosen to preserve each workload's SHAPE at 10×:
  *
  *  - Relational tables (`customer supplier part orders lineitem`) and
  *    `events` are replicated FACTOR× with per-replica key offsets
  *    (replica i adds i·(maxKey+1) to every primary/foreign key, with
  *    parent and child offset by the same stride). Join fanout per key,
  *    value distributions, and date ranges are bit-identical to the
  *    fixture — only cardinality grows, which is how TPC-H itself scales.
  *    `region`/`nation` are fixed dimensions and copy through unchanged.
  *
  *  - `documents` and `embeddings` are generated FRESH at FACTOR× count,
  *    because replicating them would hand every doc/vector 9 identical
  *    twins and turn every pair-generation operator (minhash bands,
  *    cosine near-dup, containment) into a duplicate-group blowup that
  *    says nothing about real scaling. Generation matches the fixture's
  *    measured statistics: uniform words from its 31-word vocab with
  *    'dup' at ~0.1%, uniform 10..100 words/doc, lang mix
  *    en/zh/es/fr/de ≈ 41/15/15/15/14%, 20 sources, ~4.5% of docs a
  *    word-mutated near-dup of their predecessor and ~0.16% an exact
  *    copy (the fixture's planted 60-char-prefix collision rate), and
  *    embeddings as unit-normalized 64-dim Gaussians over 10 labels
  *    (the fixture has no high-cosine planted pairs — max pairwise
  *    cosine < 0.75 — so independent vectors reproduce that regime).
  *
  * Everything is a pure function of (SEED, row id): re-running the tool
  * rewrites byte-identical content, so bench runs are reproducible.
  * Output defaults to target/bigdata/sf1.0 (gitignored — only the bench
  * JSON derived from it is committed).
  */
object ScaleUp {
  private val Seed = 0x5ca1ab1e5eedL

  // Fixture vocabulary (sf0.1 documents.parquet, all five langs share it;
  // 'dup' is the one rare word at ~0.094% of tokens).
  private val Common: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val Langs = Array("en", "zh", "es", "fr", "de")
  private val LangCum = Array(0.41, 0.56, 0.71, 0.858, 1.0)

  private def rngFor(id: Long, stream: Long): scala.util.Random =
    new scala.util.Random(Seed ^ java.lang.Long.rotateLeft(
      (id + 1) * 0x9E3779B97F4A7C15L, 17) ^ (stream * 0xC2B2AE3D27D4EB4FL))

  /** Base word list for doc `id` — pure in id so a variant doc can
    * regenerate its predecessor's words without a sequential scan.
    */
  private def baseWords(id: Long): Array[String] = {
    val r = rngFor(id, 1L)
    val n = 10 + r.nextInt(91)
    Array.fill(n) {
      if (r.nextDouble() < 0.001) "dup" else Common(r.nextInt(Common.length))
    }
  }

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  private def genDoc(id: Long): Doc = {
    val r = rngFor(id, 2L)
    val roll = r.nextDouble()
    val words =
      if (id > 0 && roll < 0.0016) baseWords(id - 1) // planted exact dup
      else if (id > 0 && roll < 0.045) {             // planted near-dup
        val base = baseWords(id - 1)
        base.map(w =>
          if (r.nextDouble() < 0.05) Common(r.nextInt(Common.length)) else w)
      } else baseWords(id)
    val u = r.nextDouble()
    val lang = Langs(LangCum.indexWhere(u <= _) match {
      case -1 => Langs.length - 1; case i => i
    })
    val text = words.mkString(" ")
    Doc(id, text, lang, s"src${r.nextInt(20)}", text.length.toLong)
  }

  private def genEmb(id: Long): Emb = {
    val r = rngFor(id, 3L)
    val v = Array.fill(64)(r.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    Emb(id, v.map(x => (x / n).toFloat), r.nextInt(10))
  }

  /** FACTOR copies of `df` with each key column shifted by
    * replica·(maxKey+1); maxes come from the named source tables so
    * parents and children shift by identical strides.
    */
  private def replicate(spark: SparkSession, df: DataFrame, factor: Int,
      keyStrides: Map[String, Long]): DataFrame = {
    val reps = spark.range(factor).toDF("rep")
    val rep = broadcast(reps).crossJoin(df)
    val cols = df.columns.map { c =>
      keyStrides.get(c) match {
        case Some(stride) => (col(c) + col("rep") * lit(stride)).as(c)
        case None => col(c)
      }
    }
    rep.select(cols.toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "target/bigdata/sf1.0")
    val factor = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "10").toInt
    val spark = Sessions.local(32, 32)
    import spark.implicits._

    def maxKey(table: String, col0: String): Long =
      Tables.load(spark, src, table).agg(max(col(col0))).as[Long].head() + 1L

    val cStride = maxKey("customer", "c_custkey")
    val sStride = maxKey("supplier", "s_suppkey")
    val pStride = maxKey("part", "p_partkey")
    val oStride = maxKey("orders", "o_orderkey")
    val eStride = maxKey("events", "event_id")
    val uStride = maxKey("events", "user_id")

    val strides: Map[String, Map[String, Long]] = Map(
      "customer" -> Map("c_custkey" -> cStride),
      "supplier" -> Map("s_suppkey" -> sStride),
      "part" -> Map("p_partkey" -> pStride),
      "orders" -> Map("o_orderkey" -> oStride, "o_custkey" -> cStride),
      "lineitem" -> Map("l_orderkey" -> oStride, "l_partkey" -> pStride,
        "l_suppkey" -> sStride),
      "events" -> Map("event_id" -> eStride, "user_id" -> uStride))

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SCALEUP $name rows=" +
        spark.read.parquet(s"$out/$name.parquet").count())
    }

    for (name <- Seq("region", "nation")) // fixed dims: copy through
      write(name, Tables.load(spark, src, name), 1)
    for ((name, ks) <- strides) {
      val parts = if (name == "lineitem" || name == "events") 32 else 8
      write(name, replicate(spark, Tables.load(spark, src, name), factor, ks),
        parts)
    }
    val nDocs = Tables.load(spark, src, "documents").count() * factor
    val nVecs = Tables.load(spark, src, "embeddings").count() * factor
    write("documents",
      spark.range(nDocs).as[Long].repartition(32).map(genDoc).toDF(), 32)
    write("embeddings",
      spark.range(nVecs).as[Long].repartition(32).map(genEmb).toDF(), 32)
    spark.stop()
  }
}
