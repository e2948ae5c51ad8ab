package graft

import org.apache.spark.sql.functions._

/** Round-10 pins: the composite (lang, pack_shard) packing stream key
  * that replaces the bounded-cardinality bare-lang key in t19/t31.
  */
class Round10Spec extends SparkSpec {

  /** Pure-Scala replay of the salted portable shard hash the packing
    * queries use (Text.md5Long("pack:" || doc_id) % 8): first 15 hex
    * chars of the md5 digest parsed base-16 — 60 bits, never negative.
    */
  private def expectedShard(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pack:$docId".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 8L
  }

  test("t31: packing streams outnumber languages and shards match the salted hash") {
    // the scale fix this round exists for: window parallelism must be
    // bounded by langs × shards, not by the language count
    val rows = SparkEntry.queries("t31_sequence_pack")(spark, sfDir)
      .select("lang", "pack_shard", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val langs = rows.map(_._1).distinct.length
    val streams = rows.map(t => (t._1, t._2)).distinct.length
    assert(streams > langs,
      s"composite key added no parallelism: $streams streams vs $langs langs")
    rows.foreach { case (lang, shard, id) =>
      assert(shard == expectedShard(id),
        s"$lang/$id shard $shard != salted-hash ${expectedShard(id)}")
    }
    // uniform hash ⇒ no stream hoards its language (loose 4× bound on
    // the tiny fixture; exact balance is t32's territory)
    rows.groupBy(_._1).foreach { case (lang, ds) =>
      val perStream = ds.groupBy(_._2).values.map(_.size)
      assert(perStream.max <= math.max(4.0 * ds.size / 8, 8.0),
        s"$lang stream skew: ${perStream.max} of ${ds.size}")
    }
  }

  test("t31 and t19 agree on the stream assignment and its totals") {
    // both packing ops must read the same stream universe: every
    // (lang, pack_shard, total tokens over the stream) visible to the
    // chunk rollup must be derivable from the per-doc chop output
    val t31 = SparkEntry.queries("t31_sequence_pack")(spark, sfDir)
      .groupBy("lang", "pack_shard").agg(sum("toks").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val t19 = SparkEntry.queries("t19_context_pack")(spark, sfDir)
      .groupBy("lang", "pack_shard").agg(sum("chunk_toks").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t31.nonEmpty && t19.nonEmpty)
    // t19 counts whitespace tokens, t31 BPE-ish tokens — totals differ,
    // but the stream key sets must coincide (same salted hash, same mod)
    assert(t31.keySet == t19.keySet,
      s"stream universes diverge: ${(t31.keySet diff t19.keySet).take(3)} / " +
        s"${(t19.keySet diff t31.keySet).take(3)}")
  }

  test("t19: chunk ids tile each stream contiguously from zero") {
    val rows = SparkEntry.queries("t19_context_pack")(spark, sfDir)
      .select("lang", "pack_shard", "chunk_id", "n_docs", "chunk_toks")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (stream, ds) =>
      val ids = ds.map(_._2).sorted
      assert(ids.head == 0L, s"$stream first chunk is ${ids.head}, not 0")
      assert(ids.toSeq == (0L until ids.length).toSeq,
        s"$stream chunk ids have gaps")
      ds.foreach { case (_, cid, nDocs, toks) =>
        assert(nDocs >= 1 && toks >= nDocs, s"$stream/$cid degenerate chunk")
      }
    }
  }
}
