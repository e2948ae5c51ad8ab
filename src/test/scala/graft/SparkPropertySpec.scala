package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Batched randomized properties that need a SparkSession: generate a
  * few hundred adversarial inputs with ScalaCheck, load them as ONE
  * DataFrame, and assert the property over every row in ONE job (a
  * per-case forAll would pay a Spark job per example).
  */
class SparkPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // URL soup: scheme/host/port/path/query/fragment fragments assembled
  // with deliberate junk — mixed case, default and non-default ports,
  // tracking params, duplicate params, trailing slashes, missing
  // schemes (must pass through unchanged), empty queries.
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp", "")
    host <- Gen.oneOf("Example.COM", "a.b.c", "X--y.ORG", "localhost")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    depth <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(depth, Gen.oneOf("A", "b9", "c-d", "%20"))
    slashes <- Gen.oneOf("", "/", "//")
    params <- Gen.someOf(Seq("a=1", "B=2", "utm_source=x", "gclid=z",
      "a=1", "utm_campaign=Y", "q="))
    frag <- Gen.oneOf("", "#frag", "#a/b?c=1")
  } yield {
    val base = if (scheme.isEmpty) host else s"$scheme://$host"
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    base + port + segs.map("/" + _).mkString + slashes + q + frag
  }

  test("canonicalUrl is idempotent over adversarial URL soup (one batched job)") {
    val urls = samples(urlGen, 400).distinct
    val df = urls.toDF("u")
      .withColumn("c1", graft.functions.Text.canonicalUrl(col("u")))
    val bad = df
      .withColumn("c2", graft.functions.Text.canonicalUrl(col("c1")))
      .filter(col("c1") =!= col("c2"))
      .collect()
    assert(bad.isEmpty, "canonicalization is not idempotent:\n" +
      bad.take(5).map(r => s"  ${r.getString(0)} -> ${r.getString(1)} -> ${r.getString(2)}")
        .mkString("\n"))
    // and the parse-failure passthrough really is verbatim
    val noScheme = df.filter(!col("u").contains("://"))
      .filter(col("u") =!= col("c1")).collect()
    assert(noScheme.isEmpty, "unparseable URLs must pass through unchanged")
  }

  test("md5Long matches a pure-JVM replay and stays in [0, 2^60) (one batched job)") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', 'é', '中', '\t', '&')))
      .map(_.mkString)
    val strs = samples(strGen, 400).distinct
    val got = strs.toDF("s")
      .select(col("s"), graft.functions.Text.md5Long(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    strs.foreach { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val want = java.lang.Long.parseLong(hex.take(15), 16)
      assert(got(s) == want, s"md5Long diverges from JVM replay on '$s'")
      assert(got(s) >= 0L && got(s) < (1L << 60), s"md5Long out of range on '$s'")
    }
  }
}
