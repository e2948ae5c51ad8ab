package graft

import graft.sources.{IosFileParser, IosReader}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Corpus-wide conversion of EVERY file the reference's own test loop
  * runs (tests/test.py:48-55: ctd_mooring, ctd_profile, bot — plus the
  * current_meter file its suite ships but loops separately), each pinned
  * by per-file row/channel counts and the geo code the reference's
  * 51-polygon ios_polygons.geojson resolves. Zero skips: the inventory
  * itself is asserted, so a file that stops parsing OR disappears from
  * the glob fails loudly.
  */
class IosCorpusSpec extends SparkSpec {

  private val base =
    "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"

  private def listDir(dir: String): Seq[String] =
    Files.list(Paths.get(s"$base/$dir")).iterator().asScala
      .map(_.toString).filterNot(_.endsWith(".geojson")).toSeq.sorted

  // the reference test loop's directories with their expected inventory
  private val inventory = Map(
    "ctd_mooring" -> 9, "ctd_profile" -> 6, "bot" -> 19, "current_meter" -> 1)

  test("inventory: the reference's test corpus is fully enumerated") {
    inventory.foreach { case (dir, n) =>
      val files = listDir(dir)
      assert(files.length == n, s"$dir: found ${files.length}, expected $n")
    }
  }

  test("every corpus file parses with self-consistent counts, coords, and time") {
    val all = inventory.keys.toSeq.flatMap(listDir)
    assert(all.length == inventory.values.sum)
    all.foreach { path =>
      val name = path.split('/').last
      val p = IosFileParser.parse(name,
        new String(Files.readAllBytes(Paths.get(path)), "ISO-8859-1"))
      assert(p.nRecords > 0, s"$name: no records")
      assert(p.data.length == p.nRecords,
        s"$name: parsed ${p.data.length} rows vs declared ${p.nRecords}")
      // .CUR files ship no $TABLE: CHANNEL DETAIL — the FORMAT line
      // drives their read — so details are either absent or 1:1
      assert(p.channels.nonEmpty &&
        (p.details.isEmpty || p.channels.length == p.details.length),
        s"$name: ${p.channels.length} channels vs ${p.details.length} details")
      assert(p.data.forall(_.length == p.channels.length),
        s"$name: a data row does not span the channel table")
      assert(p.latitude > 40.0 && p.latitude < 80.0, s"$name: lat ${p.latitude}")
      assert(p.longitude > -180.0 && p.longitude < -100.0, s"$name: lon ${p.longitude}")
      assert(p.startTimeUtc.isDefined, s"$name: no start time")
    }
  }

  test("observations() emits exactly records × channels rows for every file") {
    inventory.keys.foreach { dir =>
      listDir(dir).foreach { path =>
        val name = path.split('/').last
        val p = IosFileParser.parse(name,
          new String(Files.readAllBytes(Paths.get(path)), "ISO-8859-1"))
        val n = IosReader.observations(spark, path).count()
        assert(n == p.nRecords.toLong * p.channels.length,
          s"$name: $n obs rows vs ${p.nRecords} × ${p.channels.length}")
      }
    }
  }

  test("convertArchive resolves every corpus file to its pinned geo code and stats") {
    // expected (geo_code, n_vars, n_values) per file, computed once
    // through this pipeline against the reference's ios_polygons.geojson
    // and pinned: multi-polygon hits concatenate like find_geographic_area
    val svi = "Southern-Vancouver-Island-Shelf-(Stations-B-and-D) "
    val sviC = "Southern-Vancouver-Island-Shelf-(Station-C) " + svi
    val nvi = "Northern-Vancouver-Island-Shelf "
    val want: Map[String, (String, Long, Long)] = Map(
      "a1_20080429_20080518_0034m.ctd" -> (svi, 2L, 5294L),
      "a1_20140627_20150801_0035m.ctd" -> (svi, 3L, 57621L),
      "a1_20140627_20150801_0100m.ctd" -> (svi, 3L, 57621L),
      "a1_20140627_20150801_0175m.ctd" -> (svi, 3L, 57621L),
      "a1_20140627_20150801_0300m.ctd" -> (svi, 3L, 172863L),
      "a1_20140627_20150801_0489m.ctd" -> (svi, 3L, 57621L),
      "e01_20140628_20150801_0035m.ctd" -> (svi, 3L, 57345L),
      "e01_20140628_20150801_0075m.ctd" -> (svi, 3L, 57345L),
      "e01_20140628_20150801_0093m.ctd" -> (svi, 3L, 172101L),
      "2017-020-0474.ctd" -> ("Canadian-Arctic-Archipelago-South ", 7L, 1323L),
      "2017-08-0091.ctd" -> ("Alaska-Basin-East Line-P ", 6L, 2970L),
      "2017-23-0042.ctd" -> ("Hecate-Strait ", 6L, 1170L),
      "2017-42-1021.ctd" -> ("Northern-Vancouver-Island-Shelf ", 6L, 732L),
      "2017-64-0027.ctd" -> ("Tidal-Mixed ", 6L, 894L),
      "2017-78-0130.ctd" -> ("Johnston-and-Discovery ", 6L, 1470L),
      "1990-033-0002.che" -> (svi, 6L, 48L),
      "1990-033-0003.che" -> (svi, 3L, 9L),
      "1990-033-0004.che" -> (svi + "Line-P ", 3L, 9L),
      "1990-033-0005.che" -> (sviC, 3L, 9L),
      "1990-033-0006.che" -> (sviC, 3L, 9L),
      "1990-033-0007.che" -> (svi, 3L, 9L),
      "1990-033-0008.che" -> (svi, 6L, 60L),
      "1990-033-0009.che" -> (svi, 6L, 54L),
      "1990-033-0010.che" -> (svi + "Line-P ", 6L, 42L),
      "1990-033-0011.che" -> (svi, 6L, 48L),
      "1990-033-0012.che" -> (svi, 6L, 42L),
      "1990-033-0013.che" -> (svi, 6L, 60L),
      "1990-033-0014.che" -> (svi, 6L, 60L),
      "1990-033-0015.che" -> (svi, 6L, 42L),
      "1990-033-0016.che" -> (svi, 6L, 36L),
      "1990-033-0017.che" -> (nvi, 6L, 36L),
      "1990-033-0018.che" -> (nvi, 6L, 60L),
      "1990-033-0019.che" -> (nvi, 6L, 60L),
      "1990-033-0020.che" -> (nvi, 6L, 60L),
      "A1_19921028_19930504_0035m.CUR" -> (svi, 3L, 27066L))
    val catalog = graft.functions.Geo.catalogFromGeoJson(
      spark, s"$base/ios_polygons.geojson")
    val got = inventory.keys.toSeq.flatMap { dir =>
      graft.operators.ReferencePipeline
        .convertArchive(spark, s"$base/$dir/*.*", s"target/tmp/ios_corpus_$dir", catalog)
        .collect()
        .map(r => r.getAs[String]("filename") ->
          ((r.getAs[String]("geo_code"), r.getAs[Long]("n_vars"),
            r.getAs[Long]("n_values"))))
    }.toMap
    assert(got.keySet == want.keySet,
      s"file universe: missing ${want.keySet diff got.keySet}, " +
        s"extra ${got.keySet diff want.keySet}")
    want.foreach { case (f, w) =>
      assert(got(f) == w, s"$f: got ${got(f)}, want $w")
    }
    // every file resolves to a real polygon — never the 'None' fallback
    assert(got.values.forall(v => v._1.nonEmpty && !v._1.startsWith("None")))
  }
}
