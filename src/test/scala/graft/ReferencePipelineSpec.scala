package graft

import graft.operators.ReferencePipeline
import org.apache.spark.sql.functions._

/** End-to-end conversion of the reference's sample archive through the
  * full pipeline: parse → classify → BODC → geo → partitioned sink.
  */
class ReferencePipelineSpec extends SparkSpec {

  private val base =
    "/root/reference/cioos_data_transform/ios_data_transform/ios_data_transform/tests/test_files"

  test("standardize assigns reference-style BODC codes per file") {
    val std = ReferencePipeline.standardize(spark, s"$base/ctd_profile/2017-020-0474.ctd")
    val codes = std.select("channel_name", "bodc").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // temperature ITS90 → TEMPS9 + 01; salinity PSS-78 → PSALST01;
    // oxygen mL/L → DOXYZZ01, umol/kg → DOXMZZ01; pressure fixed name
    assert(codes("Temperature:Primary") == "TEMPS901")
    assert(codes("Salinity:T0:C0") == "PSALST01")
    assert(codes("Oxygen:Dissolved:SBE") == "DOXYZZ01")
    assert(codes("Pressure") == "PRESPR01")
    assert(codes("Depth") == "depth")
    // conductivity S/m → CNDCST01
    assert(codes("Conductivity:Primary") == "CNDCST01")
    // excluded channels never appear
    assert(!codes.contains("Transmissivity"))
  }

  test("duplicate-class channels get distinct suffixes (oxygen ×2)") {
    val std = ReferencePipeline.standardize(spark, s"$base/ctd_profile/2017-020-0474.ctd")
    val oxy = std.filter(col("var_class") === "oxygen")
      .select("bodc").distinct().collect().map(_.getString(0)).sorted
    // file has Oxygen:Dissolved:SBE in mL/L AND umol/kg → different
    // bases, each suffixed 01
    assert(oxy.toSeq == Seq("DOXMZZ01", "DOXYZZ01"))
  }

  test("convertArchive writes prunable parquet and reports per-file stats") {
    val out = "target/tmp/ref_pipeline"
    // the reference's own 51-polygon geojson catalog drives geo-tagging
    val catalog = graft.functions.Geo.catalogFromGeoJson(spark, s"$base/ios_polygons.geojson")
    val summary = ReferencePipeline.convertArchive(spark, s"$base/ctd_profile/*.ctd", out, catalog)
    val rows = summary.collect()
    assert(rows.length == 6)
    // the Beaufort-Sea-area profiles resolve to a real polygon name
    assert(rows.exists(_.getAs[String]("geo_code").contains("Canadian-Arctic")))
    assert(rows.forall(_.getAs[Long]("n_vars") >= 5))
    assert(rows.forall(r => r.getAs[Long]("n_nonnull") <= r.getAs[Long]("n_values")))
    val back = spark.read.parquet(out)
    assert(back.select("var_class").distinct().count() >= 5)
    assert(back.filter(col("var_class") === "temperature").count() > 0)
    // profile metadata travels with every value row
    assert(back.filter(col("geo_code").isNull).count() == 0)
  }

  test("convertArchive emits the CF-attribute sidecar write_ctd_ncfile builds") {
    val out = "target/tmp/ref_pipeline_cf"
    ReferencePipeline.convertArchive(spark, s"$base/ctd_profile/*.ctd", out)
    val cf = spark.read.json(s"$out/_cf_attributes")
    val rows = cf.collect()
    assert(rows.length == 6)
    // the constants every reference NetCDF carries (write_ctd_ncfile.py:22-33)
    assert(rows.forall(_.getAs[String]("featureType") == "profile"))
    assert(rows.forall(_.getAs[String]("institution").startsWith(
      "Institute of Ocean Sciences")))
    assert(rows.forall(_.getAs[String]("summary").contains("CTDs mounted on rosettes")))
    assert(rows.forall(_.getAs[String]("cdm_profile_variables") == "time"))
    // identity block: %04d-%03d mission, event number, zfilled profile id
    val r474 = rows.find(_.getAs[String]("filename") == "2017-020-0474.ctd").get
    assert(r474.getAs[String]("mission_id") == "2017-020")
    assert(r474.getAs[String]("event_number") == "474")
    assert(r474.getAs[String]("profile_id") == "2017-020-0474")
    // instrument + admin fields and the full original header survive
    assert(r474.getAs[String]("scientist") != null)
    assert(r474.getAs[String]("instrument_type") != null)
    assert(r474.getAs[String]("header").contains("\"FILE\""))
    assert(!r474.isNullAt(r474.fieldIndex("latitude")))
  }

  test("per-variable CF attributes match OceanNcVar.add_var for the sample archive") {
    val std = ReferencePipeline.standardize(spark, s"$base/ctd_profile/2017-020-0474.ctd")
    val vars = ReferencePipeline.cfVariableAttributes(std).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    // measured channels: the add_var blocks (OceanNcVar.py:92-152) keyed
    // by the BODC names the standardizer already pinned above
    val t = vars("TEMPS901")
    assert(t.getAs[String]("long_name") == "Sea Water Temperature")
    assert(t.getAs[String]("standard_name") == "sea_water_temperature")
    assert(t.getAs[String]("units") == "deg C")
    val s = vars("PSALST01")
    assert(s.getAs[String]("long_name") == "Sea Water Practical Salinity")
    assert(s.getAs[String]("standard_name") == "sea_water_practical_salinity")
    assert(s.getAs[String]("units") == "PSS-78")
    // the two oxygen variants carry their unit-branch canonical units
    assert(vars("DOXYZZ01").getAs[String]("units") == "mL/L")
    assert(vars("DOXMZZ01").getAs[String]("units") == "umol/kg")
    assert(vars("DOXYZZ01").getAs[String]("standard_name") == "dissolved_oxygen_concentration")
    val p = vars("PRESPR01")
    assert(p.getAs[String]("standard_name") == "sea_water_pressure")
    assert(p.getAs[String]("units") == "decibar")
    assert(vars("CNDCST01").getAs[String]("units") == "S/m")
    assert(vars("depth").getAs[String]("standard_name") == "depth_below_sea_level_in_meters")
    // coordinate variables every dataset gets (+ the corrected lon
    // standard_name — the reference's copy-paste 'latitude' slip)
    assert(vars("time").getAs[String]("units") == "seconds since 1970-01-01 00:00:00+0000")
    assert(vars("latitude").getAs[String]("units") == "degrees_north")
    assert(vars("longitude").getAs[String]("standard_name") == "longitude")
    assert(vars("profile").getAs[String]("cf_role") == "profile_id")
  }

  test("convertArchive writes the per-variable sidecar next to the global one") {
    val out = "target/tmp/ref_pipeline_cfv"
    ReferencePipeline.convertArchive(spark, s"$base/ctd_profile/2017-020-0474.ctd", out)
    val v = spark.read.json(s"$out/_cf_variable_attributes")
    // 7 measured channels (2 temp-class rows collapse? no: distinct bodc)
    // + 4 coordinate rows for the single file
    assert(v.filter(col("name") === "TEMPS901").count() == 1)
    assert(v.filter(col("cf_role") === "profile_id").count() == 1)
    assert(v.select("filename").distinct().count() == 1)
  }

  test("CF sidecar routes mctd archives to the timeSeries featureType") {
    val cf = ReferencePipeline.cfAttributes(spark,
      s"$base/ctd_mooring/a1_20080429_20080518_0034m.ctd",
      datasetType = "mctd").collect()
    assert(cf.length == 1)
    // write_mctd_ncfile.py:20-22: timeSeries + the moorings summary
    assert(cf.head.getAs[String]("featureType") == "timeSeries")
    assert(cf.head.getAs[String]("summary").contains("mounted on moorings"))
    // bottle archives get the water-samples summary
    val bot = ReferencePipeline.cfAttributes(spark,
      s"$base/bot/1990-033-0002.che", datasetType = "bot").collect()
    assert(bot.head.getAs[String]("featureType") == "profile")
    assert(bot.head.getAs[String]("summary").contains("water samples"))
  }
}
