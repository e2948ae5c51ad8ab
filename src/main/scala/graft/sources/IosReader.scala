package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** One parsed file, flattened for Spark (profile-level metadata). */
case class IosProfile(
    filename: String,
    header_version: String,
    mission: Option[String],
    agency: Option[String],
    project: Option[String],
    station: Option[String],
    event_number: Option[String],
    latitude: Double,
    longitude: Double,
    start_time_utc: Option[Timestamp],
    dt_seconds: Option[Double],
    n_records: Int,
    n_channels: Int,
    n_data_rows: Int,
    header_json: String)

/** One observation value in long format — the Spark-native layout for
  * columnar processing of ragged multi-channel files.
  */
case class IosObservation(
    filename: String,
    channel_no: Int,
    channel_name: String,
    units: String,
    row_idx: Int,
    raw: String,
    value: Option[Double],
    obs_time_utc: Option[Timestamp])

/** Spark reader for IOS observation files: the driver only *lists* files;
  * content is read and parsed executor-side (`wholetext` rows →
  * mapPartitions over [[IosFileParser]]) so ingest parallelism scales
  * with the file count — the way a million-file archive must be loaded.
  *
  * The reference's per-file pipeline (ObsFile.import_data →
  * write_ctd_ncfile) becomes: `observations()` long rows → columnar
  * transforms (classification, BODC codes, pad-null — graft.functions) →
  * partitioned parquet sink.
  */
object IosReader {

  private def rawFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("wholetext", "true").format("text").load(pathGlob)
      .select(input_file_name().as("path"), col("value"))

  /** One row per file: header metadata, coordinates, UTC start time. */
  def profiles(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    rawFiles(spark, pathGlob).as[(String, String)].mapPartitions { it =>
      it.map { case (path, content) =>
        val p = IosFileParser.parse(path.split('/').last, content)
        IosProfile(p.filename, p.headerVersion,
          p.administration.get("MISSION").orElse(p.administration.get("CRUISE")),
          p.administration.get("AGENCY"), p.administration.get("PROJECT"),
          p.location.get("STATION"), p.location.get("EVENT NUMBER"),
          p.latitude, p.longitude,
          p.startTimeUtc.map(Timestamp.from),
          p.timeIncrementSeconds, p.nRecords, p.channels.length, p.data.length,
          IosFileParser.headerJson(p))
      }
    }.toDF()
  }

  /** Long-format observations with pad→null applied and, for time-series
    * files (TIME INCREMENT present), the reference's `start + i·dt`
    * observation time.
    */
  def observations(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    rawFiles(spark, pathGlob).as[(String, String)].mapPartitions { it =>
      it.flatMap { case (path, content) =>
        val p = IosFileParser.parse(path.split('/').last, content)
        val pads: Int => Option[String] =
          i => p.details.lift(i).map(_.pad.trim).filter(_.nonEmpty)
            .orElse(p.file.get("PAD").map(_.trim))
        p.data.iterator.zipWithIndex.flatMap { case (row, ri) =>
          p.channels.iterator.zipWithIndex.map { case (ch, ci) =>
            val rawV = row.lift(ci).getOrElse("")
            val parsed = scala.util.Try(rawV.toDouble).toOption
            val v = parsed.filterNot(d => pads(ci).flatMap(pd =>
              scala.util.Try(pd.toDouble).toOption).contains(d))
            val obsTime = for {
              st <- p.startTimeUtc
              dt <- p.timeIncrementSeconds
              // microsecond precision, same quantization as the v2 source
            } yield Timestamp.from(st.plusNanos((dt * 1e6 * ri).toLong * 1000L))
            IosObservation(p.filename, ch.no, ch.name, ch.units, ri, rawV, v, obsTime)
          }
        }
      }
    }.toDF()
  }

  /** Incremental-ingest file diff (utils.compare_file_list,
    * utils.py:79-97): which of `all` are not yet in `done`, compared by
    * basename without extension — the reference's cronjob semantics for
    * "convert only new files".
    */
  def pendingFiles(all: Seq[String], done: Seq[String]): Seq[String] = {
    def stem(p: String) = p.split('/').last.split('.').head
    val doneSet = done.map(stem).toSet
    all.filterNot(f => doneSet.contains(stem(f)))
  }

  /** File age in hours relative to `nowMillis`, negative for files
    * modified in the past — the reference's `file_mod_time`
    * (utils.py:37-43, `(mtime − now)/3600`).
    */
  def fileModTimeHours(path: String, nowMillis: Long = System.currentTimeMillis()): Double =
    (java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path))
      .toMillis - nowMillis) / 3.6e6

  /** The cronjob's other "new-only" gate: keep only files touched within
    * the last `windowHours` (the reference skips conversion when
    * `file_mod_time(fname) < -24` in 'new' mode,
    * ios_data_transform_script.py:53-56). [[pendingFiles]] is the
    * inventory-diff variant for the same use case; this is the
    * time-window one — both are driver-side metadata filters over the
    * file listing, so at archive scale they cost one listing, not a scan.
    */
  def recentFiles(all: Seq[String], windowHours: Double = 24.0,
                  nowMillis: Long = System.currentTimeMillis()): Seq[String] =
    all.filter(f => fileModTimeHours(f, nowMillis) >= -windowHours)

  /** `.env` config parity (utils.import_env_variables, utils.py:21-35):
    * the key:value file the reference's cronjob reads so deployments are
    * independent of local folder layout. Faithful to the reference's
    * quirks, which ARE its contract:
    *  - parsing STOPS at the first blank line (the reference `break`s,
    *    not `continue`s) — trailing content after a blank line is
    *    intentionally dead;
    *  - lines whose first non-space char is '#' are comments;
    *  - value is the SECOND colon field only (`split(':')[1]`) — a value
    *    containing ':' (a URL, a windows path) is truncated at its own
    *    first colon, exactly as upstream;
    *  - a non-blank line without ':' raises (the reference dies on
    *    IndexError — loud beats a silently dropped config key);
    *  - duplicate keys: last one wins (dict assignment order).
    */
  def importEnvVariables(path: String): Map[String, String] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String])
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val it = lines.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val line = it.next()
      val t = line.trim
      if (t.isEmpty) stop = true
      else if (t.head == '#') ()
      else {
        val fields = line.split(':')
        require(fields.length >= 2,
          s"$path: malformed .env line (no ':'): '$line'")
        out(fields(0).trim) = fields(1).trim
      }
    }
    out.toMap
  }

  /** One archive job resolved from the `.env` map the way the
    * reference's convert_files dispatches on ftype
    * (ios_data_transform_script.py:20-41): raw/nc folders from
    * `{ftype}_raw_folder` / `{ftype}_nc_folder`, the shared
    * `geojson_file`, and the ftype's case-insensitive extension globs
    * (mctd also sweeps .CTD moorings; bot sweeps .BOT and .CHE).
    * Unknown ftypes throw — upstream prints an error and returns None,
    * and a silent no-op conversion is the one behavior not worth parity.
    */
  final case class ArchiveJob(rawFolder: String, ncFolder: String,
      geojsonFile: String, globPatterns: Seq[String])

  def archiveJob(env: Map[String, String], ftype: String): ArchiveJob = {
    val patterns = ftype match {
      case "ctd" => Seq("**/*.[Cc][Tt][Dd]")
      case "mctd" => Seq("**/*.[Cc][Tt][Dd]", "**/*.mctd")
      case "bot" => Seq("**/*.[Bb][Oo][Tt]", "**/*.[Cc][Hh][Ee]")
      case other => throw new IllegalArgumentException(
        s"ftype '$other' not understood (ctd | mctd | bot)")
    }
    def req(k: String) = env.getOrElse(k,
      throw new NoSuchElementException(s".env is missing '$k'"))
    ArchiveJob(req(s"${ftype}_raw_folder"), req(s"${ftype}_nc_folder"),
      req("geojson_file"), patterns)
  }

  /** Reference-pipeline sink: long observations enriched with variable
    * class (keyword rules) written as parquet partitioned by class — the
    * partition-prunable layout downstream readers want.
    */
  def writeStandardized(spark: SparkSession, pathGlob: String, outDir: String): Unit = {
    val obs = observations(spark, pathGlob)
      .withColumn("var_class", graft.functions.IosFunctions.classifyChannel(col("channel_name")))
    obs.write.mode("overwrite").partitionBy("var_class").parquet(outDir)
  }
}
