package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Historical ADCIRC harvest-file archival — Spark restatement of
  * scripts/mvHistADCIRCFiles.py: decode run metadata out of long-form
  * historical file names (:106-131), resolve each file's model run id
  * through the dashboard EAV store (getInstanceID + property
  * cross-check, :11-47, :135-162), emit the manifest (:164-170), and
  * re-lay the files into per-run directories under the short canonical
  * names `FORECAST_<STATIONTYPE>.csv` / `meta_FORECAST_<STATIONTYPE>.csv`
  * that the model ingest consumes (:173-201 → IngestCli.modelRunIngest).
  *
  * The reference loops file-by-file on the driver with one DB query per
  * file; here the decode is pure column expressions and the uid →
  * instance_id → run-property resolution is ONE join + ONE pivot over
  * the whole file list — the shape that survives millions of archived
  * files. Only the final copy step is driver-side (it is filesystem
  * control plane, bounded by the manifest row count).
  */
object HistoricalArchive {

  /** Positional file-name decode (mvHistADCIRCFiles.py:106-131).
    * Layout: `<model>_<storm>_<location>_<ENSEMBLE>_<GRID>_FORECAST_
    * <STATIONTYPE>_<advisory>_<currentdate>_<timestamp>.csv`, with a
    * two-segment storm (`coamps_<x>`) shifting the next fields right
    * one. Emits one row per file with the decoded columns plus
    * `uid = <advisory-digits>-<ensemble>` — the dashboard DB's run key.
    */
  def decodeFileNames(files: DataFrame, fileCol: String = "file_name"): DataFrame = {
    val parts = split(col(fileCol), "_")
    def at(i: Int): Column = element_at(parts, i)
    val isCoamps = at(2) === "coamps"
    val storm = when(isCoamps, concat_ws("_", at(2), at(3))).otherwise(at(2))
    val location = when(isCoamps, at(4)).otherwise(at(3))
    val ensemble = lower(when(isCoamps, at(5)).otherwise(at(4)))
    // advisory '2023-04-23T06:00:00' -> '2023042306' (strip '-', cut at
    // ':', strip 'T')
    val advisory = translate(
      element_at(split(translate(at(-3), "-", ""), ":"), 1), "T", "")
    val dparts = split(translate(at(-2), "-", ""), "T")
    // grid: the segment between the uppercased ensemble and _FORECAST_;
    // for nowcast files the reference takes everything after _NOWCAST_
    // verbatim (mvHistADCIRCFiles.py:128-131) — reproduced as-is
    val grid = when(ensemble === "nowcast",
      element_at(split(col(fileCol), "_NOWCAST_"), 2))
      .otherwise(element_at(
        split(element_at(split(col(fileCol), "_FORECAST_"), 1),
          concat(lit("_"), upper(ensemble), lit("_"))), 2))
    files.select(
      col(fileCol).as("file_name"),
      at(1).as("suite_model"),
      storm.as("storm"),
      location.as("physical_location"),
      ensemble.as("forcing_ensemblename"),
      at(-4).as("station_type"),
      advisory.as("advisory"),
      element_at(dparts, 1).as("time_currentdate"),
      element_at(split(element_at(dparts, 2), ":"), 1).as("time_currentcycle"),
      grid.as("adcirc_grid"),
      concat(advisory, lit("-"), ensemble).as("uid"))
  }

  /** Build the archival manifest (mvHistADCIRCFiles.py:135-170): join
    * the decoded files to the EAV store's (uid → instance_id) mapping,
    * pivot every candidate run's 13 properties at once (A6 over ALL
    * runs — not a per-file query), and keep only files whose decoded
    * metadata cross-checks against the registered run: suite.model is
    * adcirc, physical_location and ADCIRCgrid agree, and for tropical
    * runs the storm agrees too.
    */
  def manifest(decoded: DataFrame, configItems: DataFrame,
      dirPath: String): DataFrame = {
    val iids = configItems.select(col("uid"), col("instance_id")).distinct()
    // the registered run's properties, *_db-suffixed to keep them apart
    // from the *_file values decoded out of the file name
    val props = graft.operators.FixedPivot(
      configItems.filter(col("key").isin(Schemas.runPropertyKeys: _*)),
      Seq("instance_id", "uid"), "key", Schemas.runPropertyKeys,
      first(col("value")))
      .select(
        col("instance_id"), col("uid"),
        col("`suite.model`").as("model_db"),
        col("`forcing.ensemblename`").as("ensemble_db"),
        col("storm").as("storm_db"),
        col("physical_location").as("location_db"),
        col("advisory").as("advisory_db"),
        col("ADCIRCgrid").as("ADCIRCgrid_db"),
        col("`forcing.metclass`").as("forcing"),
        col("instancename").as("instance"))
    val fromFile = decoded.select(
      col("uid"), col("file_name"), col("station_type"),
      col("suite_model").as("model_file"),
      col("forcing_ensemblename").as("ensemble_file"),
      col("storm").as("storm_file"),
      col("physical_location").as("location_file"),
      col("advisory").as("advisory_file"),
      col("adcirc_grid").as("ADCIRCgrid_file"),
      // the run's ISO timemark, rebuilt from the file-name time fields
      // — carried so ArchiveHistorical --ingest can chain each archived
      // run straight into modelRunIngest without re-decoding
      concat(
        substring(col("time_currentdate"), 1, 4), lit("-"),
        substring(col("time_currentdate"), 5, 2), lit("-"),
        substring(col("time_currentdate"), 7, 2), lit("T"),
        lpad(col("time_currentcycle"), 2, "0"), lit(":00:00")).as("timemark"))
    fromFile
      .join(iids, "uid")
      .join(props, Seq("instance_id", "uid"))
      .filter(col("model_db") === "adcirc" &&
        col("location_db") === col("location_file") &&
        upper(col("ADCIRCgrid_db")) === col("ADCIRCgrid_file") &&
        // synoptic runs (storm none) skip the storm check; tropical
        // runs require the decoded storm to match the registered one
        (col("storm_db").isNull || col("storm_db").isin("none", "None") ||
          col("storm_db") === col("storm_file")))
      .select(
        concat(col("instance_id").cast("string"), lit("-"), col("uid")).as("run_id"),
        lit(dirPath).as("dir_path"),
        col("file_name"),
        col("model_db"), col("model_file"),
        col("ensemble_db"), col("ensemble_file"),
        col("storm_db"), col("storm_file"),
        col("location_db"), col("location_file"),
        col("advisory_db"), col("advisory_file"),
        col("ADCIRCgrid_db"), col("ADCIRCgrid_file"),
        col("forcing"), col("instance"), col("station_type"),
        col("timemark"))
  }

  /** Re-lay manifest files into per-run sub-directories under the short
    * canonical names the model ingest consumes
    * (mvHistADCIRCFiles.py:173-201): `<dir>/<run_id>/FORECAST_<ST>.csv`
    * plus the sibling meta file (`meta` inserted after the first name
    * segment) as `meta_FORECAST_<ST>.csv`. Driver-side control plane,
    * one copy per manifest row, like the reference's shutil loop.
    *
    * Uses java.nio, NOT the Hadoop FS API: historical harvest names
    * contain `:` (ISO timestamps), which Hadoop paths cannot represent
    * — such files can only exist on the harvester's POSIX volume, the
    * same place the reference runs. The archived SHORT names are
    * Hadoop-safe, so everything downstream is distributed-FS-clean. */
  def archive(manifestRows: DataFrame): Seq[String] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    manifestRows
      .select("run_id", "dir_path", "file_name", "station_type")
      .collect().flatMap { r =>
        val (runId, dir, file, stype) =
          (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
        val runDir = Paths.get(dir, runId)
        Files.createDirectories(runDir)
        def cp(src: String, dst: String): Boolean = {
          val s = Paths.get(dir, src)
          val ok = Files.exists(s)
          if (ok) Files.copy(s, runDir.resolve(dst),
            StandardCopyOption.REPLACE_EXISTING)
          ok
        }
        val metaName = {
          val parts = file.split("_")
          (parts.take(1) ++ Array("meta") ++ parts.drop(1)).mkString("_")
        }
        // the PRIMARY data file vanishing between manifest build and
        // this copy is a real inconsistency: reporting the run as
        // archived would chain --ingest onto an empty dir and record
        // the run as handled with nothing ingested. Exclude it (loud),
        // so a re-run retries once the file is back. The meta sibling
        // stays optional — many sources never produce one.
        if (cp(file, s"FORECAST_$stype.csv")) {
          cp(metaName, s"meta_FORECAST_$stype.csv")
          Some(runDir.toString)
        } else {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"archive: source file vanished, run $runId excluded: $dir/$file")
          None
        }
      }.distinct.toSeq
  }
}
