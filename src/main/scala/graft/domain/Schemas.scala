package graft.domain

import org.apache.spark.sql.types._

/** Explicit schemas for every table in the engine (SURVEY.md §1.2).
  *
  * The reference keeps schemas implicit in Postgres `COPY` column lists
  * and pandas `DataFrame(columns=[...])` literals; here they are
  * declared `StructType`s so harvest CSVs are read with
  * `inferSchema=false` (one pass, stable types at 100 TB).
  *
  * Reference citations: drf_gauge_station / drf_gauge_source
  * (ingestObsTasks.py:147,191), drf_model_source
  * (ingestModelTasks.py:208), fact tables (ingestObsTasks.py:385,
  * ingestModelTasks.py:363), ledgers (ingestObsTasks.py:280,
  * ingestModelTasks.py:251).
  */
object Schemas {

  /** Measurement columns of the sparse wide obs fact. Exactly one is
    * populated per source (dynamic COPY column, ingestObsTasks.py:385-386).
    */
  val obsMeasures: Seq[String] = Seq(
    "water_level", "wave_height", "wind_speed", "air_pressure",
    "stream_elevation", "flow_volume")

  val gaugeStation: StructType = StructType(Seq(
    StructField("station_id", LongType),
    StructField("station_name", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("tz", StringType),
    StructField("gauge_owner", StringType),
    StructField("location_name", StringType),
    StructField("location_type", StringType),
    StructField("country", StringType),
    StructField("state", StringType),
    StructField("county", StringType),
    StructField("geom", StringType),           // WKB hex, carried opaque
    StructField("apsviz_station", BooleanType)))

  /** Station seed CSVs are headerless, 11 cols, no station_id and no
    * apsviz_station flag (stations/geom_*.csv; FIXTURES.md §4). */
  val stationSeedCsv: StructType =
    StructType(gaugeStation.fields
      .filterNot(f => f.name == "station_id" || f.name == "apsviz_station").toSeq)

  val gaugeSource: StructType = StructType(Seq(
    StructField("source_id", LongType),
    StructField("station_id", LongType),
    StructField("data_source", StringType),
    StructField("source_name", StringType),
    StructField("source_archive", StringType),
    StructField("units", StringType)))

  val modelSource: StructType = StructType(
    gaugeSource.fields.toSeq ++ Seq(
      StructField("source_instance", StringType),
      StructField("forcing_metclass", StringType)))

  /** Obs fact (drf_gauge_data). Sparse wide: one measure non-null per
    * row. `timemark` is the harvest-file timestamp; (timemark,
    * processing order) is the dedup precedence (SURVEY §7). */
  val gaugeData: StructType = StructType(Seq(
    StructField("source_id", LongType),
    StructField("timemark", TimestampType),
    StructField("time", TimestampType)) ++
    obsMeasures.map(StructField(_, DoubleType)))

  val modelData: StructType = StructType(Seq(
    StructField("source_id", LongType),
    StructField("timemark", TimestampType),
    StructField("time", TimestampType),
    StructField("water_level", DoubleType),
    StructField("wave_height", DoubleType)))

  /** Harvest ledger (drf_harvest_obs_file_meta). */
  val harvestObsFileMeta: StructType = StructType(Seq(
    StructField("dir_path", StringType),
    StructField("file_name", StringType),
    StructField("processing_datetime", TimestampType),
    StructField("data_date_time", TimestampType),
    StructField("data_begin_time", TimestampType),
    StructField("data_end_time", TimestampType),
    StructField("data_source", StringType),
    StructField("source_name", StringType),
    StructField("source_archive", StringType),
    StructField("source_variable", StringType),
    StructField("location_type", StringType),
    StructField("timemark", TimestampType),
    StructField("ingested", BooleanType),
    StructField("overlap_past_file_date_time", BooleanType)))

  /** Model harvest ledger (drf_harvest_model_file_meta) — the
    * reference's exact column set and order
    * (createHarvestModelFileMeta.py:68-73, ingestModelTasks.py:251).
    * Unlike the obs ledger there is no source_variable/location_type;
    * instead model_run_id, source_instance, forcing_metclass, advisory
    * identify the run. */
  val harvestModelFileMeta: StructType = StructType(Seq(
    StructField("dir_path", StringType),
    StructField("file_name", StringType),
    StructField("model_run_id", StringType),
    StructField("processing_datetime", TimestampType),
    StructField("data_date_time", TimestampType),
    StructField("data_begin_time", TimestampType),
    StructField("data_end_time", TimestampType),
    StructField("data_source", StringType),
    StructField("source_name", StringType),
    StructField("source_archive", StringType),
    StructField("source_instance", StringType),
    StructField("forcing_metclass", StringType),
    StructField("advisory", StringType),
    StructField("timemark", TimestampType),
    StructField("ingested", BooleanType),
    StructField("overlap_past_file_date_time", BooleanType)))

  /** ApsViz station meta-file ledger (drf_apsviz_station_file_meta,
    * ingestModelTasks.py:295): one row per meta_* station file with an
    * `ingested` commit marker. */
  val apsVizStationFileMeta: StructType = StructType(Seq(
    StructField("dir_path", StringType),
    StructField("file_name", StringType),
    StructField("data_date_time", TimestampType),
    StructField("data_source", StringType),
    StructField("source_name", StringType),
    StructField("source_archive", StringType),
    StructField("source_instance", StringType),
    StructField("forcing_metclass", StringType),
    StructField("grid_name", StringType),
    StructField("model_run_id", StringType),
    StructField("timemark", TimestampType),
    StructField("location_type", StringType),
    StructField("csvurl", StringType),
    StructField("ingested", BooleanType)))

  /** Retain-obs station meta-file ledger
    * (drf_retain_obs_station_file_meta, ingestObsTasks.py:322). */
  val retainObsStationFileMeta: StructType = StructType(Seq(
    StructField("dir_path", StringType),
    StructField("file_name", StringType),
    StructField("data_source", StringType),
    StructField("source_name", StringType),
    StructField("source_archive", StringType),
    StructField("location_type", StringType),
    StructField("timemark", TimestampType),
    StructField("begin_date", TimestampType),
    StructField("end_date", TimestampType),
    StructField("ingested", BooleanType)))

  /** Harvest data CSVs: header row TIME,STATION,<VARIABLE>
    * (FIXTURES.md §1). Variable column name supplied per catalog row. */
  def harvestCsv(variable: String): StructType = StructType(Seq(
    StructField("TIME", TimestampType),
    StructField("STATION", StringType),
    StructField(variable.toUpperCase, DoubleType)))

  /** Source catalog (drf_source_obs_meta; run/source_obs_meta.csv). */
  val sourceObsMeta: StructType = StructType(Seq(
    StructField("data_source", StringType),
    StructField("source_name", StringType),
    StructField("source_archive", StringType),
    StructField("source_variable", StringType),
    StructField("filename_prefix", StringType),
    StructField("location_type", StringType),
    StructField("units", StringType)))

  /** EAV property store of the external dashboard DB
    * (config_item; scripts/get_adcirc_run_property_variables.sql:11-50). */
  val configItem: StructType = StructType(Seq(
    StructField("instance_id", LongType),
    StructField("uid", StringType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** The 13 run-property keys pivoted by A6
    * (scripts/get_adcirc_run_property_variables.sql:18). */
  val runPropertyKeys: Seq[String] = Seq(
    "suite.model", "ADCIRCgrid", "advisory", "forcing.ensemblename",
    "forcing.metclass", "instancename", "storm", "stormname",
    "stormnumber", "physical_location", "time.currentdate",
    "time.currentcycle", "workflow_type")
}

/** Typed catalog row (drf_source_obs_meta). */
final case class SourceMeta(
    data_source: String,
    source_name: String,
    source_archive: String,
    source_variable: String,
    filename_prefix: String,
    location_type: String,
    units: String)
