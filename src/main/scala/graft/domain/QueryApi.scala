package graft.domain

import graft.operators.FixedPivot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The engine's read path — Spark restatement of the reference's views
  * and PL/pgSQL crosstab functions (SURVEY §3.3). Each function is a
  * parameterized DataFrame pipeline; `*Json` variants reproduce the
  * JSON_AGG contract.
  *
  * Scale: station/source dims broadcast into the fact; the station +
  * time predicate prunes fact partitions before any shuffle; the pivot
  * uses a fixed category list (no distinct-scan); the final JSON_AGG
  * collapses to a single row only AFTER the per-station filter has cut
  * the data to one station's window.
  */
object QueryApi {

  /** drf_gauge_station_source_data view (ingestObsTasks.py:494-521):
    * 3-way star join flattening fact × source × station (J3). */
  def gaugeStationSourceData(
      fact: DataFrame, source: DataFrame, station: DataFrame): DataFrame =
    fact
      .join(broadcast(source), "source_id")
      .join(broadcast(station), "station_id")

  /** The reference view's exact 24-column projection (minus the serial
    * obs_id, which a distributed engine does not mint — SURVEY §7; plus
    * flow_volume which the query functions read). Column order matches
    * the CREATE VIEW statement for drop-in consumers. */
  def gaugeStationSourceDataProjected(
      fact: DataFrame, source: DataFrame, station: DataFrame): DataFrame =
    gaugeStationSourceData(fact, source, station).select(
      col("source_id"), col("station_id"), col("station_name"),
      col("timemark"), col("time"),
      col("water_level"), col("wave_height"), col("wind_speed"),
      col("air_pressure"), col("stream_elevation"), col("flow_volume"),
      col("tz"), col("gauge_owner"),
      col("data_source"), col("source_name"), col("source_archive"), col("units"),
      col("location_name"), col("apsviz_station"), col("location_type"),
      col("country"), col("state"), col("county"), col("geom"))

  /** Register the reference's two serving views for SQL users
    * (drf_gauge_station_source_data / drf_model_station_source_data,
    * ingestObsTasks.py:494-521, ingestModelTasks.py:475-501):
    * `spark.sql("SELECT * FROM gauge_station_source_data WHERE ...")`.
    */
  def registerViews(
      gaugeFact: DataFrame, gaugeSource: DataFrame,
      modelFact: DataFrame, modelSource: DataFrame,
      station: DataFrame): Unit = {
    gaugeStationSourceData(gaugeFact, gaugeSource, station)
      .createOrReplaceTempView("gauge_station_source_data")
    gaugeStationSourceData(modelFact, modelSource, station)
      .createOrReplaceTempView("model_station_source_data")
  }

  /** Fixed crosstab categories of get_obs_timeseries_station_data
    * (scripts/get_obs_timeseries_station_data.sql:31-38): raw
    * data_source value → output column name. */
  val obsPivotColumns: Seq[(String, String)] = Seq(
    "ocean_buoy" -> "ocean_buoy_wave_height",
    "tidal_gauge" -> "tidal_gauge_water_level",
    "tidal_predictions" -> "tidal_predictions",
    "coastal_gauge" -> "coastal_gauge_water_level",
    "river_gauge" -> "river_gauge_water_level")

  /** get_obs_timeseries_station_data(station, start, end) →
    * one row per time, the 5 fixed data_source columns
    * (scripts/get_obs_timeseries_station_data.sql:7-44). */
  def obsTimeseriesStationData(
      fact: DataFrame, source: DataFrame, station: DataFrame,
      stationName: String, startDate: String, endDate: String): DataFrame = {
    val joined = gaugeStationSourceData(fact, source, station)
      .filter(col("station_name") === stationName &&
        col("time") >= lit(startDate).cast("timestamp") &&
        col("time") <= lit(endDate).cast("timestamp"))
      .select(
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("time_stamp"),
        col("data_source"),
        coalesce(col("water_level"), col("wave_height")).as("yaxis"))
    val pivoted = FixedPivot(joined, Seq("time_stamp"), "data_source",
      obsPivotColumns.map(_._1), first(col("yaxis")))
    obsPivotColumns.foldLeft(pivoted) { case (df, (cat, out)) =>
      df.withColumnRenamed(cat, out)
    }.orderBy("time_stamp")
  }

  /** JSON_AGG form: the full JSON array string the DRF API returns
    * (A8). NULL categories serialize as JSON null like ROW_TO_JSON. */
  def obsTimeseriesStationDataJson(
      fact: DataFrame, source: DataFrame, station: DataFrame,
      stationName: String, startDate: String, endDate: String): String =
    jsonAgg(obsTimeseriesStationData(fact, source, station, stationName, startDate, endDate),
      "time_stamp", obsPivotColumns.map(_._2))

  /** All-parameters variant of the obs query
    * (scripts/get_obs_timeseries_station_data_allparms.sql:7-57):
    * 6-way measure COALESCE, 9 categories including the parameterized
    * `nowcastSource` (its output column named with '.' stripped, F9).
    */
  def obsTimeseriesStationDataAllParms(
      fact: DataFrame, source: DataFrame, station: DataFrame,
      stationName: String, startDate: String, endDate: String,
      nowcastSource: String): DataFrame = {
    // a nowcastSource that IS one of the fixed categories must not
    // duplicate the pivot value (duplicate columns -> ambiguous
    // reference AnalysisException); its data already serves under the
    // fixed category's column
    val fixedKeys = Set("air_barometer", "ocean_buoy", "tidal_gauge",
      "tidal_predictions", "coastal_gauge", "river_gauge", "stream_gauge",
      "wind_anemometer")
    val nowcastCat: Seq[(String, String)] =
      if (fixedKeys.contains(nowcastSource)) Nil
      else Seq(nowcastSource -> FixedPivot.sanitize(nowcastSource))
    val cats: Seq[(String, String)] = Seq(
      "air_barometer" -> "air_barometer") ++ nowcastCat ++ Seq(
      "ocean_buoy" -> "ocean_buoy_wave_height",
      "tidal_gauge" -> "tidal_gauge_water_level",
      "tidal_predictions" -> "tidal_predictions",
      "coastal_gauge" -> "coastal_gauge_water_level",
      "river_gauge" -> "river_gauge_water_level",
      "stream_gauge" -> "stream_gauge_stream_elevation",
      "wind_anemometer" -> "wind_anemometer")
    val joined = gaugeStationSourceData(fact, source, station)
      .filter(col("station_name") === stationName &&
        col("time") >= lit(startDate).cast("timestamp") &&
        col("time") <= lit(endDate).cast("timestamp"))
      .select(
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("time_stamp"),
        col("data_source"),
        coalesce(col("water_level"), col("stream_elevation"), col("wave_height"),
          col("wind_speed"), col("air_pressure"), col("flow_volume")).as("yaxis"))
    val pivoted = FixedPivot(joined, Seq("time_stamp"), "data_source",
      cats.map(_._1), first(col("yaxis")))
    cats.foldLeft(pivoted) { case (df, (cat, out)) =>
      if (cat == out) df else df.withColumnRenamed(cat, out)
    }.orderBy("time_stamp")
  }

  def obsTimeseriesStationDataAllParmsJson(
      fact: DataFrame, source: DataFrame, station: DataFrame,
      stationName: String, startDate: String, endDate: String,
      nowcastSource: String): String = {
    val df = obsTimeseriesStationDataAllParms(
      fact, source, station, stationName, startDate, endDate, nowcastSource)
    jsonAgg(df, "time_stamp", df.columns.filterNot(_ == "time_stamp").toSeq)
  }

  /** get_forecast_timeseries_station_data(station, timemark, maxEnd,
    * dataSource, sourceInstance): model fact, one dynamic output
    * column named from data_source with '.' stripped
    * (scripts/get_forecast_timeseries_station_data.sql:12-33). */
  def forecastTimeseriesStationData(
      fact: DataFrame, source: DataFrame, station: DataFrame,
      stationName: String, timemark: String, maxForecastEndtime: String,
      dataSource: String, sourceInstance: String): DataFrame = {
    val outCol = FixedPivot.sanitize(dataSource)
    fact
      .join(broadcast(source), "source_id")
      .join(broadcast(station), "station_id")
      .filter(col("station_name") === stationName &&
        col("time") >= lit(timemark).cast("timestamp") &&
        col("time") <= lit(maxForecastEndtime).cast("timestamp") &&
        col("timemark") === lit(timemark).cast("timestamp") &&
        col("data_source") === dataSource &&
        col("source_instance") === sourceInstance)
      .select(
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("time_stamp"),
        col("water_level").as(outCol))
      .orderBy("time_stamp")
  }

  /** get_nowcast_timeseries_station_data(station, start, end,
    * dataSource, sourceInstance) — like forecast but an open time
    * range, no timemark pin (scripts/get_nowcast_timeseries_station_data.sql). */
  def nowcastTimeseriesStationData(
      fact: DataFrame, source: DataFrame, station: DataFrame,
      stationName: String, startDate: String, endDate: String,
      dataSource: String, sourceInstance: String): DataFrame = {
    val outCol = FixedPivot.sanitize(dataSource)
    fact
      .join(broadcast(source), "source_id")
      .join(broadcast(station), "station_id")
      .filter(col("station_name") === stationName &&
        col("time") >= lit(startDate).cast("timestamp") &&
        col("time") <= lit(endDate).cast("timestamp") &&
        col("data_source") === dataSource &&
        col("source_instance") === sourceInstance)
      .select(
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("time_stamp"),
        col("water_level").as(outCol))
      .orderBy("time_stamp")
  }

  /** JSON_AGG: serialize an already-pivoted frame to the reference's
    * JSON array-of-objects (keys in column order, nulls explicit). */
  def jsonAgg(pivoted: DataFrame, idCol: String, valueCols: Seq[String]): String = {
    // Build each row as a JSON object string with explicit nulls, then
    // aggregate ordered by id. to_json(struct) would drop null keys.
    val obj = concat(
      lit("{"),
      concat_ws(",",
        (idCol +: valueCols).map { c =>
          // NaN/Infinity are not legal JSON tokens — a harvest cell
          // the CSV reader parsed as Double.NaN would otherwise break
          // every consumer's parse; serialize them as null
          val sv = col(c).cast("string")
          val finite = when(sv.isin("NaN", "Infinity", "-Infinity"),
            lit("null")).otherwise(sv)
          concat(lit("\"" + c + "\":"),
            when(col(c).isNull, lit("null"))
              .otherwise(
                if (c == idCol) concat(lit("\""), col(c), lit("\""))
                else finite))
        }: _*),
      lit("}"))
    // the array is assembled ON EXECUTORS: collect_list the (id, obj)
    // structs, sort by id, join — exactly ONE row reaches the driver,
    // whatever the window size (the per-station filter bounds the list
    // an executor holds, same bound the old row-per-timestamp collect
    // had on the driver)
    val assembled = pivoted
      .select(col(idCol).as("__id"), obj.as("__obj"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__id"), col("__obj")))),
            x => x.getField("__obj")),
          ",").as("joined"),
        count(lit(1)).as("n"))
      .collect()(0)
    if (assembled.getAs[Long]("n") == 0L) "null"
    else "[" + assembled.getAs[String]("joined") + "]"
  }
}
