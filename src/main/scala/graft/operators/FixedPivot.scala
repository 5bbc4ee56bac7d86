package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-category pivot — the Spark restatement of the reference's
  * `CROSSTAB(..., 'VALUES list')` (A6/A7): output contains EVERY
  * declared category column even when no input row matches, absent
  * categories are all-NULL (scripts/get_obs_timeseries_station_data.sql:31-38).
  *
  * Spark's `pivot(col, values)` with an explicit value list gives the
  * same guaranteed-column contract AND skips the extra distinct-values
  * job — at 100 TB the implicit `pivot(col)` variant would scan the
  * data twice.
  */
object FixedPivot {

  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      pivotCol: String,
      categories: Seq[String],
      agg: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, categories)
      .agg(agg)

  /** Category label sanitizer used for dynamic pivot column names:
    * the reference strips '.' via SPLIT_PART||SPLIT_PART
    * (scripts/get_forecast_timeseries_station_data.sql:32). Driver-side
    * string op — pivot aliases are plan-time, not data-plane.
    */
  def sanitize(category: String): String = category.split('.').mkString
}
