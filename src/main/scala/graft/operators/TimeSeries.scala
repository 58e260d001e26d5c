package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample an irregular event stream onto
 * a fixed grid with linear interpolation across gaps — the
 * climate-archive shape (the reference's domain is exactly such
 * series; cf. its explorenc fit/stat paths,
 * /root/reference/src/drivers/OPH_EXPLORENC_operator.c) and the
 * feature-engineering prerequisite for any model over sensor data.
 */
object TimeSeries {

  /**
   * Hourly resampling with linear gap interpolation, per key:
   * observations collapse to (key, hour, avg value); every key's
   * hours between its first and last observed hour materialize; a
   * missing hour takes
   *   v_prev + (v_next − v_prev) · (h − h_prev)/(h_next − h_prev)
   * between its bracketing observations. First/last grid points are
   * observed by construction, so interpolation never extrapolates.
   *
   * Scale shape: ONE aggregate to hours (map-side combined), ONE
   * per-key min/max aggregate whose `sequence()` grid explodes
   * ROW-LOCALLY (no shuffle to build the grid), one key-partitioned
   * join grid↔observations, and both fill windows (backward carry +
   * forward peek) share the same (key, hour) exchange+sort. Per-key
   * state is a sort run — hot keys spill, never OOM. The grid is at
   * most (span hours) rows per key: a 10-year key is 87k rows,
   * bounded and independent of event volume.
   *
   * @return (key, hour, value, interpolated) — `interpolated` marks
   *         filled points
   */
  def resampleHourly(df: DataFrame, key: String, tsCol: String,
      valueCol: String, collapse: String = "avg"): DataFrame = {
    // `collapse` folds same-hour observations: "avg" is the natural
    // default; "min"/"max" are ASSOCIATIVITY-FREE (identical doubles
    // under any partitioning or engine), which cross-engine
    // verification needs — an avg's partial-sum association drifts
    // the last ulp, and interpolated values sit exactly on decimal
    // rounding boundaries whenever the raw data has fixed decimals
    val obs = df.groupBy(col(key), date_trunc("hour", col(tsCol))
        .as("hour"))
      .agg((collapse match {
        case "avg" => avg(col(valueCol))
        case "min" => min(col(valueCol))
        case "max" => max(col(valueCol))
        case other => throw new IllegalArgumentException(
          s"collapse must be avg|min|max, got $other")
      }).as("__v"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("hour")).as("__lo"), max(col("hour")).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"),
        expr("interval 1 hour"))).as("hour"))
    val joined = grid.join(obs, Seq(key, "hour"), "left")
    val order = Window.partitionBy(col(key)).orderBy(col("hour"))
    val back = order.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = order.rowsBetween(0, Window.unboundedFollowing)
    val obsHour = when(col("__v").isNotNull, col("hour"))
    val filled = joined
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__ph", last(obsHour, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nh", first(obsHour, ignoreNulls = true).over(fwd))
    def ep(c: Column): Column = unix_timestamp(c).cast("double")
    filled.select(col(key), col("hour"),
      when(col("__v").isNotNull, col("__v"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          (ep(col("hour")) - ep(col("__ph"))) /
          (ep(col("__nh")) - ep(col("__ph")))).as("value"),
      col("__v").isNull.as("interpolated"))
  }
}
