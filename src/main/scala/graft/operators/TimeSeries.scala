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
   * Per-key ordinary-least-squares linear trend (the reference's
   * explorenc fit, distributed): slope and intercept of value vs
   * hours-since-first-observation, from the closed form
   *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
   *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
   *
   * Numerics by construction, not by luck: x is an exact integer
   * (hours since the key's first hour — re-basing also kills the
   * catastrophic cancellation raw epoch-hours would put in the
   * denominator), y converts to exact integer cents, and every sum
   * runs in INTEGER arithmetic — so the sums are engine-identical
   * under ANY partitioning or aggregation order, and only the two
   * final divisions touch floating point (same operands ⇒ same
   * double everywhere). A key whose observations all share one hour
   * has no defined slope → null.
   *
   * Scale: one map-side-combined aggregate for the re-base origin,
   * one key join, one aggregate for the five sums. Long arithmetic
   * holds to ~10^5 observations × 10^4-hour spans per key; beyond
   * that, re-base x per window or widen to DECIMAL.
   *
   * @return (key, n, slope, intercept) — slope in value-units/hour
   */
  def linearTrend(df: DataFrame, key: String, tsCol: String,
      valueCol: String): DataFrame = {
    val base = df.select(col(key),
      floor(unix_timestamp(col(tsCol)) / 3600).cast("long").as("__h"),
      round(col(valueCol) * 100, 0).cast("long").as("__yc"))
    val origin = base.groupBy(col(key)).agg(min(col("__h")).as("__h0"))
    val xy = base.join(origin, Seq(key))
      .select(col(key), (col("__h") - col("__h0")).as("__x"),
        col("__yc"))
    val sums = xy.groupBy(col(key)).agg(
      count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
      sum(col("__yc")).as("__sy"),
      sum(col("__x") * col("__yc")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val den = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val slopeNum = (col("__n") * col("__sxy") -
      col("__sx") * col("__sy")).cast("double")
    val interNum = (col("__sy") * col("__sxx") -
      col("__sx") * col("__sxy")).cast("double")
    sums.select(col(key), col("__n").as("n"),
      when(den === 0.0, lit(null))
        .otherwise(slopeNum / den / 100.0).as("slope"),
      when(den === 0.0, lit(null))
        .otherwise(interNum / den / 100.0).as("intercept"))
  }

  /**
   * Rolling z-score anomaly detection: flag events deviating more
   * than `z` standard deviations from the mean of the `window`
   * PRECEDING observations of the same key (history only — the
   * candidate never contaminates its own baseline; keys need at
   * least `minObs` history rows before they can flag).
   *
   * The test runs ENTIRELY in integer arithmetic: with cents
   * yc = round(100·value) and window sums sy = Σyc, syy = Σyc²,
   *   |y − μ| > z·σ  ⟺  (n·yc − sy)² > z²·(n·syy − sy²),
   * so the flags are engine-identical under any execution order —
   * no floating-point tolerance anywhere. Bounds: with a 20-row
   * window and cent values ≤ 10^6, every term stays under 2^63.
   *
   * One key-partitioned sort window (the same exchange any per-key
   * sequential analysis pays); state per key is the `window`-row
   * frame, constant in data volume.
   *
   * @param idCol breaks timestamp ties so the frame is total-ordered
   * @return flagged rows (key, idCol, value, n_window) — n_window is
   *         the history count the flag was judged against
   */
  def rollingAnomalies(df: DataFrame, key: String, tsCol: String,
      idCol: String, valueCol: String, window: Int = 20, z: Int = 3,
      minObs: Int = 5): DataFrame = {
    require(window >= minObs && minObs >= 2 && z >= 1,
      s"need window >= minObs >= 2, z >= 1; got $window/$minObs/$z")
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window.toLong, -1)
    val base = df.select(col(key), col(tsCol), col(idCol),
      col(valueCol), round(col(valueCol) * 100, 0).cast("long")
        .as("__yc"))
    base
      .withColumn("__n", count(col("__yc")).over(w))
      .withColumn("__sy", sum(col("__yc")).over(w))
      .withColumn("__syy", sum(col("__yc") * col("__yc")).over(w))
      .filter(col("__n") >= minObs &&
        sq(col("__n") * col("__yc") - col("__sy")) >
          lit(z.toLong * z) *
          (col("__n") * col("__syy") - col("__sy") * col("__sy")))
      .select(col(key), col(idCol), col(valueCol),
        col("__n").as("n_window"))
  }

  /** Integer square as a Column (kept out of line so the window
    * expression reads as the algebra in the scaladoc). */
  private def sq(c: Column): Column = c * c

  /**
   * Hourly resampling with linear gap interpolation, per key:
   * observations collapse to (key, hour, `collapse` value); every
   * key's hours between its first and last observed hour
   * materialize; a missing hour takes
   *   v_prev + (v_next − v_prev) · (h − h_prev)/(h_next − h_prev)
   * between its bracketing observations. First/last grid points are
   * observed by construction, so interpolation never extrapolates.
   *
   * Scale shape: ONE aggregate to hours (map-side combined), ONE
   * per-key min/max aggregate whose `sequence()` grid explodes
   * ROW-LOCALLY (no shuffle to build the grid), one key-partitioned
   * join grid↔observations, then the two fills. The backward carry is
   * a RUNNING frame (unboundedPreceding..0, O(n) per partition); the
   * forward peek is the SAME running frame over the REVERSED sort —
   * one exchange, two sorts — and deliberately NOT an
   * unbounded-FOLLOWING frame: Spark evaluates those by re-scanning
   * the rest of the partition for every row, O(span²) per key
   * (measured 25 s vs ~1 s at sf0.1 the moment the bench stopped
   * count-pruning the value column). Per-key state is a sort run —
   * hot keys spill, never OOM. The grid is at most (span hours) rows
   * per key: a 10-year key is 87k rows, bounded and independent of
   * event volume.
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
    // forward peek = running frame over the reversed sort (see
    // scaladoc: an unbounded-FOLLOWING frame is O(span^2) per key)
    val backRev = Window.partitionBy(col(key)).orderBy(col("hour").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obsHour = when(col("__v").isNotNull, col("hour"))
    val filled = joined
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__ph", last(obsHour, ignoreNulls = true).over(back))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(backRev))
      .withColumn("__nh", last(obsHour, ignoreNulls = true).over(backRev))
    def ep(c: Column): Column = unix_timestamp(c).cast("double")
    filled.select(col(key), col("hour"),
      when(col("__v").isNotNull, col("__v"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          (ep(col("hour")) - ep(col("__ph"))) /
          (ep(col("__nh")) - ep(col("__ph")))).as("value"),
      col("__v").isNull.as("interpolated"))
  }
}
