package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation operators for hot keys at 100 TB.
 *
 * Spark's AQE rewrites skewed SORT-MERGE JOIN partitions at runtime
 * (`spark.sql.adaptive.skewJoin.enabled`), which is the first line of
 * defense and needs no code. Manual salting remains the tool for the
 * cases AQE does not cover: aggregations whose single hot group
 * overwhelms one reducer (AQE cannot split a group), joins under
 * `spark.sql.adaptive.enabled=false`, and broadcast-ineligible
 * skewed sides feeding non-splittable operators downstream.
 *
 * Both operators are SEMANTICALLY EXACT — they re-express the same
 * relational result with a finer shuffle key, so every query using
 * them remains oracle-checkable against the unsalted SQL.
 */
object Skew {

  /**
   * Skew-safe inner equi-join: the build side is replicated `salt`
   * times (one copy per salt value) and each probe row is scattered
   * to ONE salt bucket, so a hot key's probe rows spread over `salt`
   * reducers instead of hammering one. Identical result set to
   * `probe.join(build, keys)`.
   *
   * @param scatter any probe-side expression that varies WITHIN a
   *                join key (a row id, a line number, a hash of other
   *                columns). A constant would put the whole hot key
   *                back in one bucket; it can NOT change the result,
   *                only the balance.
   * Cost: |build| × salt extra build rows through the shuffle — size
   * salt to the worst key's skew factor, not higher.
   */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      scatter: Column, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(scatter), lit(salt.toLong)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }

  /**
   * Two-phase aggregation for hot group keys: phase 1 aggregates on
   * (keys, salt bucket) — the hot group's rows split across `salt`
   * reducers — phase 2 merges the per-bucket partials. Exact for the
   * algebraic aggregates exposed here (sum/count/min/max merge by
   * sum/sum/min/max). Spark's map-side partial aggregation already
   * bounds per-reducer input when combine ratios are good; salting
   * matters when per-key STATE is what explodes (collect-style or
   * high-cardinality-distinct per group) or combine ratios are poor.
   */
  def saltedAgg(df: DataFrame, groupKeys: Seq[String], valueCol: String,
      scatter: Column, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val bucketed = df
      .withColumn("__salt",
        pmod(xxhash64(scatter), lit(salt.toLong)).cast("int"))
      .groupBy((groupKeys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"),
        count(lit(1)).as("__pcnt"),
        min(col(valueCol)).as("__pmin"),
        max(col(valueCol)).as("__pmax"))
    bucketed.groupBy(groupKeys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"),
        min(col("__pmin")).as(s"min_$valueCol"),
        max(col("__pmax")).as(s"max_$valueCol"))
  }
}
