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

  /** The salt column must not silently shadow (and later drop) a real
    * input column — `withColumn` overwrites an existing name, which
    * would corrupt the "identical result to the plain join" guarantee
    * for inputs that happen to carry one. */
  private def saltCol(dfs: DataFrame*): String = {
    var name = "__salt"
    var i = 0
    while (dfs.exists(_.columns.contains(name))) {
      i += 1
      name = s"__salt$i"
    }
    name
  }

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
    val sc = saltCol(probe, build)
    val p = probe.withColumn(sc,
      pmod(xxhash64(scatter), lit(salt.toLong)).cast("int"))
    val b = build.withColumn(sc,
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ sc).drop(sc)
  }

  /**
   * Hot-key-ONLY salted join: [[saltedJoin]] replicates the WHOLE
   * build side `salt` times — an 8x build shuffle even when one key
   * in a million is hot. Here a bounded driver sample estimates the
   * probe's hot keys (count >= `hotThreshold` extrapolated through
   * `sampleFraction`, top `maxHotKeys`); only the build rows of those
   * keys replicate, the cold mass takes the plain equi-join, and the
   * two branches union. Identical result set to the plain join no
   * matter what the sample says — sampling only picks WHICH keys get
   * the finer shuffle key, so the operator stays oracle-checkable
   * against the unsalted SQL.
   *
   * Cost shape at 100 TB: one extra probe/build pass (the broadcast
   * semi/anti split) buys the replicated volume down from
   * |build| x salt to |hot build| x salt — the right trade whenever
   * the hot set is small, which is what skew MEANS.
   */
  def saltedJoinHot(probe: DataFrame, build: DataFrame, keys: Seq[String],
      scatter: Column, salt: Int, hotThreshold: Long,
      sampleFraction: Double = 0.01, maxHotKeys: Int = 100,
      seed: Long = 42L): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0,1], got $sampleFraction")
    require(hotThreshold >= 1 && maxHotKeys >= 1)
    val minSampled = math.max(1L, (hotThreshold * sampleFraction).toLong)
    val hotRows = probe.select(keys.map(col): _*)
      .sample(withReplacement = false, sampleFraction, seed)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__hotn"))
      .filter(col("__hotn") >= minSampled)
      .orderBy(col("__hotn").desc)
      .limit(maxHotKeys)
      .drop("__hotn")
      .collect()
    if (hotRows.isEmpty) return probe.join(build, keys)
    val keySchema = org.apache.spark.sql.types.StructType(
      probe.select(keys.map(col): _*).schema.fields)
    val hotDf = broadcast(probe.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), keySchema))
    val probeHot = probe.join(hotDf, keys, "left_semi")
    val probeCold = probe.join(hotDf, keys, "left_anti")
    // the cold probe can join the FULL build (its hot rows can't
    // match cold keys), so only the hot branch pays a build semi-join
    val buildHot = build.join(hotDf, keys, "left_semi")
    saltedJoin(probeHot, buildHot, keys, scatter, salt)
      .unionByName(probeCold.join(build, keys))
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
    // fixed output names (n, sum_/min_/max_<col>) are part of the
    // declared result schema; reject inputs they would shadow rather
    // than silently replacing a caller's column. A GROUP KEY with one
    // of these names is just as fatal — the result would carry two
    // identically-named columns and every downstream reference is
    // AMBIGUOUS_REFERENCE — so keys get no exemption.
    val outNames = Seq("n", s"sum_$valueCol", s"min_$valueCol",
      s"max_$valueCol")
    val clash = outNames.filter(df.columns.contains)
    require(clash.isEmpty,
      s"saltedAgg output column(s) ${clash.mkString(", ")} already " +
        "exist on the input; rename them first")
    val sc = saltCol(df)
    val bucketed = df
      .withColumn(sc,
        pmod(xxhash64(scatter), lit(salt.toLong)).cast("int"))
      .groupBy((groupKeys :+ sc).map(col): _*)
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
