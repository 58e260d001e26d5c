package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Warehouse maintenance operators: the incremental-ETL trio every
 * 100 TB fact/dimension pipeline runs daily — SCD Type-2 history
 * construction, CDC last-writer-wins application, and mergeable
 * aggregate-state maintenance.
 *
 * None of these exist in the reference (an n-D array engine), but a
 * user running its workflow engine over growing archives faces the
 * same three shapes: "keep history of a changing attribute", "apply a
 * change log", "don't recompute the world for one new day of data".
 * All three are expressed so the ENTIRE input shuffles at most once
 * on the entity key, with map-side partial aggregation wherever the
 * aggregate is algebraic.
 */
object Warehouse {

  /**
   * Build a Slowly-Changing-Dimension Type-2 history from a change
   * log: one output row per (key, run of equal values), carrying
   * `valid_from` (first ts of the run), `valid_to` (ts of the NEXT
   * change; null while current) and `is_current`.
   *
   * Shuffle story: both window passes (lag to find change points,
   * lead to close intervals) declare the SAME partitioning (key) so
   * Catalyst plans ONE Exchange + one Sort feeding both Window
   * operators — the log shuffles once, on the dimension key, which
   * is exactly the partitioning the downstream dimension table wants.
   * Per-key state is a sort run, not a hash table: no OOM on hot
   * keys, AQE splits skewed partitions.
   *
   * Ties: `ts` must be unique per key (true of any CDC log with a
   * sequence column — pass that as `ts`); equal timestamps would make
   * "previous value" ill-defined in any engine.
   */
  def scd2FromLog(log: DataFrame, key: String, ts: String,
      value: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts))
    val changes = log
      .withColumn("__prev", lag(col(value), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      // a run boundary is "first row" or "value differs from prev";
      // null-safe so a null value forms runs like any other value
      .filter(!(col(value) <=> col("__prev")) || col("__rn") === 1)
      .drop("__prev", "__rn")
    changes
      .withColumn("valid_to", lead(col(ts), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(ts, "valid_from")
      .select(col(key), col(value), col("valid_from"), col("valid_to"),
        col("is_current"))
  }

  /**
   * Apply a CDC change log and materialize the final table state:
   * last-writer-wins per key by `seq`; a key whose LATEST operation
   * is a delete ('D') is absent from the result, otherwise the latest
   * payload wins regardless of whether it arrived as 'I' or 'U'
   * (upsert semantics — replayed logs and at-least-once deliveries
   * re-apply harmlessly).
   *
   * ONE aggregate on the key: `max_by(struct(...), seq)` runs with
   * map-side partial aggregation, so a key touched by a million log
   * entries ships ONE partial per map task through the exchange — the
   * window formulation (`row_number ... = 1`) would sort-shuffle the
   * entire log instead. (The struct-valued buffer makes Spark pick
   * SortAggregate over HashAggregate; the sorts are per-partition and
   * the partial combine is what bounds shuffle volume — the spec pins
   * `partial_max_by`.) `seq` must be unique per key (CDC logs carry
   * an LSN/offset); duplicated seqs make "latest" ill-defined.
   */
  def cdcApply(log: DataFrame, key: String, seq: String, op: String,
      payload: Seq[String]): DataFrame = {
    val latest = log.groupBy(col(key))
      .agg(max_by(struct((op +: payload).map(col): _*), col(seq))
        .as("__last"))
    // null-safe: a malformed NULL op must behave as an upsert (the
    // documented "anything but a delete wins"), not silently delete
    // the key the way a three-valued =!= comparison would
    latest
      .filter(!(col(s"__last.$op") <=> "D"))
      .select(col(key) +: payload.map(c => col(s"__last.$c").as(c)): _*)
  }

  /**
   * Point-in-time lookup against an SCD2 history (the consumption
   * pattern [[scd2FromLog]] exists for): each fact row joins the
   * dimension VERSION that was valid at the fact's time — the latest
   * `valid_from` ≤ fact time. Facts preceding a key's first version
   * drop (inner semantics). Delegates to the native as-of join
   * ([[Joins.asofNative]]): each side shuffles once clustered by key,
   * the per-partition pass is a two-iterator merge with O(1) state,
   * and the exchange elides entirely when either side is bucketed by
   * the key — at 100 TB this is the "facts vs dimension history"
   * join that a range-predicate formulation would explode.
   *
   * @return fact columns + (value, valid_from of the matched version)
   */
  def scd2Lookup(facts: DataFrame, history: DataFrame, key: String,
      factTime: String, value: String): DataFrame =
    Joins.asofNative(facts,
      history.select(col(key), col("valid_from"), col(value)),
      Seq(key), factTime, "valid_from", Seq(value))
      .withColumnRenamed("matched_valid_from", "valid_from")

  /**
   * Incremental SCD2 maintenance: fold a new batch of log rows into
   * an existing [[scd2FromLog]] history WITHOUT reprocessing closed
   * history. Untouched keys pass through by anti-join; for touched
   * keys only the OPEN (is_current) row re-enters as a pseudo-log
   * seed alongside the batch rows, and the run-collapse recomputes
   * over that small set — if a batch's first value equals the open
   * row's, the run collapses INTO the seed and the original
   * `valid_from` survives (no spurious version). Work is
   * O(touched keys + batch), never O(history) — the property that
   * makes daily dimension maintenance viable on a 100 TB history.
   *
   * PRECONDITION: every batch timestamp must be later than the
   * touched key's open `valid_from` (i.e. the log arrives in order
   * across maintenance runs — the same contract every SCD2 engine
   * carries). Late rows older than the open version would need
   * closed-history rewrite: reprocess those keys from the full log
   * instead. `validateOrder=true` enforces this with one count over
   * the (touched keys × batch) join and fails LOUDLY listing the
   * violation count — silently merging a late row would rewrite
   * history semantics; costs one extra job, so production runs that
   * already trust their log ordering can leave it off.
   */
  def scd2Merge(history: DataFrame, batch: DataFrame, key: String,
      ts: String, value: String,
      validateOrder: Boolean = false): DataFrame = {
    if (validateOrder) {
      val late = batch
        .join(history.filter(col("is_current"))
          .select(col(key), col("valid_from")), Seq(key))
        .filter(col(ts) <= col("valid_from")).count()
      require(late == 0L,
        s"scd2Merge: $late batch row(s) at or before an open " +
          "version's valid_from — late arrivals need a full-log " +
          "reprocess of their keys, not an incremental merge")
    }
    val affected = batch.select(col(key)).distinct()
    val touched = history.join(affected, Seq(key), "left_semi")
    val untouched = history.join(affected, Seq(key), "left_anti")
    val closed = touched.filter(!col("is_current"))
    val seed = touched.filter(col("is_current"))
      .select(col(key), col("valid_from").as(ts), col(value))
    val recomputed = scd2FromLog(
      seed.unionByName(batch.select(col(key), col(ts), col(value))),
      key, ts, value)
    untouched.unionByName(closed).unionByName(recomputed)
  }

  /** Column layout of a mergeable aggregate state table (the
    * contract both sides of [[mergeAggState]] share): one row per
    * key tuple with n (long) and sum_v / min_v / max_v as CANONICAL
    * DOUBLES — the merge arithmetic is double, so the initial state
    * declares the same schema rather than letting the first
    * maintenance run silently rewrite a long/decimal column to
    * double under a fixed-schema reader. `avg` is DELIBERATELY
    * absent — it is not algebraic (partials don't merge by avg);
    * derive it at read time as sum_v / n, which [[withDerived]]
    * does. */
  def aggState(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("double")).as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /**
   * Incremental aggregate maintenance: fold a new batch of RAW rows
   * into an existing aggregate state without recomputing history.
   * `state` rows re-enter as partials (their n/sum/min/max merge by
   * sum/sum/min/max); batch rows enter as singleton partials; ONE
   * hash aggregate merges both — a single shuffle whose map-side
   * combine reduces the batch before anything moves, and the state
   * side is already one row per key. Equivalent by construction to
   * re-aggregating (history ∪ batch) — which is exactly what the
   * oracle checks.
   *
   * At 100 TB this is THE difference between a daily job reading one
   * day and one reading three years; the state table is
   * key-partitioned output, so repeated maintenance runs also keep
   * their shuffle partitioning stable.
   */
  def mergeAggState(state: DataFrame, batch: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    val kc = keys.map(col)
    val batchPartials = batch.select(
      kc ++ Seq(
        when(col(valueCol).isNotNull, 1L).otherwise(0L).as("n"),
        col(valueCol).cast("double").as("sum_v"),
        col(valueCol).cast("double").as("min_v"),
        col(valueCol).cast("double").as("max_v")): _*)
    state.select(kc ++ Seq(col("n"), col("sum_v").cast("double"),
        col("min_v").cast("double"), col("max_v").cast("double")): _*)
      .unionByName(batchPartials)
      .groupBy(kc: _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Read-time derived measures over an aggregate state: the
    * non-algebraic aggregates (avg here) computed FROM the mergeable
    * ones, never stored. */
  def withDerived(state: DataFrame): DataFrame =
    state.withColumn("avg_v", col("sum_v") / col("n"))
}
