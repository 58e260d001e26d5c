package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Mergeable sketches for corpus-scale accounting — the summaries a
 * 100 TB pipeline keeps when exact global state would not fit: heavy
 * hitters (Misra-Gries), approximate distinct counts (HyperLogLog++),
 * quantiles (see [[graft.functions.QuantileSketch]]).
 *
 * Reference context: ophidia exposes aggregate statistics through
 * `oph_reduce` / `oph_aggregate` ops (core/oph_analytics_operators) but
 * has no sub-linear summary structures; these close that gap for the
 * training-data-pipeline surface.
 *
 * Scale design: every sketch here is (a) built per partition with
 * bounded memory, (b) merged associatively, and (c) — where the final
 * answer must be EXACT — used only to prune the candidate set for an
 * exact second pass. The exact pass touches `O(candidates)` keys, not
 * `O(distinct)`, which is what makes "top offenders over 100 TB"
 * tractable: the sketch is the scan, the exact pass is a broadcast
 * semi-join.
 */
object Sketches {

  /** Per-partition Misra-Gries summary with `k` counters.
    *
    * Classic guarantee: any item occurring more than n_p/(k+1) times in
    * the partition survives in the summary. By averaging, any item with
    * GLOBAL count > N/(k+1) must exceed n_p/(k+1) in at least one
    * partition — so the union of partition summaries is a SUPERSET of
    * every global heavy hitter above N/k (> N/(k+1)). The summary is
    * order-dependent; the final exact-confirmed output is not.
    */
  private def misraGries(it: Iterator[Long], k: Int): Iterator[Long] = {
    val counters = new java.util.HashMap[Long, Long](k * 2)
    while (it.hasNext) {
      val x = it.next()
      val c = counters.get(x)
      if (c != 0L || counters.containsKey(x)) counters.put(x, c + 1)
      else if (counters.size < k) counters.put(x, 1L)
      else {
        // decrement-all: O(k) amortized against the k increments that
        // filled the table; removes keys reaching zero
        val e = counters.entrySet.iterator
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
        }
      }
    }
    val out = new Array[Long](counters.size)
    val ks = counters.keySet.iterator
    var i = 0
    while (ks.hasNext) { out(i) = ks.next(); i += 1 }
    out.iterator
  }

  /** Exact heavy hitters: every key with count > total/k, with its
    * exact count — sketch-pruned so the exact aggregation only runs
    * over candidate keys.
    *
    * Plan shape: one narrow scan building per-partition Misra-Gries
    * summaries (bounded k counters each, no shuffle), the tiny
    * candidate union broadcast back, one hash aggregation over the
    * semi-joined rows. The wide `groupBy(key)` over the full keyspace
    * never happens; candidate cardinality is <= k * numPartitions
    * regardless of data volume.
    *
    * Output is EXACT and deterministic: the MG summary varies with
    * partition order, but it is always a superset of the true heavy
    * hitters, and the confirm pass computes exact counts and applies
    * the threshold. */
  def heavyHitters(spark: SparkSession, df: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    import spark.implicits._
    // the sketch runs on primitive longs; a non-integral key (e.g. a
    // string id) would cast to null row-by-row, silently collapsing
    // every key into the null group — misuse must fail loudly instead
    // (hash string keys to xxhash64 first if identity isn't needed)
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"heavyHitters: key column $keyCol has non-integral type $other; " +
          "pre-hash it (e.g. xxhash64) to a long key")
    }
    val all = df.select(col(keyCol).cast("long").as(keyCol))
    // null keys can't flow through the primitive-long sketch, but a
    // null group CAN be a heavy hitter (a groupBy would report it) —
    // count it exactly in the same pass as the total and append
    val counts = all.agg(count(lit(1)).as("__n"),
      sum(col(keyCol).isNull.cast("long")).as("__nulls")).head
    val total = counts.getLong(0)
    val nullCnt = if (counts.isNullAt(1)) 0L else counts.getLong(1)
    val keys: Dataset[Long] = all.filter(col(keyCol).isNotNull).as[Long]
    val cands = keys.mapPartitions(it => misraGries(it, k))
      .toDF(keyCol).distinct()
    val hot = all.filter(col(keyCol).isNotNull)
      .join(broadcast(cands), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > total.toDouble / k)
    if (nullCnt > total.toDouble / k)
      hot.unionByName(spark.sql(s"SELECT CAST(NULL AS BIGINT) AS `$keyCol`, " +
        s"CAST($nullCnt AS BIGINT) AS cnt"))
    else hot
  }

  /** Approximate distinct count (HyperLogLog++) per group, with the
    * exact count alongside and an in-band flag — the sketch_quantile
    * pattern: the oracle pins the exact value and that the estimate
    * sits inside the error band, so estimator drift fails the hash.
    * `rsd` is the requested relative standard deviation; `band` the
    * asserted relative error (band >> rsd keeps the flag stable). */
  def hllDistinctBand(df: DataFrame, groupCol: String, keyCol: String,
      rsd: Double = 0.01, band: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(keyCol), rsd).as("__hll"),
        countDistinct(col(keyCol)).as("exact_distinct"))
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("__hll") - col("exact_distinct")) <=
          col("exact_distinct") * band).as("in_band"))
}
