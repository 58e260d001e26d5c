package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/**
 * Exact distributed quantiles without a global sort.
 *
 * The reference exposes quantile-style reductions through its
 * array-reduce surface (`oph_reduce` op=quantile family); at the
 * relational level Spark offers only `percentile` (exact, but a
 * single-reducer sort of all values per group) and
 * `percentile_approx` (bounded error, not exact). This operator
 * computes EXACT discrete quantiles — the element at rank
 * `max(1, ceil(q·N))` of the sorted non-null multiset, the same
 * element DuckDB's `quantile_disc` selects — over data far too large
 * to sort globally.
 *
 * Algorithm: iterative histogram refinement.
 *   1. One aggregate computes N, min, max.
 *   2. Per round, ONE filtered aggregation buckets the candidate
 *      value range into `buckets` equi-width cells and ships only the
 *      ≤`buckets`-row count vector to the driver — partial
 *      aggregation combines map-side, so the shuffle is
 *      O(buckets × partitions) partial rows, never data.
 *   3. The driver walks the cumulative counts to the bucket holding
 *      the target rank. If that bucket holds ≤ `collectCap` values
 *      they are collected and the answer read off directly; otherwise
 *      the bucket becomes the next round's range (membership is
 *      re-derived from the SAME bucket-index expression, so FP
 *      boundary rounding can never drop or double-count a value).
 *
 * Each round shrinks the candidate range by ~`buckets`×, so real
 * data resolves in 1-2 rounds (log_buckets of the value-range/cap
 * ratio); a degenerate range (lo == hi) short-circuits to the
 * answer, which also bounds pathological duplicate-heavy inputs.
 * Driver memory is O(buckets + collectCap) — never data-scale.
 *
 * At 100 TB: P passes × one scan each, no global sort, no shuffle of
 * data rows. The scan is a 2-column projection (value only) that
 * parquet prunes to one column chunk.
 */
object Quantiles {

  /** (q, value) for each requested quantile of `valueCol`, cast to
    * double; nulls are ignored, matching SQL quantile semantics. */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      buckets: Int = 8192, collectCap: Int = 1 << 18): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0,1]: $qs")
    require(buckets >= 2 && collectCap >= 1)
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !col("v").isNaN)
    val head = vals.agg(count(col("v")), min(col("v")), max(col("v")))
      .collect()(0)
    val n = head.getLong(0)
    require(n > 0, s"exactQuantiles: no non-null values in $valueCol")
    val (gMin, gMax) = (head.getDouble(1), head.getDouble(2))

    // the element at 1-based rank ceil(q·N) — double multiply then
    // ceil, the arithmetic quantile_disc uses, so boundary ranks
    // (q·N integral) agree bit-for-bit with the oracle
    def rankOf(q: Double): Long = math.max(1L, math.ceil(q * n).toLong)

    // rank within the candidate range [lo, hi] -> the value
    def resolve(lo: Double, hi: Double, rank: Long): Double = {
      if (lo == hi) return lo
      val width = hi - lo
      val bucketIx = least(lit(buckets - 1),
        floor((col("v") - lo) / width * buckets).cast("int")).as("b")
      val inRange = vals.filter(col("v") >= lo && col("v") <= hi)
      val hist = inRange.select(bucketIx)
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var cum = 0L
      var k = 0
      while (k < buckets && cum + hist.getOrElse(k, 0L) < rank) {
        cum += hist.getOrElse(k, 0L); k += 1
      }
      require(k < buckets, s"rank $rank beyond range [$lo,$hi]")
      val residual = rank - cum
      // membership re-derives the same monotonic bucket-index
      // expression, so [bucket-min, bucket-max] of the next round is
      // exactly this bucket's value set
      val bucket = inRange
        .filter(least(lit(buckets - 1),
          floor((col("v") - lo) / width * buckets).cast("int")) === k)
      val cnt = hist(k)
      if (cnt <= collectCap) {
        val sorted = bucket.collect().map(_.getDouble(0)).sorted
        sorted(residual.toInt - 1)
      } else {
        // refine: the bucket's OWN min/max is the next range — derived
        // from membership, not from FP boundary arithmetic
        val mm = bucket.agg(min(col("v")), max(col("v"))).collect()(0)
        resolve(mm.getDouble(0), mm.getDouble(1), residual)
      }
    }

    val rows = qs.map(q => Row(q, resolve(gMin, gMax, rankOf(q))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("q", DoubleType, nullable = false),
        StructField("value", DoubleType, nullable = false))))
  }
}
