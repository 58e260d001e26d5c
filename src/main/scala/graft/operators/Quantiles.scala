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
 *      each target rank. All targets share the round's histogram, and
 *      every targeted bucket holding ≤ `collectCap` values collects
 *      in ONE batched filtered pass — the common case is 3 jobs total
 *      for any number of quantiles. An oversized bucket becomes the
 *      next round's range (membership is re-derived from the SAME
 *      bucket-index expression, so FP boundary rounding can never
 *      drop or double-count a value).
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

    def bucketIx(lo: Double, width: Double): org.apache.spark.sql.Column =
      least(lit(buckets - 1),
        floor((col("v") - lo) / width * buckets).cast("int"))

    // ALL targets sharing a candidate range [lo, hi] resolve off ONE
    // histogram pass and (for buckets under collectCap) ONE batched
    // multi-bucket collect — 3 jobs total for the common case instead
    // of (histogram + collect) per quantile. Oversized buckets recurse
    // with their residual ranks, still batched per range.
    def resolve(lo: Double, hi: Double,
        ranks: Seq[Long]): Seq[Double] = {
      if (lo == hi) return ranks.map(_ => lo)
      val width = hi - lo
      val inRange = vals.filter(col("v") >= lo && col("v") <= hi)
      val hist = inRange.select(bucketIx(lo, width).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // locate each rank's bucket + residual via one cumulative walk
      val located = ranks.map { rank =>
        var cum = 0L
        var k = 0
        while (k < buckets && cum + hist.getOrElse(k, 0L) < rank) {
          cum += hist.getOrElse(k, 0L); k += 1
        }
        require(k < buckets, s"rank $rank beyond range [$lo,$hi]")
        (rank, k, rank - cum)
      }
      val smallKs = located.map(_._2).distinct
        .filter(k => hist(k) <= collectCap)
      // membership re-derives the same monotonic bucket-index
      // expression, so FP boundary rounding can never drop a value;
      // all small buckets collect in one filtered pass
      val smallVals: Map[Int, Array[Double]] =
        if (smallKs.isEmpty) Map.empty
        else inRange
          .select(bucketIx(lo, width).as("b"), col("v"))
          .filter(col("b").isin(smallKs: _*))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
      val bigs = located.filterNot(t => smallVals.contains(t._2))
      // oversized buckets (duplicate-heavy data): recurse per bucket
      // with that bucket's OWN min/max as the next range, batching the
      // residual ranks that share it
      val bigResolved: Map[(Int, Long), Double] =
        bigs.groupBy(_._2).flatMap { case (k, ts) =>
          val mm = inRange.filter(bucketIx(lo, width) === k)
            .agg(min(col("v")), max(col("v"))).collect()(0)
          val rs = ts.map(_._3)
          rs.zip(resolve(mm.getDouble(0), mm.getDouble(1), rs))
            .map { case (res, v) => (k, res) -> v }
        }
      located.map { case (_, k, residual) =>
        smallVals.get(k) match {
          case Some(sorted) => sorted(residual.toInt - 1)
          case None => bigResolved((k, residual))
        }
      }
    }

    val answers = resolve(gMin, gMax, qs.map(rankOf))
    val rows = qs.zip(answers).map { case (q, v) => Row(q, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("q", DoubleType, nullable = false),
        StructField("value", DoubleType, nullable = false))))
  }
}
