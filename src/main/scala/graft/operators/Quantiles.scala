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
    // an infinite endpoint makes the bucket width infinite and every
    // bucket index NaN→null — fail with the cause, not a deep NPE
    require(!gMin.isInfinite && !gMax.isInfinite,
      s"exactQuantiles: $valueCol contains non-finite values " +
        s"(min=$gMin, max=$gMax) — filter ±Infinity out first")

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

  /**
   * Per-group exact discrete quantiles — the grouped form of
   * [[exactQuantiles]], same rank arithmetic (element at
   * max(1, ceil(q·n_g)) of each group's sorted non-null multiset,
   * matching DuckDB `quantile_disc ... GROUP BY`).
   *
   * The naive grouped path is `percentile(...) GROUP BY g`: a full
   * sort of every group's values inside one reducer per group — a
   * skewed group at 100 TB is a single-task sort of that group's
   * entire column. This operator instead runs the SAME histogram
   * refinement for EVERY group simultaneously:
   *
   *   - one aggregation yields per-group (n, min, max) — the "cell"
   *     seed list, bounded at the distinct-group count (`maxGroups`
   *     guard; unbounded group domains belong to the sketch path);
   *   - per round, ONE scan broadcast-joins the bounded cell table
   *     (group ⇒ candidate range), buckets each value inside its own
   *     group's range, and ships a ≤ cells×buckets count vector to
   *     the driver — every group and every quantile share that single
   *     pass, the grouped form of the "fold driver-loop items into
   *     the job" rule;
   *   - the driver walks each cell's cumulative counts; all small
   *     target buckets across ALL groups collect in one batched
   *     filtered pass, all oversized ones re-range in one batched
   *     min/max aggregation and carry to the next round.
   *
   * Jobs per round are 2-3 REGARDLESS of group and quantile count;
   * driver memory is bounded by a fixed histogram budget (~4M
   * entries): the per-round bucket count adapts to
   * `budget / liveCells`, so a many-group call trades extra
   * refinement rounds — never driver memory — for group count.
   * `collectCap` is likewise a per-ROUND total collect budget packed
   * greedily smallest-bucket-first; buckets that miss a round's
   * budget re-range and resolve in a later round.
   * Null group keys form their own group (SQL GROUP BY semantics) —
   * the cell join is null-safe.
   *
   * Reference surface: oph_reduce2 quantile ops grouped over an
   * explicit dimension (reference workflow task chains under
   * `/root/reference/src/oph_workflow/` compose reduce over
   * subsetted groups).
   *
   * @return one row per (group, q): (groupCol original type, q, value)
   */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double], buckets: Int = 8192,
      collectCap: Int = 1 << 18, maxGroups: Int = 1 << 16,
      histBudget: Int = 1 << 22): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0,1]: $qs")
    require(buckets >= 2 && collectCap >= 1)
    val spark = df.sparkSession
    val gField = df.schema(groupCol)
    val vals = df.select(col(groupCol).as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !col("v").isNaN)
    val head = vals.groupBy("g")
      .agg(count(col("v")).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .limit(maxGroups + 1).collect()
    require(head.length <= maxGroups,
      s"exactQuantilesByGroup: over $maxGroups distinct groups — " +
        "an unbounded group domain wants the sketch path " +
        "(QuantileSketch), not exact per-group refinement")
    require(head.nonEmpty,
      s"exactQuantilesByGroup: no non-null values in $valueCol")
    head.foreach { r =>
      require(!r.getDouble(2).isInfinite && !r.getDouble(3).isInfinite,
        s"exactQuantilesByGroup: group ${r.get(0)} has non-finite " +
          s"$valueCol (min=${r.getDouble(2)}, max=${r.getDouble(3)}) — " +
          "filter ±Infinity out first")
    }
    val groups = head.map(r => r.get(0))
    // one target per (group, quantile); targets sharing a candidate
    // range share a CELL, and every live cell rides the same jobs
    case class Target(gi: Int, q: Double, rank: Long)
    var unresolved: Seq[(Target, (Double, Double))] =
      head.toIndexedSeq.zipWithIndex.flatMap { case (r, gi) =>
        val n = r.getLong(1)
        qs.map(q => (Target(gi, q, math.max(1L, math.ceil(q * n).toLong)),
          (r.getDouble(2), r.getDouble(3))))
      }
    val resolved = scala.collection.mutable.ArrayBuffer.empty[(Target, Double)]
    val cellSchema = StructType(Seq(gField.copy(name = "g"),
      StructField("cell", org.apache.spark.sql.types.IntegerType, false),
      StructField("lo", DoubleType, false),
      StructField("hi", DoubleType, false)))
    // the driver walk is O(liveCells × buckets): with many groups the
    // per-round bucket count must shrink so the histogram collect
    // stays under the fixed driver budget (default ~4M entries ≈ tens
    // of MB). Fewer buckets only means more refinement rounds (range
    // shrinks by buckets× per round), never unboundedness.
    require(histBudget >= 16)
    var rounds = 0
    while (unresolved.nonEmpty) {
      rounds += 1
      require(rounds <= 64,
        "exactQuantilesByGroup: no convergence after 64 rounds")
      // degenerate ranges (all remaining values equal) answer directly
      val (flat, live) = unresolved.partition { case (_, (lo, hi)) => lo == hi }
      resolved ++= flat.map { case (t, (lo, _)) => t -> lo }
      if (live.isEmpty) { unresolved = Nil }
      else {
        // cell identity is (group, range): two groups can share a
        // coincidentally-equal candidate range but must never share a
        // histogram — their value sets differ
        val cellRanges = live.map { case (t, r) => (t.gi, r) }
          .distinct.zipWithIndex
        val cellOf = cellRanges.toMap
        val byCell: Map[Int, Seq[Target]] = live
          .groupBy { case (t, r) => cellOf((t.gi, r)) }
          .map { case (c, ts) => c -> ts.map(_._1) }
        val cellsDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            cellRanges.map { case ((gi, (lo, hi)), c) =>
              Row(groups(gi), c, lo, hi)
            }, 1), cellSchema)
        val bkts = math.max(16,
          math.min(buckets, histBudget / cellRanges.size))
        val bIx = least(lit(bkts - 1),
          floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bkts)
            .cast("int"))
        // one scan: each value buckets inside ITS group's candidate
        // range; null-safe key so a null group still joins its cell
        val joined = vals
          .join(broadcast(cellsDf), vals("g") <=> cellsDf("g"))
          .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        val hist: Map[(Int, Int), Long] = joined
          .groupBy(col("cell"), bIx.as("b")).agg(count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        // locate every target's bucket via its cell's cumulative walk
        val located = byCell.toSeq.flatMap { case (c, ts) =>
          ts.map { t =>
            var cum = 0L; var k = 0
            while (k < bkts &&
                cum + hist.getOrElse((c, k), 0L) < t.rank) {
              cum += hist.getOrElse((c, k), 0L); k += 1
            }
            require(k < bkts,
              s"rank ${t.rank} beyond cell $c of ${cellRanges.size}")
            (t, c, k, t.rank - cum)
          }
        }
        val key = col("cell").cast("long") * bkts + bIx
        // collectCap is a PER-ROUND TOTAL budget, not per-bucket: with
        // many groups, per-bucket capping would still let one round
        // collect groups × quantiles × cap values. Greedy
        // smallest-first packing keeps the driver bounded; buckets
        // that miss this round's budget re-range and resolve next
        // round with the budget to themselves.
        val targeted = located.map { case (_, c, k, _) => (c, k) }
          .distinct.map(ck => ck -> hist(ck))
        var budget = collectCap.toLong
        val smallSet = scala.collection.mutable.HashSet.empty[(Int, Int)]
        targeted.sortBy(_._2).foreach { case (ck, cnt) =>
          if (cnt <= budget) { smallSet += ck; budget -= cnt }
        }
        val smallKeys = smallSet.toSeq
          .map { case (c, k) => c.toLong * bkts + k }
        // one batched pass collects EVERY small target bucket of every
        // group; membership re-derives the same bucket expression so
        // FP boundary rounding cannot drop or double-count a value
        val smallVals: Map[Long, Array[Double]] =
          if (smallKeys.isEmpty) Map.empty
          else joined.select(key.as("k"), col("v"))
            .filter(col("k").isin(smallKeys: _*))
            .collect().groupBy(_.getLong(0))
            .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
        val bigKeys = located.collect {
          case (_, c, k, _) if !smallSet((c, k)) =>
            c.toLong * bkts + k
        }.distinct
        // oversized buckets re-range in ONE batched min/max agg and
        // become next round's cells with their residual ranks
        val bigRanges: Map[Long, (Double, Double)] =
          if (bigKeys.isEmpty) Map.empty
          else joined.select(key.as("k"), col("v"))
            .filter(col("k").isin(bigKeys: _*))
            .groupBy("k").agg(min("v").as("lo"), max("v").as("hi"))
            .collect()
            .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
            .toMap
        val next = Seq.newBuilder[(Target, (Double, Double))]
        located.foreach { case (t, c, k, residual) =>
          val kk = c.toLong * bkts + k
          smallVals.get(kk) match {
            case Some(sorted) =>
              resolved += t -> sorted(residual.toInt - 1)
            case None =>
              next += ((t.copy(rank = residual), bigRanges(kk)))
          }
        }
        unresolved = next.result()
      }
    }
    val outSchema = StructType(Seq(gField.copy(name = groupCol),
      StructField("q", DoubleType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val rows = resolved.toSeq
      .map { case (t, v) => Row(groups(t.gi), t.q, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      outSchema)
  }
}
