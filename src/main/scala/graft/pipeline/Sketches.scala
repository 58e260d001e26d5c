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
  /** Every sketch here runs on primitive longs; a non-integral key
    * (e.g. a string id) would cast to null row-by-row, silently
    * collapsing every key into the null group — misuse must fail
    * loudly instead (pre-hash string keys with xxhash64 when identity
    * isn't needed). */
  private def requireIntegralKey(df: DataFrame, keyCol: String,
      what: String): Unit =
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"$what: key column $keyCol has non-integral type $other; " +
          "pre-hash it (e.g. xxhash64) to a long key")
    }

  def heavyHitters(spark: SparkSession, df: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    import spark.implicits._
    requireIntegralKey(df, keyCol, "heavyHitters")
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

  /** A merged Count-Min sketch: `depth x width` counters, each row a
    * different deterministic hash. Point estimate = min over rows —
    * NEVER an undercount (every row only adds), overcount bounded by
    * ~total/width per row in expectation. Memory is depth*width*8
    * bytes regardless of data volume; merging is elementwise add. */
  final case class CountMinSketch(depth: Int, width: Int,
      table: Array[Array[Long]], total: Long) {
    def merge(o: CountMinSketch): CountMinSketch = {
      require(depth == o.depth && width == o.width, "shape mismatch")
      val t = Array.tabulate(depth, width)((d, w) =>
        table(d)(w) + o.table(d)(w))
      CountMinSketch(depth, width, t, total + o.total)
    }
    def estimate(key: Long): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val v = table(d)(CountMinSketch.bucket(key, d, width))
        if (v < best) best = v
        d += 1
      }
      if (best == Long.MaxValue) 0L else best
    }
  }

  object CountMinSketch {
    /** Deterministic per-row bucket: byteswap64 mix of (key, row). */
    def bucket(key: Long, row: Int, width: Int): Int = {
      val h = scala.util.hashing.byteswap64(
        key ^ (0x9E3779B97F4A7C15L * (row + 1)))
      (((h % width) + width) % width).toInt
    }
  }

  /** Build a [[CountMinSketch]] over an integral key column: bounded
    * per-partition tables (depth*width longs), merged with a tree
    * reduction — no shuffle of the data, no driver-side key set. The
    * sketch answers point-frequency queries over a keyspace too large
    * to aggregate exactly; unlike [[heavyHitters]] it serves ANY key,
    * at the price of an approximate (one-sided) answer. */
  def countMin(df: DataFrame, keyCol: String, depth: Int = 5,
      width: Int = 2048): CountMinSketch = {
    requireIntegralKey(df, keyCol, "countMin")
    val d = depth; val w = width
    val parts = df.select(col(keyCol).cast("long"))
      .filter(col(keyCol).isNotNull)
      .rdd.map(_.getLong(0))
      .mapPartitions { it =>
        val t = Array.ofDim[Long](d, w)
        var n = 0L
        while (it.hasNext) {
          val k = it.next()
          var row = 0
          while (row < d) {
            t(row)(CountMinSketch.bucket(k, row, w)) += 1
            row += 1
          }
          n += 1
        }
        Iterator.single(CountMinSketch(d, w, t, n))
      }
    if (parts.partitions.isEmpty)
      CountMinSketch(d, w, Array.ofDim[Long](d, w), 0L)
    else parts.treeReduce(_.merge(_), depth = 2)
  }

  /** Approximate distinct count (HyperLogLog++) per group, with the
    * exact count alongside and an in-band flag — the sketch_quantile
    * pattern: the oracle pins the exact value and that the estimate
    * sits inside the error band, so estimator drift fails the hash.
    * `rsd` is the requested relative standard deviation; `band` the
    * asserted relative error (band >> rsd keeps the flag stable). */
  def hllDistinctBand(df: DataFrame, groupCol: String, keyCol: String,
      rsd: Double = 0.01, band: Double = 0.05): DataFrame =
    // distinct FIRST, then both aggregates over the deduped pairs:
    // mixing countDistinct with a non-distinct aggregate makes Catalyst
    // plan an Expand that doubles every shuffled row (2x|input| through
    // the exchange at the 100x replica), while HLL registers are maxes
    // over hashes — duplicate-insensitive — so approx_count_distinct
    // over the distinct pairs is BIT-IDENTICAL to running it over the
    // raw rows (SketchesSpec pins that), and the exact count becomes a
    // plain count. One map-side-combined distinct shuffle total.
    // count(keyCol), NOT count(lit(1)): a (group, NULL) pair survives
    // distinct() as one row, and countDistinct — the contract this
    // fuses — ignores nulls. count(col) skips that surviving null row,
    // so groups with null keys keep the exact countDistinct semantics
    // (an all-null group reads 0, and in_band stays consistent with
    // approx_count_distinct, which also ignores nulls). ADVICE r17.
    df.select(col(groupCol), col(keyCol)).distinct()
      .groupBy(col(groupCol))
      .agg(approx_count_distinct(col(keyCol), rsd).as("__hll"),
        count(col(keyCol)).as("exact_distinct"))
      .select(col(groupCol), col("exact_distinct"),
        (abs(col("__hll") - col("exact_distinct")) <=
          col("exact_distinct") * band).as("in_band"))
}
