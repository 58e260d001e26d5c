package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * One-pass relational profiling — the ingest health report a corpus
 * pipeline runs on every new drop: per column, the row count, null
 * count, exact distinct cardinality with an HLL estimate checked
 * in-band, and min/max rendered as canonical strings so any engine
 * can compare them.
 *
 * Scale shape: ONE aggregation pass emits the counts, null counts,
 * HLL estimates and min/max for every profiled column. The EXACT
 * distinct counts deliberately run as one small distinct-count job
 * per column instead of joining that agg: Catalyst rewrites multiple
 * `count(DISTINCT)` columns mixed with other aggregates through an
 * Expand whose generated aggregate blows up combinatorially (measured
 * 28 s warm for 4 columns over 150k rows, vs ~1 s split). A 100 TB
 * deployment sets `exactDistinct = false` and keeps only the HLL
 * sketch — one pass, no per-column jobs. The result is
 * |columns| x 7 values collected to the driver — bounded by the
 * schema, never the data.
 *
 * The reference surfaces per-cube statistics through
 * `oph_cubeschema`/`oph_cubesize`/`oph_explorecube` summaries
 * (`/root/reference/src/oph_json/oph_json_objkeys.h` grid objkeys);
 * this is the relational generalization of that inspection surface.
 */
object Profile {

  /** Canonical cross-engine string rendering for min/max: integrals
    * and dates cast directly; floating types round to 4 decimals
    * through DECIMAL so both Spark and SQL engines print identical
    * fixed-scale text; TEXT columns report the min/max LENGTH in
    * characters (see [[textMinMax]] — lexicographic extremes are
    * collation-dependent across engines and useless as a corpus
    * health signal, while the length envelope catches truncated and
    * runaway documents); other types (timestamps, arrays) yield null. */
  private def canon(dt: DataType, c: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         BooleanType => c.cast("string")
    case FloatType | DoubleType =>
      round(c.cast("double"), 4).cast(DecimalType(28, 4)).cast("string")
    case _: DecimalType =>
      c.cast(DecimalType(28, 4)).cast("string")
    case _ => lit(null).cast("string")
  }

  /** Text min/max policy: the value fed to min()/max() for a string
    * column is its character LENGTH, not the string itself. */
  private def textMinMax(dt: DataType, c: Column): Column = dt match {
    case StringType => length(c)
    case _ => c
  }

  /** The type the min/max aggregate actually carries after the text
    * policy rewrites strings to lengths. */
  private def lenDt(dt: DataType): DataType = dt match {
    case StringType => IntegerType
    case other => other
  }

  /** The single shared statistics pass, exposed for plan audits: it
    * must NEVER contain an Expand (see the class scaladoc — that is
    * exactly the rewrite the split design avoids). */
  private[pipeline] def statsAgg(df: DataFrame,
      columns: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: columns.flatMap { c =>
      val dt = df.schema(c).dataType
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        // rsd < band keeps the flag stable; 0.03 deliberately, not
        // 0.01 — HLL++ cost scales with the register count and the
        // fixed per-task allocate/merge dominates on scheduling-sized
        // aggregates (measured on 5 columns x 5k rows: 3.5 s at
        // rsd=0.01, 0.5 s at 0.03, same flags)
        approx_count_distinct(col(c), 0.03).as(s"__hll_$c"),
        canon(lenDt(dt), min(textMinMax(dt, col(c)))).as(s"__min_$c"),
        canon(lenDt(dt), max(textMinMax(dt, col(c)))).as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def profile(spark: SparkSession, df: DataFrame, columns: Seq[String],
      band: Double = 0.05, exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "profile: no columns given")
    val r: Row = statsAgg(df, columns).head()
    val n = r.getLong(0)
    // exact distincts as one small job per column — see the scaladoc
    // for why they must not join the agg above. The jobs are
    // independent full scans, so they submit CONCURRENTLY (the same
    // driver-serialization argument as SinkCompaction's group pool).
    val nds: Map[String, Long] =
      if (!exactDistinct) Map.empty
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(4, columns.size))
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(columns.map(c =>
            scala.concurrent.Future(c ->
              df.filter(col(c).isNotNull).select(col(c))
                .distinct().count()))),
          scala.concurrent.duration.Duration.Inf).toMap
        finally pool.shutdown()
      }
    val rows = columns.zipWithIndex.map { case (c, i) =>
      val base = 1 + i * 4
      val nulls = if (r.isNullAt(base)) 0L else r.getLong(base)
      val hll = r.getLong(base + 1)
      val nd = nds.getOrElse(c, hll)
      val minV = if (r.isNullAt(base + 2)) null else r.getString(base + 2)
      val maxV = if (r.isNullAt(base + 3)) null else r.getString(base + 3)
      // without an exact count there is nothing to band against — the
      // flag is NULL, never vacuously true
      val inBand: Option[Boolean] =
        if (exactDistinct)
          Some(math.abs(hll - nd).toDouble <= math.max(1.0, nd * band))
        else None
      (c, n, nulls, nd, minV, maxV, inBand)
    }
    import spark.implicits._
    rows.toDF("col_name", "n_rows", "n_nulls", "n_distinct",
      "min_v", "max_v", "hll_in_band")
  }

  /** Embedding-corpus health, the ANN preflight: vector counts, null
    * vectors, vectors with NULL ELEMENTS (counted explicitly — a
    * naive fold would null-poison the norm and silently drop exactly
    * the corruption a health report exists to catch), dimensionality
    * consistency against the modal dimension, zero-norm vectors (they
    * poison cosine math), and the norm range. Norms sum over the
    * non-null elements, matching SQL engines' skip-null list
    * aggregation so the oracle compares exactly. Returns one row:
    * (n_vectors, n_null, n_elem_null, n_dim_mismatch, n_zero_norm,
    * modal_dim, min_norm, max_norm, avg_norm) with norms rounded to 4
    * decimals for cross-engine comparison. */
  def profileEmbeddings(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // a vector whose elements are ALL null (or an empty vector) has no
    // norm: yield NULL, matching SQL engines' list aggregation over an
    // empty list (a 0.0 here would count toward n_zero_norm/min_norm
    // while the oracle excludes it)
    val nonNullElems = filter(v.cast("array<double>"), x => x.isNotNull)
    val norm = when(size(nonNullElems) === 0, lit(null).cast("double"))
      .otherwise(sqrt(aggregate(
        nonNullElems, lit(0.0), (a, x) => a + x * x)))
    // modal dimension from a tiny (dim, count) aggregate
    val modal = df.filter(v.isNotNull)
      .groupBy(size(v).as("dim")).count()
      .orderBy(col("count").desc, col("dim"))
      .limit(1)
    val modalDim = modal.collect().headOption
      .map(_.getInt(0)).getOrElse(0)
    df.agg(
      count(lit(1)).as("n_vectors"),
      sum(v.isNull.cast("long")).as("n_null"),
      sum((v.isNotNull &&
          size(filter(v, x => x.isNull)) > 0).cast("long"))
        .as("n_elem_null"),
      sum((v.isNotNull && size(v) =!= modalDim).cast("long"))
        .as("n_dim_mismatch"),
      sum((v.isNotNull && norm === 0.0).cast("long")).as("n_zero_norm"),
      lit(modalDim).cast("long").as("modal_dim"),
      round(min(norm), 4).as("min_norm"),
      round(max(norm), 4).as("max_norm"),
      round(avg(norm), 4).as("avg_norm"))
  }
}
