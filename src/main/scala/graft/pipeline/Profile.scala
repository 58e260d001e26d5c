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
 * Scale shape: ONE aggregation emits every statistic for every
 * profiled column (the exact distincts make Catalyst plan an Expand —
 * one data pass multiplied by the distinct-column count; a
 * 100 TB deployment drops `exactDistinct` and keeps only the HLL
 * sketch, same pass, no Expand). The result is |columns| x 7 values
 * collected to the driver — bounded by the schema, never the data.
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
    * fixed-scale text; strings/timestamps yield null (collation and
    * format are engine-specific). */
  private def canon(dt: DataType, c: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         BooleanType => c.cast("string")
    case FloatType | DoubleType =>
      round(c.cast("double"), 4).cast(DecimalType(28, 4)).cast("string")
    case _: DecimalType =>
      c.cast(DecimalType(28, 4)).cast("string")
    case _ => lit(null).cast("string")
  }

  def profile(spark: SparkSession, df: DataFrame, columns: Seq[String],
      band: Double = 0.05): DataFrame = {
    require(columns.nonEmpty, "profile: no columns given")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: columns.flatMap { c =>
      val dt = df.schema(c).dataType
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        // rsd << band keeps the flag stable (the hllDistinctBand rule)
        approx_count_distinct(col(c), 0.01).as(s"__hll_$c"),
        canon(dt, min(col(c))).as(s"__min_$c"),
        canon(dt, max(col(c))).as(s"__max_$c"))
    }
    val r: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    val rows = columns.zipWithIndex.map { case (c, i) =>
      val base = 1 + i * 5
      val nulls = if (r.isNullAt(base)) 0L else r.getLong(base)
      val nd = r.getLong(base + 1)
      val hll = r.getLong(base + 2)
      val minV = if (r.isNullAt(base + 3)) null else r.getString(base + 3)
      val maxV = if (r.isNullAt(base + 4)) null else r.getString(base + 4)
      val inBand = math.abs(hll - nd).toDouble <= math.max(1.0, nd * band)
      (c, n, nulls, nd, minV, maxV, inBand)
    }
    import spark.implicits._
    rows.toDF("col_name", "n_rows", "n_nulls", "n_distinct",
      "min_v", "max_v", "hll_in_band")
  }
}
