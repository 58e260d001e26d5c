package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-contract validation: evaluate a rule set against a
 * table and return one report row per rule — the admission gate every
 * warehouse load and corpus refresh runs before publishing.
 *
 * Scale shape: every ROW-LOCAL rule (not-null, range, regex,
 * accepted-values) folds into ONE shared aggregate pass — adding a
 * 50th cheap rule costs zero extra jobs or shuffles. Uniqueness rules
 * each add one groupBy on their key (the only way to see cross-row
 * state), and referential rules one LEFT ANTI join against the parent
 * keys (AQE broadcasts a small parent, shuffles a big one). Nothing
 * collects data rows to the driver — only the per-rule violation
 * counts.
 */
object DataQuality {

  sealed trait Rule { def name: String }

  /** `col` must be non-null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null:$col"
  }

  /** Non-null values of `col` must satisfy lo <= v <= hi (either
    * bound optional). Nulls are NotNull's business, not Range's. */
  final case class Range(col: String, lo: Option[Double],
      hi: Option[Double]) extends Rule {
    def name = s"range:$col"
  }

  /** Non-null values of `col` must be one of `allowed`. */
  final case class AcceptedValues(col: String, allowed: Seq[String])
      extends Rule {
    def name = s"accepted:$col"
  }

  /** Non-null values of `col` must match `pattern` (Java regex,
    * unanchored like rlike — anchor explicitly). */
  final case class Matches(col: String, pattern: String) extends Rule {
    def name = s"matches:$col"
  }

  /** Rows where both columns are non-null must satisfy a <= b
    * (type-generic ordering: numerics, timestamps, strings). */
  final case class ColumnOrder(a: String, b: String) extends Rule {
    def name = s"order:$a<=$b"
  }

  /** The tuple `cols` must be unique; every row belonging to a
    * duplicated tuple counts as a violation. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique:${cols.mkString("+")}"
  }

  /** Non-null `col` values must exist in `parentCol` of `parent`. */
  final case class ForeignKey(col: String, parent: DataFrame,
      parentCol: String) extends Rule {
    def name = s"fk:$col"
  }

  /** @return (check, n_violations, pass) — one row per rule, in a
    *         deterministic order (sorted by check name). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) =>
        r.name -> sum(when(col(c).isNull, 1L).otherwise(0L))
      case r @ Range(c, lo, hi) =>
        val v = col(c).cast("double")
        val bad = lo.map(v < _).getOrElse(lit(false)) ||
          hi.map(v > _).getOrElse(lit(false))
        r.name -> sum(when(v.isNotNull && bad, 1L).otherwise(0L))
      case r @ AcceptedValues(c, vs) =>
        r.name -> sum(when(col(c).isNotNull &&
          !col(c).isInCollection(vs), 1L).otherwise(0L))
      case r @ Matches(c, p) =>
        r.name -> sum(when(col(c).isNotNull && !col(c).rlike(p), 1L)
          .otherwise(0L))
      case r @ ColumnOrder(a, b) =>
        r.name -> sum(when(col(a).isNotNull && col(b).isNotNull &&
          col(a) > col(b), 1L).otherwise(0L))
    }
    val rowLocalReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        val row = df.agg(rowLocal.head._2.as("c0"),
          rowLocal.tail.zipWithIndex.map { case ((_, c), i) =>
            c.as(s"c${i + 1}") }: _*).head()
        rowLocal.zipWithIndex.map { case ((n, _), i) =>
          (n, if (row.isNullAt(i)) 0L else row.getLong(i)) }
          .toDF("check", "n_violations")
      }
    val uniques = rules.collect { case r @ Unique(cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("check"), col("n_violations"))
    }
    val fks = rules.collect { case r @ ForeignKey(c, parent, pc) =>
      df.filter(col(c).isNotNull)
        .join(parent.select(col(pc).as(c)).distinct(), Seq(c),
          "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("check"), col("n_violations"))
    }
    (rowLocalReport.toSeq ++ uniques ++ fks)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check")
  }
}
