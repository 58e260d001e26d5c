package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Subset-string algebra: the reference's core addressing primitive.
 *
 * Grammar (reference `src/oph_subset_library.c:64-190`, struct at
 * `src/oph_subset_library.h:37-47`):
 *   subset  := clause (',' clause)*
 *   clause  := value | value ':' value | value ':' value ':' value
 *   value   := positive integer | 'end'
 * Semantics: 1-based, inclusive, `start[:stride]:end`; the keyword `end`
 * resolves to the dimension size and is only valid when the size is known
 * (`oph_subset_library.c:116-122`). A comma-separated list is a union of
 * intervals. Errors: start > end, stride < 1, more than 3 fields.
 *
 * The compiled forms are Spark-first: a `Column` predicate
 * (`col >= s && col <= e && (col - s) % st == 0`) that Catalyst pushes to
 * the Parquet scan for explicit dimensions, and an index-set for slicing
 * implicit (in-array) dimensions via higher-order functions.
 */
object Subset {

  /** One `start:stride:end` interval, 1-based inclusive. */
  final case class Interval(start: Long, stride: Long, end: Long) {
    require(start >= 1, s"subset start must be >= 1, got $start")
    require(stride >= 1, s"subset stride must be >= 1, got $stride")
    require(start <= end, s"subset start > end: $start > $end")
    def contains(i: Long): Boolean =
      i >= start && i <= end && (i - start) % stride == 0
    def count: Long = (end - start) / stride + 1
    def indices: Seq[Long] = start.to(end, stride)
    def render: String =
      if (start == end) s"$start"
      else if (stride == 1) s"$start:$end"
      else s"$start:$stride:$end"
  }

  final case class Spec(intervals: Seq[Interval]) {
    def contains(i: Long): Boolean = intervals.exists(_.contains(i))
    def indices: Seq[Long] = intervals.flatMap(_.indices).distinct.sorted
    def count: Long = indices.size.toLong
    def render: String = intervals.map(_.render).mkString(",")

    /** Predicate over a 1-based index column; pushdown-friendly. */
    def toColumn(col: Column): Column =
      intervals.map { iv =>
        val base = col >= iv.start && col <= iv.end
        if (iv.stride == 1) base
        else base && (col - iv.start) % iv.stride === 0
      }.reduce(_ || _)

    /** Predicate usable inside a higher-order function lambda, where the
      * index is a plain `Column` (e.g. from `posexplode` or
      * `filter(arr, (x, i) => ...)` with i 0-based → pass `i + 1`). */
    def toLambda(idx1Based: Column): Column = toColumn(idx1Based)
  }

  sealed abstract class ParseError(msg: String) extends Exception(msg)
  final class SyntaxError(msg: String) extends ParseError(msg)
  final class BoundsError(msg: String) extends ParseError(msg)

  /**
   * Parse a subset string. `max` is the dimension size the `end` keyword
   * resolves to; absent ⇒ `end` is an error (reference behavior when the
   * dimension size is unknown).
   */
  def parse(s: String, max: Option[Long] = None): Spec = {
    if (s == null || s.trim.isEmpty)
      throw new SyntaxError("empty subset string")
    val intervals = s.split(",", -1).toIndexedSeq.map { raw =>
      val clause = raw.trim
      if (clause.isEmpty) throw new SyntaxError(s"empty clause in '$s'")
      val parts = clause.split(":", -1).toIndexedSeq.map(_.trim)
      if (parts.length > 3)
        throw new SyntaxError(s"more than 3 fields in clause '$clause'")
      // 'end' is case-insensitive in the reference (strncasecmp,
      // `oph_subset_library.c:117`)
      def value(tok: String): Long = tok.toLowerCase match {
        case "end" =>
          max.getOrElse(throw new BoundsError(
            s"'end' keyword in '$clause' but dimension size unknown"))
        case t =>
          val v = try t.toLong catch {
            case _: NumberFormatException =>
              throw new SyntaxError(s"not a positive integer: '$t'")
          }
          if (v < 1) throw new SyntaxError(s"index must be >= 1, got $v")
          v
      }
      parts match {
        case Seq(a)       => val v = value(a); Interval(v, 1, v)
        case Seq(a, b)    => mk(value(a), 1, value(b), clause)
        case Seq(a, st, b) =>
          val stride = value(st)
          mk(value(a), stride, value(b), clause)
        case _ => throw new SyntaxError(s"bad clause '$clause'")
      }
    }
    Spec(intervals)
  }

  private def mk(s: Long, st: Long, e: Long, clause: String): Interval = {
    if (s > e) throw new BoundsError(s"start > end in '$clause'")
    Interval(s, st, e)
  }

  /**
   * time_filter compiler (`subset_dims` companion arg `time_filter`,
   * reference arg surface `/root/reference/src/oph_parser.h:68-70`;
   * value conventions from the public Ophidia subset documentation):
   *
   *   - `1996`            calendar year
   *   - `1996-04`         calendar month
   *   - `1996-04-15`      single day
   *   - `A_B`             inclusive range of any two of the above
   *   - `DJF|MAM|JJA|SON` meteorological season (any year)
   *   - comma-separated list = union
   *
   * Compiles to plain timestamp/month comparisons — pushdown-friendly,
   * no UDF.
   */
  def timeFilter(filter: String, col: Column): Column = {
    val seasons = Map(
      "DJF" -> Seq(12, 1, 2), "MAM" -> Seq(3, 4, 5),
      "JJA" -> Seq(6, 7, 8), "SON" -> Seq(9, 10, 11))

    def boundsOf(tok: String): (String, String) = tok.count(_ == '-') match {
      case 0 => // year
        val y = tok.toInt
        (f"$y-01-01", f"${y + 1}-01-01")
      case 1 => // month
        val Array(y, m) = tok.split("-").map(_.toInt)
        val (ny, nm) = if (m == 12) (y + 1, 1) else (y, m + 1)
        (f"$y%04d-$m%02d-01", f"$ny%04d-$nm%02d-01")
      case _ => // day
        (tok, java.time.LocalDate.parse(tok).plusDays(1).toString)
    }

    def clause(raw: String): Column = {
      val tok = raw.trim
      seasons.get(tok.toUpperCase) match {
        case Some(months) => month(col).isin(months: _*)
        case None =>
          val (lo, hi) =
            if (tok.contains("_")) {
              val Array(a, b) = tok.split("_", 2)
              (boundsOf(a.trim)._1, boundsOf(b.trim)._2)
            } else boundsOf(tok)
          col >= to_timestamp(lit(lo)) && col < to_timestamp(lit(hi))
      }
    }

    filter.split(",").map(clause).reduce(_ || _)
  }

  /**
   * Compress a value list into a subset string — the
   * `oph_set subset_filter=yes` behavior
   * (`src/oph_flow_control_operators.c:1427-1470`): maximal runs of
   * values each exactly `offset` after the previous collapse to
   * `start:end`; a lone value renders as itself. The reference never
   * emits stride clauses, does not sort, and does not deduplicate —
   * values are processed in input order.
   */
  def compress(values: Seq[Long], offset: Long = 1): String = {
    if (values.isEmpty) return ""
    val out = new StringBuilder
    var start = values.head
    var end = values.head
    def flush(): Unit = {
      if (out.nonEmpty) out += ','
      out ++= (if (start == end) s"$start" else s"$start:$end")
    }
    values.tail.foreach { v =>
      if (v == end + offset) end = v
      else { flush(); start = v; end = v }
    }
    flush()
    out.toString
  }

  /**
   * Real-valued compression — `oph_set subset_filter=real` with a
   * sampling `offset` (`src/oph_flow_control_operators.c:1473-1513`):
   * a value within `offset/2` of the expected next sample extends the
   * run; runs render as `(start-offset/2):(end+offset/2)` so the range
   * covers the sampling cells; lone values render as themselves.
   * Number formatting follows C's `%g`.
   */
  def compressReal(values: Seq[Double], offset: Double): String = {
    if (values.isEmpty || offset == 0.0) return ""
    val half = offset / 2.0
    def g(d: Double): String = {
      val s = f"$d%g"
      // mimic %g: strip trailing zeros in the fraction
      if (s.contains('.') && !s.contains('e') && !s.contains('E'))
        s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else s
    }
    val out = new StringBuilder
    var start = values.head
    var end = values.head
    var run = false
    def flush(): Unit = {
      if (out.nonEmpty) out += ','
      out ++= (if (run) s"${g(start - half)}:${g(end + half)}" else g(start))
    }
    values.tail.foreach { v =>
      if (math.abs(v - (end + offset)) < half) { end = v; run = true }
      else { flush(); start = v; end = v; run = false }
    }
    flush()
    out.toString
  }
}
