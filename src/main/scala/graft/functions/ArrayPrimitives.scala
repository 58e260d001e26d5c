package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.cube.CubeOps

/**
 * oph_apply primitive compiler — the reference's extensibility surface
 * (`/root/reference/src/oph_json/oph_json_objkeys.h:103`): an OPH_APPLY
 * task carries `query=oph_primitive(args…)` composed from the framework's
 * array primitives. Here every primitive compiles to a Catalyst `Column`
 * tree built from codegen'd builtins and higher-order functions — the
 * whole expression runs inside the executors with no UDF boundary.
 *
 * Grammar:  expr := prim '(' arg (',' arg)* ')' | 'measure' | number
 *           prim := oph_<name>
 * `measure` refers to the cube's in-cell array (or scalar) column.
 */
object ArrayPrimitives {

  sealed trait Ast
  final case class Call(name: String, args: Seq[Ast]) extends Ast
  final case object Measure extends Ast
  final case class Num(value: Double) extends Ast
  /** Quoted ('sin') or bare (sin) string argument — option names for
    * primitives like oph_math / oph_gsl_stats / oph_get_subarray2. */
  final case class Str(value: String) extends Ast

  /** Recursive-descent parse of `oph_name(a, b, oph_other(c))`. */
  def parse(s: String): Ast = {
    val (ast, rest) = parseExpr(s.trim)
    if (rest.trim.nonEmpty)
      throw new IllegalArgumentException(s"trailing input: '$rest'")
    ast
  }

  private def parseExpr(s: String): (Ast, String) = {
    val t = s.dropWhile(_ == ' ')
    if (t.startsWith("measure"))
      (Measure, t.drop("measure".length))
    else if (t.startsWith("'")) {
      val end = t.indexOf('\'', 1)
      if (end < 0)
        throw new IllegalArgumentException(s"unterminated string at: '$t'")
      (Str(t.substring(1, end)), t.substring(end + 1))
    } else if (t.nonEmpty && (t.head.isDigit || t.head == '-' || t.head == '.')) {
      val (num, rest) = t.span(c => c.isDigit || c == '.' || c == '-' || c == 'e' || c == 'E')
      (Num(num.toDouble), rest)
    } else {
      val (name, afterName) = t.span(c => c.isLetterOrDigit || c == '_')
      if (name.isEmpty)
        throw new IllegalArgumentException(s"expected primitive call at: '$t'")
      if (!afterName.startsWith("(")) // bare identifier = string option
        return (Str(name), afterName)
      var rest = afterName.drop(1)
      val args = scala.collection.mutable.ArrayBuffer.empty[Ast]
      var done = rest.dropWhile(_ == ' ').startsWith(")")
      if (done) rest = rest.dropWhile(_ == ' ').drop(1)
      while (!done) {
        val (a, r) = parseExpr(rest)
        args += a
        val r2 = r.dropWhile(_ == ' ')
        if (r2.startsWith(",")) rest = r2.drop(1)
        else if (r2.startsWith(")")) { rest = r2.drop(1); done = true }
        else throw new IllegalArgumentException(s"expected ',' or ')' at: '$r2'")
      }
      (Call(name, args.toSeq), rest)
    }
  }

  /** Compile an AST against the measure column. Array-in/array-out
    * primitives use `transform`/`zip_with`; array-to-scalar reductions
    * reuse CubeOps.reduceExpr. */
  def compile(ast: Ast, measure: Column): Column = ast match {
    case Measure   => measure
    case Num(v)    => lit(v)
    case Str(v)    => throw new IllegalArgumentException(
      s"string option '$v' is not valid here — only specific primitives " +
        "take string arguments")
    case Call(name, args) =>
      def a(i: Int): Column = compile(args(i), measure)
      def num(i: Int): Double = args(i) match {
        case Num(v) => v
        case other  => throw new IllegalArgumentException(
          s"$name: argument ${i + 1} must be a literal number, got $other")
      }
      def str(i: Int): String = args(i) match {
        case Str(v) => v
        case other  => throw new IllegalArgumentException(
          s"$name: argument ${i + 1} must be a string option, got $other")
      }
      name match {
        // elementwise array -> array
        case "oph_sum_scalar" => transform(a(0), x => x + lit(num(1)))
        case "oph_mul_scalar" => transform(a(0), x => x * lit(num(1)))
        case "oph_abs"        => transform(a(0), x => abs(x))
        case "oph_log"        => transform(a(0), x => log(x))
        case "oph_sqrt"       => transform(a(0), x => sqrt(x))
        case "oph_pow"        => transform(a(0), x => pow(x, lit(num(1))))
        case "oph_negate"     => transform(a(0), x => -x)
        // binary array x array -> array
        case "oph_sum_array" => zip_with(a(0), a(1), (x, y) => x + y)
        case "oph_sub_array" => zip_with(a(0), a(1), (x, y) => x - y)
        case "oph_mul_array" => zip_with(a(0), a(1), (x, y) => x * y)
        case "oph_div_array" => zip_with(a(0), a(1), (x, y) => x / y)
        // predicate(a, threshold, then, else): elementwise conditional —
        // simplified form of the reference's oph_predicate
        case "oph_predicate" =>
          transform(a(0), x =>
            when(x > lit(num(1)), lit(num(2))).otherwise(lit(num(3))))
        // array -> scalar reductions
        case "oph_max" => CubeOps.reduceExpr(a(0), "max")
        case "oph_min" => CubeOps.reduceExpr(a(0), "min")
        case "oph_sum" => CubeOps.reduceExpr(a(0), "sum")
        case "oph_avg" => CubeOps.reduceExpr(a(0), "avg")
        case "oph_count" => CubeOps.reduceExpr(a(0), "count")
        case "oph_std" => CubeOps.reduceExpr(a(0), "std")
        case "oph_var" => CubeOps.reduceExpr(a(0), "var")
        case "oph_arg_max" => CubeOps.reduceExpr(a(0), "arg_max")
        case "oph_arg_min" => CubeOps.reduceExpr(a(0), "arg_min")
        case "oph_quantile" => CubeOps.reduceExpr(a(0), "quantile", num(1))
        // moving average over a trailing window of k (partial windows at
        // the head, matching SQL `ROWS BETWEEN k-1 PRECEDING AND CURRENT`)
        // — native codegen'd Expression: one O(n) ring pass instead of an
        // interpreted O(n*k) slice+aggregate per element
        case "oph_moving_avg" =>
          graft.functions.expressions.GraftExpressions.moving_avg(a(0), num(1).toInt)
        // five-number summary [min, q1, median, q3, max]
        case "oph_boxplot" =>
          val sorted = array_sort(a(0))
          def q(p: Double): Column =
            element_at(sorted, ceil(lit(p) * size(sorted)).cast("int"))
          array(element_at(sorted, 1), q(0.25), q(0.5), q(0.75),
            element_at(sorted, size(sorted)))
        // reverse the in-cell order
        case "oph_reverse" => reverse(a(0))
        // first/last k
        case "oph_head" => slice(a(0), 1, num(1).toInt)
        case "oph_tail" =>
          slice(a(0), -num(1).toInt, num(1).toInt)
        // sorted copy of the cell (reference oph_gsl_sort)
        case "oph_sort" | "oph_gsl_sort" => array_sort(a(0))
        // shift(a, offset, fill): move elements offset places toward
        // higher indices (negative = toward lower), vacated slots get
        // the fill value — one indexed pass, any |offset|
        case "oph_shift" =>
          val arr = a(0); val k = num(1).toInt
          val fill = if (args.length > 2) num(2) else 0.0
          transform(indicesOf(arr, 1), i => {
            val src = i - lit(k)
            when(src >= 1 && src <= size(arr), element_at(arr, src))
              .otherwise(lit(fill))
          })
        // rotate(a, offset): circular shift (reference oph_rotate)
        case "oph_rotate" =>
          val arr = a(0); val k = num(1).toInt
          transform(indicesOf(arr, 1), i =>
            element_at(arr, pmod(i - lit(k) - 1, size(arr)) + 1))
        // padding(a, size, value): right-pad up to `size` elements
        case "oph_padding" =>
          val arr = a(0)
          val fill = if (args.length > 2) num(2) else 0.0
          concat(arr, array_repeat(lit(fill),
            greatest(lit(num(1).toInt) - size(arr), lit(0))))
        // extend(a, k): replicate each element k times in place
        case "oph_extend" =>
          flatten(transform(a(0), x => array_repeat(x, num(1).toInt)))
        // interlace(a, b): alternate elements of two equal-length cells
        case "oph_interlace" =>
          flatten(zip_with(a(0), a(1), (x, y) => array(x, y)))
        // concat two cells end to end (reference oph_concat)
        case "oph_concat" => concat(a(0), a(1))
        // find(a, v): number of elements equal to v
        case "oph_find" =>
          size(filter(a(0), x => x === lit(num(1)))).cast("long")
        // gsl_histogram(a, nbins, lo, hi): per-bin counts over
        // uniform bins [lo + i*w, lo + (i+1)*w), upper bound exclusive,
        // out-of-range values ignored (GSL semantics)
        case "oph_gsl_histogram" =>
          val arr = a(0); val nb = num(1).toInt
          val lo = num(2); val hi = num(3)
          val w = (hi - lo) / nb
          transform(sequence(lit(0), lit(nb - 1)), b =>
            size(filter(arr, x =>
              x >= lit(lo) + b.cast("double") * lit(w) &&
                x < lit(lo) + (b + 1).cast("double") * lit(w)))
              .cast("long"))
        // gsl_fft(a): discrete Fourier transform of the real cell,
        // returned GSL-packed as [re0, im0, re1, im1, ...]. O(n^2)
        // direct form (in-cell series are short) as a native codegen
        // Expression — compiled double loops, no interpreted HOF
        // boundary per element (the HOF formulation benched ~5x slower)
        case "oph_gsl_fft" =>
          graft.functions.expressions.GraftExpressions.dft(a(0),
            inverse = false)
        // gsl_dwt(a, 'haar'|'db4'): full-pyramid discrete wavelet
        // transform (periodic, power-of-two cells) — native codegen
        // kernel shared with explorenc's wavelet modes
        case "oph_gsl_dwt" =>
          graft.functions.expressions.GraftExpressions.dwt(a(0),
            if (args.size > 1) str(1) else "haar")
        // math(a, fname): elementwise math function by name — the
        // reference's oph_math surface (accepts 'sin', 'OPH_MATH_SIN',
        // quoted or bare, case-insensitive)
        case "oph_math" =>
          val f = str(1).toLowerCase
            .stripPrefix("oph_math_").stripPrefix("oph_")
          val fn: Column => Column = f match {
            case "sin" => sin; case "cos" => cos; case "tan" => tan
            case "asin" => asin; case "acos" => acos; case "atan" => atan
            case "sinh" => sinh; case "cosh" => cosh; case "tanh" => tanh
            case "exp" => exp; case "expm1" => expm1
            case "log" | "ln" => log; case "log1p" => log1p
            case "log2" => log2; case "log10" => log10
            case "sqrt" => sqrt; case "cbrt" => cbrt
            case "abs" | "fabs" => abs
            case "ceil" => x => ceil(x).cast("double")
            case "floor" => x => floor(x).cast("double")
            case "round" => x => round(x, 0)
            case "sign" | "sgn" => x => signum(x)
            case "square" | "sqr" => x => x * x
            case "recip" | "inv" => x => lit(1.0) / x
            case "degrees" => degrees; case "radians" => radians
            case other => throw new IllegalArgumentException(
              s"oph_math: unknown function '$other'")
          }
          transform(a(0), fn)
        // elementwise pairing of two cells
        case "oph_max_array" => zip_with(a(0), a(1), (x, y) => greatest(x, y))
        case "oph_min_array" => zip_with(a(0), a(1), (x, y) => least(x, y))
        // which input (1 or 2) held the extremum, elementwise
        case "oph_arg_max_array" =>
          zip_with(a(0), a(1), (x, y) => when(x >= y, 1.0).otherwise(2.0))
        case "oph_arg_min_array" =>
          zip_with(a(0), a(1), (x, y) => when(x <= y, 1.0).otherwise(2.0))
        // mask(a, m): keep x where the mask is nonzero, else 0 (the
        // reference's oph_mask fill)
        case "oph_mask" =>
          zip_with(a(0), a(1), (x, m) => when(m =!= 0.0, x).otherwise(0.0))
        // replace(a, from, to): exact-match value rewrite; a NaN `from`
        // replaces NaN cells (the common missing-value rewrite)
        case "oph_replace" =>
          val from = num(1); val to = num(2)
          transform(a(0), x =>
            if (from.isNaN) when(isnan(x), lit(to)).otherwise(x)
            else when(x === lit(from), lit(to)).otherwise(x))
        // literal vector / scalar broadcast
        case "oph_vector" => array(args.indices.map(a): _*)
        case "oph_scalar2array" => array_repeat(a(0), num(1).toInt)
        // cast(a, type): value-level cast — integer targets truncate
        // toward zero (storage stays double in this engine)
        case "oph_cast" | "oph_convert_d" =>
          str(1).toLowerCase.stripPrefix("oph_") match {
            case "byte" | "short" | "int" | "long" =>
              transform(a(0), x =>
                when(x >= 0, floor(x)).otherwise(ceil(x)).cast("double"))
            case "float" =>
              transform(a(0), x => x.cast("float").cast("double"))
            case "double" => a(0)
            case other => throw new IllegalArgumentException(
              s"oph_cast: unknown target type '$other'")
          }
        // cumulative scan: accumulate(a[, op]) op in sum|mul|max|min —
        // native O(n) codegen pass (HOF scans are O(n^2))
        case "oph_accumulate" | "oph_cumulative" | "oph_cumsum" =>
          val op = if (args.length > 1) str(1).toLowerCase else "sum"
          graft.functions.expressions.GraftExpressions.cum_op(a(0), op)
        // inverse of accumulate(sum): first differences, first kept
        case "oph_deaccumulate" =>
          val arr = a(0)
          when(size(arr) === 0, arr).otherwise(
            zip_with(arr,
              concat(array(lit(0.0)), slice(arr, lit(1),
                greatest(size(arr) - 1, lit(0)))),
              (x, p) => x - p))
        // in-cell subset: get_subarray(a, start, size) 1-based slice
        case "oph_get_subarray" => slice(a(0), num(1).toInt, num(2).toInt)
        // get_subarray2(a, 'filter'): reference index-filter syntax —
        // comma-separated 1-based parts `i`, `s:e`, `s:step:e`, with
        // `end` for the last index; inclusive bounds
        case "oph_get_subarray2" =>
          val arr = a(0)
          val parts = str(1).split(",").map(_.trim).filter(_.nonEmpty)
          val pieces = parts.map { p =>
            val seg = p.split(":").map(_.trim)
            def bound(s: String): Column =
              if (s == "end") size(arr) else lit(s.toInt)
            val (startC, stepC, endC) = seg.length match {
              case 1 => (bound(seg(0)), lit(1), bound(seg(0)))
              case 2 => (bound(seg(0)), lit(1), bound(seg(1)))
              case 3 => (bound(seg(0)), lit(seg(1).toInt), bound(seg(2)))
              case _ => throw new IllegalArgumentException(
                s"oph_get_subarray2: bad filter part '$p'")
            }
            // clamp to the cell and keep sequence() legal when empty
            val hi = least(endC, size(arr))
            transform(
              when(startC <= hi, sequence(startC, hi, stepC))
                .otherwise(array().cast("array<int>")),
              i => element_at(arr, i))
          }
          pieces.reduceLeft(concat(_, _))
        // gsl_stats(a, 'mean|std|...'): selected summary statistics in
        // request order ('|', '+', or ';' separated tokens)
        case "oph_gsl_stats" =>
          val toks = str(1).toLowerCase.split("[|+;]").map(_.trim)
            .filter(_.nonEmpty)
          array(toks.map {
            case "mean" | "avg" => CubeOps.reduceExpr(a(0), "avg")
            case "variance" | "var" => CubeOps.reduceExpr(a(0), "var")
            case "sd" | "std" => CubeOps.reduceExpr(a(0), "std")
            case "min" => CubeOps.reduceExpr(a(0), "min")
            case "max" => CubeOps.reduceExpr(a(0), "max")
            case "sum" => CubeOps.reduceExpr(a(0), "sum")
            case "absdev" => // mean absolute deviation from the mean
              val m = CubeOps.reduceExpr(a(0), "avg")
              CubeOps.reduceExpr(transform(a(0), x => abs(x - m)), "avg")
            case other => throw new IllegalArgumentException(
              s"oph_gsl_stats: unknown statistic '$other'")
          }: _*)
        // generic reduction by operator name (reference oph_operator)
        case "oph_operator" =>
          val op = str(1).toLowerCase.stripPrefix("oph_")
          CubeOps.reduceExpr(a(0), op)
        // aliases for names real reference queries use
        case "oph_append" => concat(a(0), a(1))
        case "oph_count_array" => CubeOps.reduceExpr(a(0), "count")
        // gsl_ifft(a): inverse DFT over a GSL-packed [re0, im0, ...]
        // cell, 1/n scaled, packed back — same native codegen Expression
        case "oph_gsl_ifft" =>
          graft.functions.expressions.GraftExpressions.dft(a(0),
            inverse = true)
        // unpack a GSL complex cell: every other element
        case "oph_gsl_complex_get_real" =>
          val packed = a(0)
          transform(zeroUntil((size(packed) / 2).cast("int")), k =>
            element_at(packed, k * 2 + 1))
        case "oph_gsl_complex_get_imag" =>
          val packed = a(0)
          transform(zeroUntil((size(packed) / 2).cast("int")), k =>
            element_at(packed, k * 2 + 2))
        // complex modulus/argument over the packed cell
        case "oph_gsl_complex_get_abs" =>
          val packed = a(0)
          transform(zeroUntil((size(packed) / 2).cast("int")), k =>
            sqrt(pow(element_at(packed, k * 2 + 1), 2) +
              pow(element_at(packed, k * 2 + 2), 2)))
        case "oph_gsl_complex_get_arg" =>
          val packed = a(0)
          transform(zeroUntil((size(packed) / 2).cast("int")), k =>
            atan2(element_at(packed, k * 2 + 2),
              element_at(packed, k * 2 + 1)))
        // GSL aliases for reductions already in the surface
        case "oph_gsl_sd" => CubeOps.reduceExpr(a(0), "std")
        case "oph_gsl_quantile" =>
          CubeOps.reduceExpr(a(0), "quantile", num(1))
        case "oph_gsl_boxplot" => compile(Call("oph_boxplot", args), measure)
        case other =>
          throw new IllegalArgumentException(s"unknown primitive '$other'")
      }
  }

  /** Positions [0, n) as a column, EMPTY when n = 0 (sequence(0, -1)
    * would yield a descending garbage pair — same guard as indicesOf). */
  private def zeroUntil(n: Column): Column =
    slice(sequence(lit(0), greatest(n - 1, lit(0))), lit(1), n)

  /** Position vector [from, from+n) that is EMPTY for an empty cell:
    * Spark's sequence(1, 0) yields the DESCENDING [1, 0] — two garbage
    * positions — so index-generating primitives must not feed size-1
    * into sequence directly. slice keeps the whole expression a plain
    * codegen'd HOF chain (a CaseWhen guard around the primitive would
    * knock the enclosing projection out of whole-stage codegen). */
  private def indicesOf(arr: Column, from: Int): Column =
    slice(sequence(lit(from), greatest(size(arr) + (from - 1), lit(from))),
      lit(1), size(arr))

  /** One-shot: compile a query string against a measure column. */
  def apply(query: String, measure: Column): Column =
    compile(parse(query), measure)
}
