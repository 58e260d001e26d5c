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
    else if (t.nonEmpty && (t.head.isDigit || t.head == '-' || t.head == '.')) {
      val (num, rest) = t.span(c => c.isDigit || c == '.' || c == '-' || c == 'e' || c == 'E')
      (Num(num.toDouble), rest)
    } else {
      val (name, afterName) = t.span(c => c.isLetterOrDigit || c == '_')
      if (name.isEmpty || !afterName.startsWith("("))
        throw new IllegalArgumentException(s"expected primitive call at: '$t'")
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
    case Call(name, args) =>
      def a(i: Int): Column = compile(args(i), measure)
      def num(i: Int): Double = args(i) match {
        case Num(v) => v
        case other  => throw new IllegalArgumentException(
          s"$name: argument ${i + 1} must be a literal number, got $other")
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
        // returned GSL-packed as [re0, im0, re1, im1, ...]. The O(n^2)
        // direct form stays entirely inside codegen'd HOFs — in-cell
        // arrays are short (a time series per cell), so n^2 tiny
        // in-register passes beat shipping cells to any native FFT
        case "oph_gsl_fft" =>
          val arr = a(0)
          val n = size(arr)
          flatten(transform(indicesOf(arr, 0), k => {
            def term(trig: Column => Column): Column =
              aggregate(sequence(lit(0), n - 1), lit(0.0), (acc, j) =>
                acc + element_at(arr, j.cast("int") + 1) *
                  trig(lit(-2.0 * math.Pi) * k.cast("double") *
                    j.cast("double") / n.cast("double")))
            array(term(cos), term(sin))
          }))
        // GSL aliases for reductions already in the surface
        case "oph_gsl_sd" => CubeOps.reduceExpr(a(0), "std")
        case "oph_gsl_quantile" =>
          CubeOps.reduceExpr(a(0), "quantile", num(1))
        case "oph_gsl_boxplot" => compile(Call("oph_boxplot", args), measure)
        case other =>
          throw new IllegalArgumentException(s"unknown primitive '$other'")
      }
  }

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
