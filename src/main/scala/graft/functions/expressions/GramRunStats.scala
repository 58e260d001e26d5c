package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Gopher/MassiveText repetition signals (Rae et al. 2021
 * §A1.1): for each requested n-gram size, the character fraction
 * covered by the single most frequent word n-gram (`top{n}`) and by
 * all n-grams occurring more than once (`dup{n}`), over every n-gram
 * occurrence's characters.
 *
 * Replaces `TextAnalysis.gramRunStats`'s interpreted
 * sort-then-run-length `aggregate` HOF: the fold allocated a 5-field
 * struct per gram and array_sort paid O(g log g) string comparisons,
 * ~2.4 CPU-ms per document at three n sizes. Here each n is one tight
 * hashed pass — counts per distinct gram come from a HashMap (runs in
 * a sorted array and buckets in a map count the same thing), and all
 * `ns` share one pass over the token array. Same equality classes and
 * identical arithmetic as the HOF, which stays in the test tree as the
 * parity oracle (CorpusOpsSpec property tests).
 *
 * Parity notes, pinned by the oracle rows (`text_repetition`,
 * `corpus_gopher_filter`):
 *  - gram text = `array_join(slice(t, i, n), ' ')` — null tokens are
 *    skipped without doubling the separator, which is exactly
 *    `UTF8String.concatWs`;
 *  - `length(x)` counts CHARACTERS, not bytes (`numChars`);
 *  - rounding is the explicit floor-half-up form
 *    `floor(v * 10000 + 0.5) / 10000` the HOF used for cross-engine
 *    .xxxx5 parity with DuckDB;
 *  - fewer than n tokens -> zero grams -> (0.0, 0.0).
 */
case class GramRunStats(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram sizes: $ns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_run_stats expects array<string>, got $other")
  }
  override def dataType: DataType = StructType(ns.flatMap(n => Seq(
    StructField(s"top$n", DoubleType, nullable = false),
    StructField(s"dup$n", DoubleType, nullable = false))))
  override def prettyName: String = "graft_gram_run_stats"

  @transient private lazy val nsArr: Array[Int] = ns.toArray

  override def nullSafeEval(input: Any): Any =
    GramRunStats.compute(input.asInstanceOf[ArrayData], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", nsArr, "int[]")
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.expressions.GramRunStats.compute($arr, $nsRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GramRunStats =
    copy(child = newChild)
}

object GramRunStats {
  private val SPACE = UTF8String.fromString(" ")

  /** (top, dup) per n, flattened in ns order into one row of doubles. */
  def compute(tokens: ArrayData, ns: Array[Int]): InternalRow = {
    val m = tokens.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) toks(i) = tokens.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](ns.length * 2)
    var k = 0
    while (k < ns.length) {
      val n = ns(k)
      var top = 0.0
      var dup = 0.0
      if (m >= n) {
        // gram -> {count, charLen}; sizing for the worst case (all
        // grams distinct) keeps the map rehash-free
        val counts =
          new java.util.HashMap[UTF8String, Array[Long]]((m - n + 1) * 2)
        val window = new Array[UTF8String](n)
        var s = 0
        while (s <= m - n) {
          var j = 0
          while (j < n) { window(j) = toks(s + j); j += 1 }
          val gram = UTF8String.concatWs(SPACE, window: _*)
          val slot = counts.get(gram)
          if (slot == null)
            counts.put(gram, Array(1L, gram.numChars().toLong))
          else slot(0) += 1L
          s += 1
        }
        var best = 0L
        var dupChars = 0L
        var tot = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val slot = it.next()
          val mass = slot(0) * slot(1)
          tot += mass
          if (mass > best) best = mass
          if (slot(0) >= 2L) dupChars += mass
        }
        if (tot > 0L) {
          top = math.floor(best.toDouble / tot * 10000.0 + 0.5) / 10000.0
          dup = math.floor(dupChars.toDouble / tot * 10000.0 + 0.5) / 10000.0
        }
      }
      out(k * 2) = top
      out(k * 2 + 1) = dup
      k += 1
    }
    new GenericInternalRow(out)
  }

  /** Column helper: struct(top{n} double, dup{n} double for n in ns). */
  def gram_run_stats(tokens: Column, ns: Seq[Int]): Column =
    ColumnBridge.column(GramRunStats(ColumnBridge.expression(tokens), ns))
}
