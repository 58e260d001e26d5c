package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot in-array paths — the cases
 * where higher-order functions (which Spark evaluates interpreted)
 * genuinely can't reach codegen speed:
 *
 *  - `MovingAvg`: fused trailing-window mean over an array in one O(n)
 *    ring pass (the HOF formulation is O(n*k) slice+aggregate per
 *    element, all interpreted). The reference ships this as the
 *    `oph_moving_avg` array primitive
 *    (`/root/reference/src/oph_json/oph_json_objkeys.h:103` context).
 *  - `PolyHash`: polynomial rolling hash over a string's characters,
 *    mod a prime (document fingerprinting); the builtin-function
 *    formulation needs split-to-char-array + aggregate, allocating one
 *    single-char string per character.
 *
 * Both implement `doGenCode`, so they fuse into whole-stage codegen
 * instead of forcing an interpreted eval boundary in the hot path.
 */
object GraftExpressions {

  /** Trailing moving average (window k, partial leading windows) over
    * an array<double> column. */
  def moving_avg(arr: Column, k: Int): Column =
    ColumnBridge.column(MovingAvg(
      ColumnBridge.expression(arr.cast("array<double>")), k))

  /** Polynomial rolling hash: h = (h*31 + char) mod 1e9+7. */
  def poly_hash(s: Column): Column =
    ColumnBridge.column(PolyHash(
      ColumnBridge.expression(s.cast("string"))))

  /** Fused one-pass cosine similarity of two numeric array columns
    * (cast to array<double>; float widening is exact). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Random-hyperplane sign bits (array<int> of 0/1) in ONE fused
    * codegen loop over all planes — the HOF formulation pays nBits
    * interpreted `aggregate(zip_with(...))` passes per row, which
    * dominates every LSH/banding pipeline at scale. The plane table
    * ships as a constant reference object, not literals, so the
    * generated code stays tiny at any nBits x dim. */
  def rhp_sig(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(RhpSig(
      ColumnBridge.expression(vec.cast("array<double>")), planes))

  /** Matrix-free sign random projection to `outDim` dims in ONE fused
    * codegen loop: y[k] = Σ_j v[j]·s(j,k) / √outDim with s derived
    * per element from the 3-round quadratic mixer mod 2^31−1 (see
    * [[graft.pipeline.Similarity.randomProject]]). No sign table is
    * stored or shipped — the generated code re-derives each sign in
    * ~9 integer ops. The HOF formulation pays outDim interpreted
    * `aggregate(zip_with(...))` passes per row (measured ~0.8 ms/row
    * at 64→8: the whole sweep cell was the interpreter, not the
    * arithmetic). Null-poisoning parity with the HOF: any null
    * element yields all-null outputs. */
  def sign_project(vec: Column, outDim: Int, seed: Long): Column =
    ColumnBridge.column(SignProject(
      ColumnBridge.expression(vec.cast("array<double>")), outDim, seed))

  /** Index of the table row with the greatest dot product against the
    * vector — the k-means/IVF cell-assignment inner loop, fused into
    * one codegen pass (the HOF formulation evaluates k interpreted
    * aggregate(zip_with) dots per row). The table rides as a constant
    * reference object. */
  def argmax_dot(vec: Column, table: Array[Array[Double]]): Column =
    ColumnBridge.column(ArgmaxDot(
      ColumnBridge.expression(vec.cast("array<double>")), table))

  /** L2-normalize an array<double> in ONE fused native pass — the
    * codegen replacement for the `when(norm > 0, transform(vec, x =>
    * x / norm))` HOF pair, whose interpreted aggregate+transform cost
    * ~32 s per full corpus scan at the 100x replica (the dominant
    * phase of every IVF build; VERDICT r17 #4). Mirrors the HOF's
    * contract exactly: null input -> null; a null element or an
    * exactly-zero norm passes the input through unchanged; a NaN norm
    * divides (Spark's NaN-largest ordering makes `when(norm > 0)`
    * TRUE for NaN). */
  def normalize_vec(vec: Column): Column =
    ColumnBridge.column(NormalizeVec(ColumnBridge.expression(vec)))

  /** Maximum dot product of the L2-NORMALIZED input vector against
    * the (pre-normalized) table rows, fused into ONE codegen pass —
    * the semantic-decontamination inner loop. The HOF formulation
    * costs four interpreted passes per row (aggregate x*x norm,
    * transform divide, zip_with multiply, aggregate sum — ~66 s for
    * 200k x 64-dim x 20 rows at the 100x replica); the fused loop is
    * bit-identical to it: the norm accumulates left-to-right, each
    * element divides by the same sqrt, each dot accumulates
    * left-to-right, and a NaN dot wins immediately (the HOF recovery
    * returns the NaN of ArgmaxDot's first-NaN row). Zero-norm (or
    * NaN-norm) vectors dot unnormalized, like `when(norm > 0, ...)
    * .otherwise(vec)`. */
  def max_dot_norm(vec: Column, table: Array[Array[Double]]): Column =
    ColumnBridge.column(MaxDotNorm(
      ColumnBridge.expression(vec.cast("array<double>")), table))

  /** Product-quantization codes: per subspace j, the index of the
    * codebook row minimizing ||sub_j(vec) - codeword||^2, computed as
    * argmin of (|c|^2 - 2<s,c>) in one fused pass over all m x nCodes
    * codewords (|s|^2 is constant per row and cannot change the
    * argmin — the same algebra the HOF formulation used, interpreted,
    * per codeword). */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(vec.cast("array<double>")), codebooks))

  /** Cumulative scan (sum/max/min/mul) over an array<double> column in
    * one O(n) pass — the HOF formulation is O(n^2) (per-element slice
    * + aggregate, or array-accumulator concat copying). */
  def cum_op(arr: Column, op: String): Column =
    ColumnBridge.column(CumOp(
      ColumnBridge.expression(arr.cast("array<double>")), op))

  /** Direct DFT over an array<double> cell, GSL-packed output
    * [re0, im0, re1, im1, ...]. forward: n reals in; inverse: 2n
    * packed in. Still O(n^2) per cell (in-cell series are short) but
    * in compiled double loops instead of interpreted HOF chains. */
  def dft(arr: Column, inverse: Boolean): Column =
    ColumnBridge.column(Dft(
      ColumnBridge.expression(arr.cast("array<double>")), inverse))

  /** Full-pyramid discrete wavelet transform of the real cell
    * (periodic boundary, power-of-two length; haar / db4 — the
    * reference's oph_gsl_dwt surface). */
  def dwt(arr: Column, family: String): Column =
    ColumnBridge.column(Dwt(
      ColumnBridge.expression(arr.cast("array<double>")), family))

  /** Pearson correlation of two array<double> cells in ONE fused pass
    * (the HOF formulation runs five interpreted aggregates per cell).
    * Null when either variance term is <= 0 — same contract as the
    * intercube corr mode it backs. */
  def corr_arrays(x: Column, y: Column): Column =
    ColumnBridge.column(CorrArrays(
      ColumnBridge.expression(x.cast("array<double>")),
      ColumnBridge.expression(y.cast("array<double>"))))

  /** GSL-style uniform histogram (upper bound exclusive, out-of-range
    * ignored) in one O(n) pass — the HOF form filters the cell once
    * per bin. */
  def histogram(arr: Column, nbins: Int, lo: Double, hi: Double): Column =
    ColumnBridge.column(HistogramBins(
      ColumnBridge.expression(arr.cast("array<double>")), nbins, lo, hi))
}

/** Single-pass uniform binning [lo + i*w, lo + (i+1)*w), w = (hi-lo)/n.
  * Bin index arithmetic mirrors the HOF per-bin bounds exactly: a
  * value lands in bin i iff lo + i*w <= x < lo + (i+1)*w, checked
  * AGAINST THE BOUNDS (not via division) so edge doubles bin the same
  * way the reference HOF did. */
case class HistogramBins(child: Expression, nbins: Int, lo: Double, hi: Double)
    extends UnaryExpression {
  require(nbins >= 1, s"histogram needs >= 1 bin, got $nbins")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"histogram expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_histogram"

  private def width: Double = (hi - lo) / nbins

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](nbins)
    val w = width
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val x = arr.getDouble(i)
      if (x >= lo && x < lo + nbins * w) {
        var b = ((x - lo) / w).toInt
        if (b >= nbins) b = nbins - 1
        // division can land one off the HOF's bound arithmetic on
        // edge doubles: nudge to the bin whose bounds contain x
        while (b > 0 && x < lo + b * w) b -= 1
        while (b < nbins - 1 && x >= lo + (b + 1) * w) b += 1
        if (x >= lo + b * w && x < lo + (b + 1) * w) out(b) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      s"""
        final int $n = $arr.numElements();
        final long[] $out = new long[$nbins];
        final double $w = ${width}D;
        for (int $i = 0; $i < $n; $i++) {
          final double $x = $arr.getDouble($i);
          if ($x >= ${lo}D && $x < ${lo}D + $nbins * $w) {
            int $b = (int) (($x - ${lo}D) / $w);
            if ($b >= $nbins) $b = $nbins - 1;
            while ($b > 0 && $x < ${lo}D + $b * $w) $b--;
            while ($b < $nbins - 1 && $x >= ${lo}D + ($b + 1) * $w) $b++;
            if ($x >= ${lo}D + $b * $w && $x < ${lo}D + ($b + 1) * $w)
              $out[$b]++;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HistogramBins =
    copy(child = newChild)
}

/** One-pass Pearson correlation over paired cells; pairs up to the
  * shorter cell (zip_with semantics would null-pad — the engine only
  * feeds equal-length cells). */
/** Cosine similarity of two array&lt;double&gt; in ONE fused pass: dot
  * product and both norms accumulate in the same loop with zero
  * intermediate arrays. The HOF formulation (`aggregate(zip_with(...))`
  * three times over) materializes three zipped arrays per row pair —
  * on the ANN rerank paths that is the inner loop over every candidate.
  * Length-mismatched inputs return null (`zip_with` null-pads, which
  * nulls the HOF dot — same observable result); a zero norm yields NaN
  * where the composed form's division THROWS under ANSI mode — the
  * native expression is total. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_sim"

  override def nullSafeEval(xs: Any, ys: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val y = ys.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val a = x.getDouble(i); val b = y.getDouble(i)
        dot += a * b; nx += a * a; ny += b * b
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      s"""
        if ($xs.numElements() != $ys.numElements()) { ${ev.isNull} = true; }
        else {
          final int $n = $xs.numElements();
          double $dot = 0.0, $nx = 0.0, $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $a = $xs.getDouble($i);
            final double $b = $ys.getDouble($i);
            $dot += $a * $b; $nx += $a * $a; $ny += $b * $b;
          }
          ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Sign bits of <vec, plane_j> for a fixed plane table, all planes in
  * one fused pass. Parity contract with the HOF formulation
  * ([[graft.pipeline.Similarity.rhpSignatureHof]]): both sides
  * truncate to min(|vec|, |plane|), a null element WITHIN that read
  * prefix null-poisons every dot (all bits 0; a null in the unread
  * tail of a longer vector does not), and a zero dot yields bit 0. */
case class RhpSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rhp_sig expects array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_rhp_sig"

  private val sigDim = planes.map(_.length).maxOption.getOrElse(0)

  override def nullSafeEval(xs: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val nb = planes.length
    val out = new Array[Int](nb)
    val n = x.numElements()
    // HOF parity: only the first min(|vec|, dim) elements are ever
    // read, so a null in the TAIL of a longer vector must not poison
    // the signature
    val scan = math.min(n, sigDim)
    var hasNull = false
    var i = 0
    while (i < scan && !hasNull) {
      if (x.isNullAt(i)) hasNull = true
      i += 1
    }
    if (!hasNull) {
      var j = 0
      while (j < nb) {
        val p = planes(j)
        val d = math.min(n, p.length)
        var acc = 0.0
        var k = 0
        while (k < d) { acc += x.getDouble(k) * p(k); k += 1 }
        out(j) = if (acc > 0) 1 else 0
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rhpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val nb = ctx.freshName("nb")
      val hasNull = ctx.freshName("hasNull")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
        final int $n = $xs.numElements();
        boolean $hasNull = false;
        for (int $i = 0; $i < Math.min($n, $sigDim) && !$hasNull; $i++)
          if ($xs.isNullAt($i)) $hasNull = true;
        final int $nb = $planesRef.length;
        final int[] $out = new int[$nb];
        if (!$hasNull) {
          for (int $j = 0; $j < $nb; $j++) {
            final double[] $p = $planesRef[$j];
            final int $d = Math.min($n, $p.length);
            double $acc = 0.0;
            for (int $k = 0; $k < $d; $k++)
              $acc += $xs.getDouble($k) * $p[$k];
            $out[$j] = $acc > 0 ? 1 : 0;
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): RhpSig = copy(child = newChild)
}

/** Sign (Rademacher) random projection: out[k] = Σ_j v[j]·s(j,k)/√K,
  * signs re-derived per element from the 3-round quadratic mixer mod
  * P = 2^31−1 (x² + Ax + B; a chain of LCG rounds stays affine and
  * its parity runs wreck the JL guarantee — see Similarity). Exact
  * fold-order parity with the HOF formulation: j ascends, divide
  * last. A null element null-poisons every output (the HOF's
  * zip_with/aggregate contract). */
case class SignProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_project expects array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_sign_project"

  override def nullSafeEval(xs: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val n = x.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (x.isNullAt(i)) hasNull = true; i += 1 }
    if (hasNull) {
      new GenericArrayData(Array.fill[Any](outDim)(null))
    } else {
      val out = new Array[Double](outDim)
      val scale = math.sqrt(outDim.toDouble)
      var k = 0
      while (k < outDim) {
        var acc = 0.0
        var j = 0
        while (j < n) {
          // floorMod, not %: a negative seed makes the first residue
          // negative under signed remainder and the sign stream
          // diverges from the HOF oracle's pmod
          var h = Math.floorMod(j.toLong * outDim + k + seed,
            2147483647L)
          var r = 0
          while (r < 3) {
            h = (h * h + h * 1103515245L + 12345L) % 2147483647L
            r += 1
          }
          val s = if (((h >> 13) & 1L) == 0L) 1.0 else -1.0
          acc += x.getDouble(j) * s
          j += 1
        }
        out(k) = acc / scale
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val hasNull = ctx.freshName("hasNull")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val nulls = ctx.freshName("nulls")
      val scale = ctx.freshName("scale")
      s"""
        final int $n = $xs.numElements();
        boolean $hasNull = false;
        for (int $i = 0; $i < $n && !$hasNull; $i++)
          if ($xs.isNullAt($i)) $hasNull = true;
        if ($hasNull) {
          final Object[] $nulls = new Object[$outDim];
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($nulls);
        } else {
          final double[] $out = new double[$outDim];
          final double $scale = Math.sqrt((double) $outDim);
          for (int $k = 0; $k < $outDim; $k++) {
            double $acc = 0.0;
            for (int $j = 0; $j < $n; $j++) {
              long $h = Math.floorMod((long) $j * $outDim + $k + ${seed}L,
                2147483647L);
              for (int $r = 0; $r < 3; $r++)
                $h = ($h * $h + $h * 1103515245L + 12345L) % 2147483647L;
              $acc += $xs.getDouble($j) * ((($h >> 13) & 1L) == 0L ? 1.0 : -1.0);
            }
            $out[$k] = $acc / $scale;
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignProject = copy(child = newChild)
}

/** argmax_j <vec, table_j> with exact HOF-parity semantics
  * ([[graft.pipeline.Similarity]] coarse assignment): ties keep the
  * FIRST maximum, a NaN dot wins immediately (Spark's double ordering
  * ranks NaN greatest and array_position matches it), and a vector
  * whose length differs from the table rows' — or that carries a null
  * element — yields null, exactly as zip_with's null padding
  * null-poisons every HOF dot. */
case class ArgmaxDot(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"argmax_dot expects array<double>, got $other")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_dot"

  private val dim = if (table.nonEmpty) table(0).length else 0

  override def nullSafeEval(xs: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim || table.isEmpty) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bestVal = Double.NegativeInfinity
    var j = 0
    var done = false
    while (j < table.length && !done) {
      val row = table(j)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += x.getDouble(k) * row(k); k += 1 }
      if (java.lang.Double.isNaN(acc)) { best = j; done = true }
      else if (acc > bestVal) { bestVal = acc; best = j }
      j += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("argmaxTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestVal = ctx.freshName("bestVal")
      val done = ctx.freshName("done")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $xs.numElements();
        boolean $bad = ($tableRef.length == 0) ||
          ($n != ($tableRef.length == 0 ? 0 : $tableRef[0].length));
        for (int $i = 0; $i < $n && !$bad; $i++)
          if ($xs.isNullAt($i)) $bad = true;
        if ($bad) { ${ev.isNull} = true; }
        else {
          int $best = 0;
          double $bestVal = Double.NEGATIVE_INFINITY;
          boolean $done = false;
          for (int $j = 0; $j < $tableRef.length && !$done; $j++) {
            final double[] $row = $tableRef[$j];
            double $acc = 0.0;
            for (int $k = 0; $k < $n; $k++)
              $acc += $xs.getDouble($k) * $row[$k];
            if (Double.isNaN($acc)) { $best = $j; $done = true; }
            else if ($acc > $bestVal) { $bestVal = $acc; $best = $j; }
          }
          ${ev.value} = $best;
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgmaxDot = copy(child = newChild)
}

/** Max dot of the L2-normalized input against pre-normalized table
  * rows in one fused pass (see GraftExpressions.max_dot_norm for the
  * parity contract with the HOF formulation). The per-row division
  * x_k/norm is recomputed inside each dot instead of materializing a
  * normalized temp array — identical doubles (division is
  * deterministic), zero per-row allocation. */
case class MaxDotNorm(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"max_dot_norm expects array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_max_dot_norm"

  private val dim = if (table.nonEmpty) table(0).length else 0

  override def nullSafeEval(xs: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim || table.isEmpty) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var sq = 0.0
    i = 0
    while (i < n) { val v = x.getDouble(i); sq += v * v; i += 1 }
    val nrm = math.sqrt(sq)
    val doNorm = nrm > 0 // NaN > 0 is false: NaN norms pass through
    var bestVal = Double.NegativeInfinity
    var j = 0
    while (j < table.length) {
      val row = table(j)
      var acc = 0.0
      var k = 0
      while (k < n) {
        val v = x.getDouble(k)
        acc += (if (doNorm) v / nrm else v) * row(k)
        k += 1
      }
      if (java.lang.Double.isNaN(acc))
        return java.lang.Double.valueOf(acc) // NaN row wins, like ArgmaxDot
      if (acc > bestVal) bestVal = acc
      j += 1
    }
    java.lang.Double.valueOf(bestVal)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("maxdotTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val sq = ctx.freshName("sq")
      val nrm = ctx.freshName("nrm")
      val doNorm = ctx.freshName("doNorm")
      val bestVal = ctx.freshName("bestVal")
      val done = ctx.freshName("done")
      val bad = ctx.freshName("bad")
      val v = ctx.freshName("v")
      s"""
        final int $n = $xs.numElements();
        boolean $bad = ($tableRef.length == 0) ||
          ($n != ($tableRef.length == 0 ? 0 : $tableRef[0].length));
        for (int $i = 0; $i < $n && !$bad; $i++)
          if ($xs.isNullAt($i)) $bad = true;
        if ($bad) { ${ev.isNull} = true; }
        else {
          double $sq = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $v = $xs.getDouble($i);
            $sq += $v * $v;
          }
          final double $nrm = Math.sqrt($sq);
          final boolean $doNorm = $nrm > 0;
          double $bestVal = Double.NEGATIVE_INFINITY;
          boolean $done = false;
          for (int $j = 0; $j < $tableRef.length && !$done; $j++) {
            final double[] $row = $tableRef[$j];
            double $acc = 0.0;
            for (int $k = 0; $k < $n; $k++) {
              final double $v = $xs.getDouble($k);
              $acc += ($doNorm ? $v / $nrm : $v) * $row[$k];
            }
            if (Double.isNaN($acc)) { $bestVal = $acc; $done = true; }
            else if ($acc > $bestVal) { $bestVal = $acc; }
          }
          ${ev.value} = $bestVal;
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MaxDotNorm = copy(child = newChild)
}

/** Per-subspace argmin codes against a fixed m x nCodes x subDim
  * codebook, all subspaces fused in one pass. Distances use the
  * HOF-parity algebra (|c|^2 - 2<s,c>, accumulated left-to-right);
  * first-min ties win and NaN distances are never selected unless all
  * are (matching array_min/array_position double ordering). Malformed
  * input (length != m*subDim, or a null element) yields NULL — the
  * HOF form instead emits per-subspace null codes, but both only
  * occur on inputs the PQ fit's `require` already rejects. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  private val m = codebooks.length
  private val subDim =
    if (m > 0 && codebooks(0).nonEmpty) codebooks(0)(0).length else 0

  override def nullSafeEval(xs: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (m == 0 || subDim == 0 || n != m * subDim) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * subDim
      var best = 0
      var bestVal = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var acc = 0.0
        var k = 0
        while (k < subDim) {
          val cv = cw(k)
          acc += cv * cv - 2.0 * x.getDouble(base + k) * cv
          k += 1
        }
        if (acc < bestVal) { bestVal = acc; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val mv = m; val sd = subDim
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val cb = ctx.freshName("cb")
      val cw = ctx.freshName("cw")
      val cv = ctx.freshName("cv")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestVal = ctx.freshName("bestVal")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      s"""
        final int $n = $xs.numElements();
        boolean $bad = ($n != ${mv * sd}) || ${mv == 0 || sd == 0};
        for (int $i = 0; $i < $n && !$bad; $i++)
          if ($xs.isNullAt($i)) $bad = true;
        if ($bad) { ${ev.isNull} = true; }
        else {
          final int[] $out = new int[$mv];
          for (int $j = 0; $j < $mv; $j++) {
            final double[][] $cb = $cbRef[$j];
            final int $base = $j * $sd;
            int $best = 0;
            double $bestVal = Double.POSITIVE_INFINITY;
            for (int $c = 0; $c < $cb.length; $c++) {
              final double[] $cw = $cb[$c];
              double $acc = 0.0;
              for (int $k = 0; $k < $sd; $k++) {
                final double $cv = $cw[$k];
                $acc += $cv * $cv - 2.0 * $xs.getDouble($base + $k) * $cv;
              }
              if ($acc < $bestVal) { $bestVal = $acc; $best = $c; }
            }
            $out[$j] = $best;
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

case class CorrArrays(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"corr_arrays expects two array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_corr_arrays"

  override def nullSafeEval(xs: Any, ys: Any): Any = {
    val x = xs.asInstanceOf[ArrayData]
    val y = ys.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s1x = 0.0; var s1y = 0.0; var s2x = 0.0; var s2y = 0.0
    var sxy = 0.0
    var i = 0
    while (i < n) {
      val a = x.getDouble(i); val b = y.getDouble(i)
      s1x += a; s1y += b; s2x += a * a; s2y += b * b; sxy += a * b
      i += 1
    }
    val num = n * sxy - s1x * s1y
    val den = math.sqrt(n * s2x - s1x * s1x) * math.sqrt(n * s2y - s1y * s1y)
    if (den > 0) java.lang.Double.valueOf(num / den) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s1x = ctx.freshName("s1x"); val s1y = ctx.freshName("s1y")
      val s2x = ctx.freshName("s2x"); val s2y = ctx.freshName("s2y")
      val sxy = ctx.freshName("sxy")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val num = ctx.freshName("num"); val den = ctx.freshName("den")
      s"""
        final int $n = Math.min($xs.numElements(), $ys.numElements());
        double $s1x = 0.0, $s1y = 0.0, $s2x = 0.0, $s2y = 0.0, $sxy = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $a = $xs.getDouble($i);
          final double $b = $ys.getDouble($i);
          $s1x += $a; $s1y += $b; $s2x += $a * $a; $s2y += $b * $b;
          $sxy += $a * $b;
        }
        final double $num = $n * $sxy - $s1x * $s1y;
        final double $den = Math.sqrt($n * $s2x - $s1x * $s1x)
          * Math.sqrt($n * $s2y - $s1y * $s1y);
        if ($den > 0) { ${ev.value} = $num / $den; }
        else { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CorrArrays =
    copy(left = newLeft, right = newRight)
}

/** Direct discrete Fourier transform, forward (real input -> packed
  * complex) or inverse (packed complex -> packed complex, 1/n scaled).
  * Backs oph_gsl_fft / oph_gsl_ifft. */
case class Dft(child: Expression, inverse: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dft expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = if (inverse) "graft_idft" else "graft_dft"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out =
      if (!inverse) {
        val n = arr.numElements()
        val o = new Array[Double](2 * n)
        var k = 0
        while (k < n) {
          var re = 0.0; var im = 0.0
          var j = 0
          while (j < n) {
            val t = -2.0 * math.Pi * k * j / n
            val x = arr.getDouble(j)
            re += x * math.cos(t); im += x * math.sin(t)
            j += 1
          }
          o(2 * k) = re; o(2 * k + 1) = im
          k += 1
        }
        o
      } else {
        val n = arr.numElements() / 2
        val o = new Array[Double](2 * n)
        var j = 0
        while (j < n) {
          var re = 0.0; var im = 0.0
          var k = 0
          while (k < n) {
            val t = 2.0 * math.Pi * k * j / n
            val xr = arr.getDouble(2 * k); val xi = arr.getDouble(2 * k + 1)
            val c = math.cos(t); val s = math.sin(t)
            re += xr * c - xi * s
            im += xr * s + xi * c
            k += 1
          }
          o(2 * j) = re / n; o(2 * j + 1) = im / n
          j += 1
        }
        o
      }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val re = ctx.freshName("re")
      val im = ctx.freshName("im")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val xr = ctx.freshName("xr")
      val xi = ctx.freshName("xi")
      val c = ctx.freshName("c")
      val sn = ctx.freshName("s")
      val body =
        if (!inverse) s"""
          final int $n = $arr.numElements();
          final double[] $out = new double[2 * $n];
          for (int $k = 0; $k < $n; $k++) {
            double $re = 0.0, $im = 0.0;
            for (int $j = 0; $j < $n; $j++) {
              final double $t = -2.0 * Math.PI * $k * $j / $n;
              final double $x = $arr.getDouble($j);
              $re += $x * Math.cos($t); $im += $x * Math.sin($t);
            }
            $out[2 * $k] = $re; $out[2 * $k + 1] = $im;
          }
        """ else s"""
          final int $n = $arr.numElements() / 2;
          final double[] $out = new double[2 * $n];
          for (int $j = 0; $j < $n; $j++) {
            double $re = 0.0, $im = 0.0;
            for (int $k = 0; $k < $n; $k++) {
              final double $t = 2.0 * Math.PI * $k * $j / $n;
              final double $xr = $arr.getDouble(2 * $k);
              final double $xi = $arr.getDouble(2 * $k + 1);
              final double $c = Math.cos($t), $sn = Math.sin($t);
              $re += $xr * $c - $xi * $sn;
              $im += $xr * $sn + $xi * $c;
            }
            $out[2 * $j] = $re / $n; $out[2 * $j + 1] = $im / $n;
          }
        """
      s"""
        $body
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Dft =
    copy(child = newChild)
}

/** Full-pyramid DWT of a power-of-two array<double> cell. The pyramid
  * has cross-element dependencies no HOF can express, so both eval and
  * codegen delegate to the shared static kernel (graft.functions
  * .Wavelet.forwardChecked) — a static call inside generated code
  * keeps the expression inside whole-stage codegen, exactly like
  * Spark's own StaticInvoke. `family` is validated at construction so
  * a typo fails at plan time, not per row. */
case class Dwt(child: Expression, family: String)
    extends UnaryExpression {
  graft.functions.Wavelet.lowpass(family) // plan-time family check

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dwt expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_dwt"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(
      graft.functions.Wavelet.forwardChecked(arr.toDoubleArray(), family))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val fam = ctx.addReferenceObj("family", family, "java.lang.String")
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.Wavelet.forwardChecked($arr.toDoubleArray(), $fam));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Dwt =
    copy(child = newChild)
}

/** One-pass cumulative scan; `op` fixed at plan time so codegen emits
  * the bare accumulator update. Backs `oph_accumulate`. */
case class CumOp(child: Expression, op: String)
    extends UnaryExpression {
  require(CumOp.ops.contains(op), s"cum_op: unknown op '$op'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cum_op expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = s"graft_cum_$op"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      acc =
        if (i == 0) x
        else op match {
          case "sum" => acc + x
          case "mul" => acc * x
          case "max" => math.max(acc, x)
          case "min" => math.min(acc, x)
        }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val update = op match {
        case "sum" => s"$acc + $x"
        case "mul" => s"$acc * $x"
        case "max" => s"java.lang.Math.max($acc, $x)"
        case "min" => s"java.lang.Math.min($acc, $x)"
      }
      s"""
        final int $n = $arr.numElements();
        final double[] $out = new double[$n];
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $x = $arr.getDouble($i);
          $acc = ($i == 0) ? $x : ($update);
          $out[$i] = $acc;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CumOp =
    copy(child = newChild)
}

object CumOp {
  val ops: Set[String] = Set("sum", "mul", "max", "min")
}

/** One-pass ring-sum moving average; `k >= 1`. Null elements are
  * treated as 0 contribution (upstream casts guarantee doubles). */
case class MovingAvg(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"moving_avg window must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // accept either containsNull variant: SimplifyCasts strips the
    // upcast from array<double, false>, which must stay resolved
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"moving_avg expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_moving_avg"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += arr.getDouble(i)
      if (i >= k) sum -= arr.getDouble(i - k)
      val len = if (i < k) i + 1 else k
      out(i) = sum / len
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val out = ctx.freshName("out")
      val len = ctx.freshName("len")
      s"""
        final int $n = $arr.numElements();
        final double[] $out = new double[$n];
        double $sum = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $sum += $arr.getDouble($i);
          if ($i >= $k) $sum -= $arr.getDouble($i - $k);
          final int $len = ($i < $k) ? ($i + 1) : $k;
          $out[$i] = $sum / $len;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MovingAvg =
    copy(child = newChild)
}

/** h = fold(chars)((h, c) => (h*31 + c) mod 1e9+7) over the string. */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  private val Mod = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i)) % Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        final String $s = $str.toString();
        long $h = 0L;
        for (int $i = 0; $i < $s.length(); $i++) {
          $h = ($h * 31L + $s.charAt($i)) % ${Mod}L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** One-pass L2 normalization (see GraftExpressions.normalize_vec).
  * Semantics pinned to the HOF formulation it replaces
  * (NormalizeVecParitySpec): sum of squares, then divide each element
  * by the root — unless the vector contains a null element (the
  * aggregated norm goes null, the comparison is not true) or the norm
  * is exactly zero, in which case the INPUT array passes through
  * unchanged. A NaN norm DIVIDES: Spark's NaN-largest ordering makes
  * `when(norm > 0)` true for NaN, so the HOF emits all-NaN. */
case class NormalizeVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"normalize_vec expects array<double>, got $other")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_normalize_vec"

  override def nullSafeEval(xs: Any): Any =
    NormalizeVec.compute(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      s"${ev.value} = graft.functions.expressions.NormalizeVec.compute($xs);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeVec = copy(child = newChild)
}

object NormalizeVec {
  def compute(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var sq = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return x // null element -> unchanged
      val v = x.getDouble(i)
      sq += v * v
      i += 1
    }
    val nrm = math.sqrt(sq)
    // SQL `when(norm > 0, ...)` under Spark's NaN-LARGEST ordering:
    // a NaN norm compares TRUE, so the HOF divides (all-NaN output);
    // only an exactly-zero norm falls through unchanged
    if (nrm == 0.0) return x
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}
