package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Bpe

/**
 * Distributed BPE encoding: apply a learned merge table
 * (`Bpe.BpeTable`) to an array<string> of words, yielding the
 * flattened array<string> of subword tokens.
 *
 * The merge table rides into generated code as ONE constant reference
 * object (`ctx.addReferenceObj`, the same shipping pattern as
 * `RhpSig`/`ArgmaxDot`), and `doGenCode` emits a single static call —
 * the iterative merge loop is genuinely data-dependent control flow,
 * so inlining its source into generated Java would only bloat the
 * method past the JIT inline budget; a static call keeps the row in
 * whole-stage codegen with zero per-row boxing beyond the output
 * array.
 *
 * Null array -> null; null elements and empty-string words contribute
 * no tokens (the tokenizer emits [""] for blank text — blank docs
 * encode to an empty token array, matching `tokenCount`'s blank=0
 * contract).
 */
case class BpeEncodeWords(child: Expression, table: Bpe.BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects array<string>, got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(ws: Any): Any =
    BpeEncodeWords.encode(ws.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, ws =>
      s"${ev.value} = graft.functions.expressions.BpeEncodeWords.encode($ws, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeWords = copy(child = newChild)
}

object BpeEncodeWords {

  /** Static codegen entry: encode every word, flatten the tokens. */
  def encode(words: ArrayData, table: Bpe.BpeTable): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val toks = table.encodeWord(words.getUTF8String(i).toString)
        var j = 0
        while (j < toks.length) {
          out.add(UTF8String.fromString(toks(j)))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** Column wrapper: tokens of `words` under the learned `merges`. */
  def bpe_encode(words: Column, merges: Array[Bpe.Merge]): Column =
    bpe_encode(words, new Bpe.BpeTable(merges))

  /** As above with an explicit table (byte-level / end-of-word
    * variants share the expression). */
  def bpe_encode(words: Column, table: Bpe.BpeTable): Column =
    ColumnBridge.column(BpeEncodeWords(
      ColumnBridge.expression(words.cast("array<string>")), table))
}

/**
 * Inverse of [[BpeEncodeWords]] for boundary-aware tables: fold a flat
 * token array back into the original whitespace-joined document
 * (end-of-word markers close words, byte-level symbols map back to
 * their UTF-8 bytes). The lossless-roundtrip oracle rows hash
 * decode(encode(text)) against the normalized source text, which only
 * proves anything because this runs the REAL decoder, not string
 * surgery in the query.
 */
case class BpeDecodeTokens(child: Expression, table: Bpe.BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode expects array<string>, got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_decode"

  override def nullSafeEval(ts: Any): Any =
    BpeDecodeTokens.decode(ts.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, ts =>
      s"${ev.value} = graft.functions.expressions.BpeDecodeTokens.decode($ts, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeDecodeTokens = copy(child = newChild)
}

object BpeDecodeTokens {

  /** Static codegen entry: decode the token array to the document. */
  def decode(tokens: ArrayData, table: Bpe.BpeTable): UTF8String = {
    val n = tokens.numElements()
    val it = new Iterator[String] {
      private var i = 0
      def hasNext: Boolean = i < n
      def next(): String = {
        val s = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
        i += 1
        s
      }
    }
    UTF8String.fromString(table.decode(it))
  }

  /** Column wrapper: document text from `tokens` under `table`. */
  def bpe_decode(tokens: Column, table: Bpe.BpeTable): Column =
    ColumnBridge.column(BpeDecodeTokens(
      ColumnBridge.expression(tokens.cast("array<string>")), table))
}
