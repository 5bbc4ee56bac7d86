package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text normalization kernel — the hot prefix of EVERY
  * text-pipeline operator ([[graft.text.TextAnalysis.normalized]]):
  * replace each maximal run of characters outside [a-z0-9] with one
  * space and trim the ends.
  *
  * Semantically identical to
  * `trim(regexp_replace(regexp_replace(x, "[^a-z0-9]+", " "), " +", " "))`
  * for any input: the first regex maps maximal non-alnum runs to one
  * space each (two spaces can never become adjacent, so the second
  * pass only matters for inputs it already leaves unchanged), and trim
  * strips the boundary spaces. The regex form pays two
  * UTF8String→String conversions and two NFA passes per row; this is
  * one branch-per-byte loop over the UTF-8 bytes with no conversion —
  * byte-level is safe because every byte of a multi-byte UTF-8
  * sequence has the high bit set, so a non-ASCII code point is a run
  * of non-alnum bytes and collapses to the same single space the
  * char-level regex produces.
  *
  * The caller lowercases FIRST (`lower` keeps full Unicode semantics);
  * this kernel treats 'A'-'Z' like any other non-[a-z0-9] byte,
  * exactly as the regex does.
  */
case class CollapseNonAlnum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"collapse_non_alnum expects a string input, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "collapse_non_alnum"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    UTF8String.fromBytes(CollapseNonAlnum.collapse(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromBytes(" +
        s"graft.functions.CollapseNonAlnum.collapse($c.getBytes()))")

  override protected def withNewChildInternal(newChild: Expression): CollapseNonAlnum =
    copy(child = newChild)
}

object CollapseNonAlnum {
  /** One pass: emit [a-z0-9] bytes, fold everything else (including
    * every byte of a multi-byte sequence) into a single separating
    * space, never at the start or end. Output length <= input length. */
  def collapse(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](in.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b; o += 1
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    if (o == in.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(CollapseNonAlnum(GraftBridge.expression(c)))
}
