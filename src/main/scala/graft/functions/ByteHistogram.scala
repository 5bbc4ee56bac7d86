package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native byte-value histogram of a binary column: 256 long counts,
  * one pass, codegen'd.
  *
  * This is the codec-free core of multimodal feature extraction
  * ([[graft.multimodal.Multimodal.byteFeatures]]): byte distributions
  * give content-type signals, printable ratios, entropy proxies, and
  * binary near-dup features without decoding the payload — the part of
  * an image/audio pipeline that needs no image/audio library. The
  * HOF alternative (`transform(sequence(...), i -> ascii(substr(...)))`)
  * is interpreted per element; this is one fused loop per row.
  *
  * Empty input → 256 zeros (not null); null input → null.
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects a binary input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xff) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, b => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      s"""
         |long[] $cnt = new long[256];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $cnt[$b[$i] & 0xff]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cnt);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(ByteHistogram(GraftBridge.expression(c)))
}
