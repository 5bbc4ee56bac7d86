package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp polynomial rolling hash of a string column — the
  * document-fingerprinting primitive (hash(s) = Σ s[i]·B^(n-1-i) mod M
  * over the UTF-8 bytes). Deterministic, order-sensitive, and cheap to
  * maintain incrementally over a sliding window — the building block a
  * content-defined-chunking dedup stage would use at 100 TB.
  *
  * Implemented as a native codegen'd `UnaryExpression`: one pass over
  * the bytes, no allocation.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * RollingHash.Base + (bytes(i) & 0xff)) % RollingHash.Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Public constants so windowed variants can roll incrementally:
    * remove a leading byte with h - b·B^(w-1), append with h·B + b.
    * Mod fits so h·B + 255 stays inside a signed 64-bit long; for
    * collision-critical dedup, run two RollingHash instances with
    * distinct (Base, Mod) pairs and pair the results. */
  val Base = 131L
  val Mod = 1000000007L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}
