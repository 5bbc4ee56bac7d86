package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fused scaled-integer squared Euclidean distance — the hot
  * inner loop of the label-kNN mislabel audit ([[graft.similarity.Ann]]).
  *
  * Semantically identical to the composed form
  * `aggregate(zip_with(q(a), q(b), (x,y)=>(x-y)*(x-y)), 0L, +)` with
  * `q = transform(v, x => floor(x.cast(double) * 1e6).cast(long))`:
  * per-element quantization is `(long) floor(x * 1e6)` and the
  * accumulation is exact long arithmetic, so results stay
  * order-independent integers, bit-exact across engines.
  *
  * The composed form pays interpreted `ZipWith.eval`/`ArrayAggregate
  * .eval` per PAIR (higher-order functions have no codegen) plus two
  * ArrayData allocations; at corpus×probe pair counts that dominated a
  * 10× scale run by minutes on one core. This expression is one fused
  * allocation-free loop with `doGenCode`, inside whole-stage codegen.
  *
  * Empty arrays → 0 (the fold's seed, matching the composed form);
  * length mismatch or null element → null. Two LONG arrays are
  * accepted as ALREADY-quantized grids (used verbatim, no 1e6
  * multiply) — the k-means `qv` form; mixing long with float/double
  * is rejected (the scales would be incomparable).
  */
case class QuantizedSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _))
        if Seq(l, r).forall(t => Seq[DataType](FloatType, DoubleType).contains(t)) =>
      TypeCheckResult.TypeCheckSuccess
    // both-long form: inputs are ALREADY on an integer grid (e.g. the
    // k-means qv arrays) — used verbatim, no 1e6 quantization
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"quantized_sq_dist expects float/double array inputs (or two pre-quantized long arrays), got $l / $r")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_sq_dist"

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  private def quantized(arr: ArrayData, i: Int, t: DataType): Long = t match {
    case FloatType => math.floor(arr.getFloat(i).toDouble * 1000000.0).toLong
    case DoubleType => math.floor(arr.getDouble(i) * 1000000.0).toLong
    case LongType => arr.getLong(i)
    case _ => throw new IllegalArgumentException(s"unsupported element type $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val qx = quantized(x, i, leftElem)
      val qy = quantized(y, i, rightElem)
      val d = qx - qy
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def quantizedGen(arr: String, i: String, t: DataType): String = t match {
      case FloatType =>
        s"(long) java.lang.Math.floor((double) $arr.getFloat($i) * 1000000.0)"
      case DoubleType =>
        s"(long) java.lang.Math.floor($arr.getDouble($i) * 1000000.0)"
      case LongType => s"$arr.getLong($i)"
      case _ => throw new IllegalArgumentException(s"unsupported element type $t")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $qx = ${quantizedGen(a, i, leftElem)};
         |    long $qy = ${quantizedGen(b, i, rightElem)};
         |    long $d = $qx - $qy;
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedSqDist =
    copy(left = newLeft, right = newRight)
}

object QuantizedSqDist {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(QuantizedSqDist(GraftBridge.expression(a), GraftBridge.expression(b)))
}
