package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fused argmin-over-centroids — the k-means assignment inner
  * loop ([[graft.similarity.Clustering]]).
  *
  * Semantically identical to the composed form
  * `array_min(array(struct(dist2_c, c) for c in centroids))` with
  * `dist2_c = aggregate(zip_with(qv, lit(cent_c), (a,b)=>(a-b)*(a-b)), 0L, +)`:
  * exact long arithmetic, ties broken toward the smaller centroid
  * index. The composed form pays k interpreted `ZipWith`/`ArrayAggregate`
  * evals per ROW (higher-order functions have no codegen) plus 2k array
  * allocations; this is one allocation-free doubly-nested loop with
  * `doGenCode` and early abandon (a centroid's partial sum past the
  * current best short-circuits), inside whole-stage codegen.
  *
  * Returns `dist2 * 2^16 + index` packed in one long — the packing is
  * ORDER-PRESERVING for (dist2, index), so the argmin is the plain
  * numeric min. Callers unpack with `>> 16` and `& 0xffff`. Bounds
  * (checked at runtime, null on violation, and enforced at
  * construction for k): k ≤ 2^16 centroids, dist2 < 2^47 — at the
  * engine's default grid (scale 512, unit-ish embeddings) dist2 tops
  * out near 2^32, fifteen bits of headroom.
  *
  * Null array / null element / dimension mismatch → null.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {

  require(centroids.nonEmpty && centroids.size <= (1 << 16),
    s"nearest_centroid supports 1..65536 centroids, got ${centroids.size}")
  require(centroids.forall(_.length == centroids.head.length),
    "all centroids must share one dimensionality")

  private val MaxDist = (Long.MaxValue >> 16)

  /** Per-difference guard: |d| above this makes d*d alone exceed the
    * 2^47 packed-distance budget, so the candidate is already a
    * contract violation — and without the guard d*d (or the running
    * sum) can WRAP int64 negative, sneak past `best > MaxDist`, and
    * return a garbage packed value instead of the documented null.
    * With every |d| <= DGuard, acc <= dim * 2^47 stays far inside
    * int64 for any realistic dim. */
  private val DGuard = 11863283L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects an array<long> input, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  /** Flattened [k][dim] centroid matrix, row-major — one reference
    * object in generated code. */
  @transient private lazy val flat: Array[Long] = centroids.flatten.toArray
  @transient private lazy val dim: Int = centroids.head.length
  @transient private lazy val k: Int = centroids.size

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    var best = Long.MaxValue
    var bestC = -1
    var c = 0
    while (c < k) {
      var acc = 0L
      var j = 0
      val off = c * dim
      while (j < dim && acc < best) {
        val d = v.getLong(j) - flat(off + j)
        if (d > DGuard || d < -DGuard) acc = Long.MaxValue
        else acc += d * d
        j += 1
      }
      if (j == dim && acc < best) { best = acc; bestC = c }
      c += 1
    }
    if (best > MaxDist) null else (best << 16) | bestC.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroids", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    long $best = Long.MAX_VALUE;
         |    int $bestC = -1;
         |    for (int $c = 0; $c < $k; $c++) {
         |      long $acc = 0L;
         |      int $off = $c * $dim;
         |      int $j = 0;
         |      for (; $j < $dim && $acc < $best; $j++) {
         |        long $d = $v.getLong($j) - $flatRef[$off + $j];
         |        if ($d > ${DGuard}L || $d < -${DGuard}L) { $acc = Long.MAX_VALUE; }
         |        else { $acc += $d * $d; }
         |      }
         |      if ($j == $dim && $acc < $best) { $best = $acc; $bestC = $c; }
         |    }
         |    if ($best > ${MaxDist}L) { ${ev.isNull} = true; }
         |    else { ${ev.value} = ($best << 16) | (long) $bestC; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  val IndexBits = 16

  /** Column-API entry point; `centroids(i)` is the centroid with
    * index i. */
  def apply(qv: Column, centroids: Seq[Seq[Long]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(qv), centroids))
}
