package graft.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encode: per subspace j the argmin code
  * over ROUND-6-snapped squared-L2 distance to the literal codebook,
  * plus the cosine of the vector to its codebook reconstruction — one
  * fused loop, one expression node.
  *
  * This replaced the composed Column form (m · k `least(struct(round(
  * unrolled-L2)))` trees): at m=16, k=16 that projection crossed the
  * whole-stage-codegen size limit, Spark disabled WSCG for the stage
  * and evaluated ~8k expression nodes per row interpreted — measured
  * 3.4 s over 2 000 rows where this expression runs the same math as
  * a compiled m·k·d loop in < 50 ms. The brief's expression-preference
  * ladder ("a native Catalyst Expression beats composed ops that fall
  * out of codegen") applied literally.
  *
  * Bit-compat contract with the DuckDB oracle (q115): distances
  * accumulate left-to-right in index order (identical IEEE op order to
  * the SQL's left-assoc `+` chain); the round-6 snap replicates
  * Spark's `round()` on doubles (BigDecimal HALF_UP of the exact
  * binary expansion — the same snap the SQL's `round(x, 6)` performs
  * in DuckDB only up to the documented snap-ambiguity, which the q64
  * family already relies on); ties take the smaller code. The
  * reconstruction cosine accumulates in index order exactly like
  * [[CosineSim.compute]].
  */
case class PQEncode(child: Expression, cb: Array[Double], m: Int, k: Int, d: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if cb.length == m * k * d =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode codebook length ${cb.length} != m*k*d = ${m * k * d}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_cos", DoubleType, nullable = false)))

  override def prettyName: String = "pq_encode"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    PQEncode.compute(v.asInstanceOf[ArrayData], cb, m, k, d, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.catalyst.PQEncode.compute($v, $cbRef, $m, $k, $d, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PQEncode =
    copy(child = newChild)
}

object PQEncode {

  /** Spark's `round(x, 6)` for doubles: HALF_UP on the exact binary
    * expansion via BigDecimal — replicated so the native argmin sees
    * the same snapped distances as the composed form and the oracle.
    */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  def compute(v: ArrayData, cb: Array[Double], m: Int, k: Int, d: Int,
              isFloat: Boolean): InternalRow = {
    // zero-pad a short vector (degenerate input — a crash here would
    // kill the whole stage; zeros quantize deterministically)
    val n = math.min(v.numElements(), m * d)
    val x = new Array[Double](m * d)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestC = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var dist = 0.0
        val base = (j * k + c) * d
        var t = 0
        while (t < d) {
          val diff = x(j * d + t) - cb(base + t)
          dist += diff * diff
          t += 1
        }
        val dr = round6(dist)
        if (dr < bestD) { bestD = dr; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    // reconstruction cosine, index order (the CosineSim.compute loop)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < m * d) {
      val j2 = i / d
      val r = cb((j2 * k + codes(j2)) * d + (i % d))
      dot += x(i) * r
      na += x(i) * x(i)
      nb += r * r
      i += 1
    }
    InternalRow(new GenericArrayData(codes), dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
