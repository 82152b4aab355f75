package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native banded random-hyperplane LSH keys (SimHash-for-cosine family,
  * Charikar 2002) over an array<float|double> embedding column.
  *
  * Output is an array<int> of length `bands`; entry b packs the sign
  * bits of the vector's dot products against that band's `rowsPerBand`
  * seeded Gaussian hyperplanes (bit j = plane j of the band). Two
  * vectors are near-dup CANDIDATES iff they share the packed bits in
  * ANY band (OR-amplification): a pair at cosine c agrees with one
  * plane with p = 1 - arccos(c)/pi, so
  *
  *   P(miss) = (1 - p^rowsPerBand)^bands
  *
  * and `bands` is chosen to drive that below a target (e.g. at c = 0.35,
  * p ~ 0.6138; rowsPerBand = 4, bands = 140 gives P(miss) ~ 4.9e-10).
  *
  * One fused loop computes all bands*rowsPerBand dot products in a
  * single pass over the vector; the composed Column form (an
  * interpreted `aggregate`+`zip_with` fold PER PLANE, recomputed on both
  * sides of the candidate self-join) is what made the round-2 operator
  * both slow and 16-buckets-forever. The hyperplanes are derived from
  * `seed` on first use (per JVM), not shipped as literals, so the plan
  * stays small at any band count.
  */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int,
                           dim: Int, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if bands > 0 && rowsPerBand > 0 && rowsPerBand <= 30 && dim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects (array<float|double>, bands > 0, 0 < rowsPerBand <= 30, " +
        s"dim > 0), got ${child.dataType.simpleString}, $bands, $rowsPerBand, $dim")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val planes: Array[Double] =
    HyperplaneBands.planes(bands * rowsPerBand, dim, seed)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], isFloat, planes,
      bands, rowsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.HyperplaneBands.compute($c, $isFloat, $planesRef, $bands, $rowsPerBand, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {

  /** Seeded Gaussian hyperplanes, plane-major (plane p occupies
    * [p*dim, (p+1)*dim)). Same generator and fill order as the round-2
    * `Similarity.hyperplanes`, so single-band keys reproduce the
    * previous `lshBucket` values bit for bit.
    */
  def planes(nPlanes: Int, dim: Int, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes * dim)(rng.nextGaussian())
  }

  /** All band keys in one pass: for each plane, a fused dot product in
    * index order (double accumulation — the same IEEE op order as the
    * folded Column form it replaces).
    */
  def compute(vec: ArrayData, isFloat: Boolean, planes: Array[Double],
              bands: Int, rows: Int, dim: Int): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bits = 0
      var r = 0
      while (r < rows) {
        val off = (b * rows + r) * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          dot += x * planes(off + i)
          i += 1
        }
        if (dot >= 0) bits |= (1 << r)
        r += 1
      }
      out(b) = bits
      b += 1
    }
    new GenericArrayData(out)
  }
}
