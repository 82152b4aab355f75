package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native one-pass Johnson–Lindenstrauss ±1 projection (SURVEY.md §2.10
  * upgrade path, the CharEntropyNanos lesson applied before shipping the
  * slow form as the default): maps an array<double> to `outDim` values
  * `round(Σᵢ round(xᵢ·s(j,i), 6), 6)` with the deterministic Rademacher
  * sign `s(j,i)` derived from the portable 60-bit hash of `"rp:j:i"`.
  *
  * Exactness contract (what the DuckDB oracle replays): each term is
  * Spark's `round(x·s, 6)` — java.math.BigDecimal HALF_UP — and the sum
  * is EXACT because the rounded terms are accumulated as integer micros
  * in a long. HALF_UP is symmetric (away from zero), so
  * `round(-x, 6) = -round(x, 6)` and each element needs ONE BigDecimal
  * rounding regardless of outDim; the composed Column form re-rounded
  * per (j, i) pair through interpreted lambdas and decimal arithmetic
  * (measured 3.6 s for one sf0.1 pass, vs ~0.3 s native).
  */
case class RademacherProject(child: Expression, outDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rademacher_project expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rademacher_project"

  override def nullSafeEval(input: Any): Any =
    RademacherProject.compute(input.asInstanceOf[ArrayData], outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.RademacherProject.compute($c, $outDim)")

  override protected def withNewChildInternal(newChild: Expression): RademacherProject =
    copy(child = newChild)
}

object RademacherProject {

  // sign(j, i) memoized per JVM: one md5 per matrix entry, ever
  private val signCache = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]()

  /** true → +1, false → −1; parity of the portable 60-bit hash of
    * "rp:j:i" (matches [[graft.text.TextStats.portableHash64]]).
    */
  private[graft] def positive(j: Int, i: Int): Boolean =
    signCache.computeIfAbsent(j.toLong << 32 | i.toLong, _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"rp:$j:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    })

  def compute(arr: ArrayData, outDim: Int): GenericArrayData = {
    val n = arr.numElements()
    // one HALF_UP rounding per element (sign-symmetric), as exact micros.
    // A non-finite or absurd-magnitude element (a corrupt embedding —
    // the garbage centroidOutliers exists to catch) poisons every
    // output dimension to NaN instead of throwing inside the expression
    // and failing the task (BigDecimal.valueOf(NaN) raises
    // NumberFormatException; review finding r6b): a linear combination
    // of NaN IS NaN, and NaN rows flow to downstream filters.
    val micros = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x) ||
        math.abs(x) >= 1e12) {
        val bad = new Array[Double](outDim)
        java.util.Arrays.fill(bad, Double.NaN)
        return new GenericArrayData(bad)
      }
      micros(i) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
      i += 1
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0L
      i = 0
      try {
        // addExact: per-element micros can reach ~1e18 under the 1e12
        // magnitude guard, so an unchecked sum over 10+ such elements
        // could wrap silently and emit a finite WRONG value — overflow
        // routes to the same NaN path as non-finite inputs (review
        // finding r6b)
        while (i < n) {
          s = if (positive(j, i)) Math.addExact(s, micros(i))
              else Math.subtractExact(s, micros(i))
          i += 1
        }
      } catch {
        case _: ArithmeticException =>
          java.util.Arrays.fill(out, Double.NaN)
          return new GenericArrayData(out)
      }
      // exact long micros / 1e6 is the nearest double of the decimal sum
      // (what CAST(DECIMAL AS DOUBLE) yields); final round-6 mirrors the
      // oracle's trailing round()
      out(j) = java.math.BigDecimal.valueOf(s.toDouble / 1e6)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }
}
