package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass character-entropy accumulator (SURVEY.md §2.10
  * upgrade path): returns `Σ round(round(p·ln p, 9) · 1e9, 0)` over the
  * distinct characters of the input as an exact LONG — the
  * order-independent integer-nanos sum [[graft.text.TextStats
  * .charEntropy]] divides back out.
  *
  * The composed higher-order-function form re-scans the character array
  * once per DISTINCT character through interpreted lambdas —
  * O(distinct × length) with per-element expression-eval overhead; it
  * measured 27 s for one sf0.1 pass. This expression builds the
  * code-point histogram in one O(length) pass and reproduces the exact
  * arithmetic the DuckDB oracle replays: java.math.BigDecimal HALF_UP
  * rounding (what Spark's `round` does on doubles), `Math.log` (what
  * Spark's `log` calls), IEEE double division.
  */
case class CharEntropyNanos(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_nanos expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_nanos"

  override def nullSafeEval(input: Any): Any =
    CharEntropyNanos.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.CharEntropyNanos.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyNanos =
    copy(child = newChild)
}

object CharEntropyNanos {

  /** One pass: code-point histogram, then one snapped term per distinct
    * character. Code points match `split(text, "")`'s per-character
    * strings (Java regex splits at code-point boundaries).
    */
  def compute(input: UTF8String): Long = {
    val s = input.toString
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()(0)
      val p = cnt.toDouble / n.toDouble
      val term = p * Math.log(p)
      // Spark round(double, d) semantics: BigDecimal HALF_UP at scale d
      val r9 = java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      val r0 = java.math.BigDecimal.valueOf(r9 * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      sum += r0.toLong
    }
    sum
  }
}
