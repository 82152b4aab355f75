package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED-distinct array<long> columns by
  * two-pointer merge — the verify kernel behind every shingle-hash
  * similarity operator (Jaccard = i/(|a|+|b|−i), containment = i/|a|).
  *
  * The built-in `array_intersect`/`array_union` pair builds two hash
  * sets and materializes both result arrays per row just to take their
  * sizes; on the near-dup verify joins those allocations dominate the
  * candidate-pair pass. [[ShingleHashes]]/[[PortableShingles]] already
  * emit sorted-distinct arrays (sort+squash dedup), so the merge walk
  * is free of any preprocessing — O(|a|+|b|) with zero allocation.
  * Inputs MUST be sorted distinct; callers outside that contract use
  * the built-ins.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects two array<bigint>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.catalyst.SortedIntersectSize.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}
