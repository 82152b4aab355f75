package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-k-shingle hashes of a text column.
  *
  * Replaces the composed chain `split → transform(sequence) → slice →
  * array_join → xxhash64 → array_distinct` (which materializes every
  * shingle string and walks the token array once per shingle) with one
  * pass: tokenize on whitespace byte runs, hash each token in place,
  * combine each window of k token hashes by seed-chaining
  * (`xxh64(h_i, acc)`), and dedup via sort. The per-document cost drops
  * from O(tokens·k) string allocations to zero allocations beyond the
  * output array — this pass dominates MinHash near-dup detection at
  * corpus scale.
  */
case class ShingleHashes(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, k >= 1), got ${child.dataType.simpleString}, $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.ShingleHashes.compute($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L

  def compute(input: UTF8String, k: Int): ArrayData = compute(input, k, true)

  def compute(input: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val s = input.toLowerCase
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes
    // token hashes
    var tokenHashes = new Array[Long](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(org.apache.spark.unsafe.Platform.getByte(base, offset + i))) i += 1
      val start = i
      while (i < n && !isSpace(org.apache.spark.unsafe.Platform.getByte(base, offset + i))) i += 1
      if (i > start) {
        if (nTok == tokenHashes.length) tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        tokenHashes(nTok) = XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
        nTok += 1
      }
    }
    // windows of k, seed-chained; short docs yield one whole-doc shingle
    val eff = math.min(k, math.max(nTok, 1))
    val nShingles = math.max(nTok - eff + 1, if (nTok == 0) 0 else 1)
    val out = new Array[Long](nShingles)
    var w = 0
    while (w < nShingles) {
      var acc = Seed
      var j = 0
      while (j < eff && w + j < nTok) {
        acc = XXH64.hashLong(tokenHashes(w + j), acc)
        j += 1
      }
      out(w) = acc
      w += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // distinct via sort + squash (cheap, cache-friendly, deterministic)
    java.util.Arrays.sort(out)
    var uniq = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(uniq) = out(r); uniq += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B
}
