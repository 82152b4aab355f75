package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass SimHash (SURVEY.md §2.10 upgrade path: custom
  * Catalyst `Expression` over the UDF/HOF ladder).
  *
  * Semantics: lowercase the input, split on whitespace runs, hash each
  * token, and set output bit j iff a strict majority of token hashes
  * have bit j set. The composed higher-order-function formulation needs
  * 64 array folds per row; this expression does one pass over the
  * bytes, and `doGenCode` emits a direct static call so the operator
  * stays inside whole-stage codegen.
  *
  * Two token-hash modes:
  *  - default (`portable = false`): xxhash64 seed 42 in place, zero
  *    per-token allocation — the scale path (full 64-bit fingerprint).
  *  - `portable = true`: the engine-portable md5-derived 60-bit key
  *    ([[PortableWinnow.portableHash]], recomputable in DuckDB as
  *    `CAST('0x'||substring(md5(tok),1,15) AS BIGINT)`), so the
  *    fingerprint itself — a bit-majority over hash VALUES — can be
  *    verified by a SQL oracle (the same trade [[PortableWinnow]]
  *    makes: one md5 per token buys cross-engine verifiability; bits
  *    60–63 are always zero).
  */
case class SimHash64(child: Expression, portable: Boolean = false) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    if (portable) SimHash64.computePortable(input.asInstanceOf[UTF8String])
    else SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (portable) defineCodeGen(ctx, ev, c => s"graft.catalyst.SimHash64.computePortable($c)")
    else defineCodeGen(ctx, ev, c => s"graft.catalyst.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private final val Seed = 42L

  /** One pass: tokenize on ASCII whitespace, hash each token in place
    * (no per-token allocation), vote per bit.
    */
  def compute(input: UTF8String): Long = {
    val s = input.toLowerCase
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes
    val votes = new Array[Int](64)
    var total = 0
    var i = 0
    while (i < n) {
      // skip whitespace run
      while (i < n && isSpace(org.apache.spark.unsafe.Platform.getByte(base, offset + i))) i += 1
      val start = i
      while (i < n && !isSpace(org.apache.spark.unsafe.Platform.getByte(base, offset + i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
        vote(votes, h)
        total += 1
      }
    }
    majority(votes, total)
  }

  /** Portable variant: same tokenization and voting with the md5-derived
    * 60-bit token key (needs the token bytes as an array for md5, so one
    * byte-array copy per document).
    */
  def computePortable(input: UTF8String): Long = {
    val bytes = input.toLowerCase.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var total = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        vote(votes, PortableWinnow.portableHash(bytes, start, i - start))
        total += 1
      }
    }
    majority(votes, total)
  }

  private def vote(votes: Array[Int], h: Long): Unit = {
    var j = 0
    var hh = h
    while (j < 64) {
      votes(j) += (hh & 1L).toInt
      hh >>>= 1
      j += 1
    }
  }

  private def majority(votes: Array[Int], total: Int): Long = {
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) * 2 > total) out |= (1L << j)
      j += 1
    }
    out
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B
}
