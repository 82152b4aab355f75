package graft.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitter summary (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): a bounded map of at most
  * `capacity` (token → lower-bound count) entries with the guarantee
  *
  *   exact(t) − N/(capacity+1)  <=  est(t)  <=  exact(t)
  *
  * for EVERY token (absent ⇒ est 0), where N is the total number of
  * aggregated tokens. Hence any token with exact count > N/(capacity+1)
  * is guaranteed present — the frequent-items contract.
  *
  * Scale story: exact token counting shuffles every distinct token;
  * over trillion-gram vocabularies the shuffle and the final table are
  * the bottleneck. This summary is a constant-size aggregation buffer
  * per partition, merges associatively in the partial-aggregate tree
  * (map-side combine does the heavy lifting; the final shuffle carries
  * `capacity` entries per partition), and the driver never sees more
  * than `capacity` rows. The amortized compaction (shrink only when the
  * buffer exceeds 2×capacity, subtracting the (capacity+1)-th largest
  * count) keeps update O(1) amortized instead of the textbook
  * decrement-all O(capacity) per novel token.
  */
case class MisraGriesTopK(child: Expression, capacity: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if capacity > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"misra_gries_topk expects a string column and capacity > 0, got " +
        s"${child.dataType.simpleString}, $capacity")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Drop to `capacity` entries by subtracting the (capacity+1)-th
    * largest count from everything (the mergeable-summaries compaction;
    * each survivor keeps a lower bound, each drop was <= the subtracted
    * pivot, so the cumulative subtraction per key stays <= N/(cap+1)).
    */
  private def compact(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - capacity - 1)
      val it = buf.iterator.toArray
      it.foreach { case (k, v) =>
        if (v - pivot <= 0L) buf.remove(k) else buf.update(k, v - pivot)
      }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
      if (buf.size > 2 * capacity) compact(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
    compact(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    compact(buf)
    val entries = buf.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}
