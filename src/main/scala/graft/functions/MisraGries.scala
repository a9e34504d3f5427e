package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency summary (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012): at most `k` tracked
  * items, each estimate undercounts its true frequency by at most
  * `n / (k + 1)` over `n` processed rows — a bound that survives arbitrary
  * partial-aggregate merges, which is exactly what a map-side-combined
  * Spark aggregate needs. Any item with true count > n/(k+1) is guaranteed
  * to survive in the summary, so a k-capacity sketch is a sound candidate
  * generator for heavy hitters at threshold n/m whenever k + 1 > m: the
  * corpus-wide shuffle carries k-entry summaries instead of the full
  * item domain, and an exact count of the ≤ k candidates afterwards makes
  * the final answer deterministic and sketch-error-free.
  */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

  def add(item: String, w: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + w)
    else if (counts.size < k) counts.put(item, java.lang.Long.valueOf(w))
    else {
      // Decrement-all by the largest amount that keeps the invariant: the
      // minimum of (w, smallest tracked count). Amortized O(1) per add —
      // every decremented unit was previously added one unit at a time.
      var dec = w
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next().longValue(); if (v < dec) dec = v }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue.longValue() - dec
        if (v <= 0L) it.remove() else e.setValue(v)
      }
      if (w > dec) add(item, w - dec)
    }
  }

  /** Mergeable-summaries merge: sum counts, then trim to capacity by
    * subtracting the (k+1)-th largest count from everything.
    */
  def merge(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) counts.put(e.getKey, cur + e.getValue.longValue())
      else counts.put(e.getKey, e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val v = e.getValue.longValue() - cut
        if (v <= 0L) eit.remove() else e.setValue(v)
      }
    }
  }

  /** Entries estimate-desc, item-asc (deterministic). */
  def sorted: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue.longValue()); i += 1 }
    out.sortBy { case (s, c) => (-c, s) }
  }
}

/** `mg_topk(item, k)` aggregate → `array<struct<item string, est bigint>>`
  * estimate-desc. Null items are skipped. See [[MGSummary]] for bounds.
  */
case class MisraGriesAgg(item: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] with Serializable {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    item.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mg_topk requires string, got $t")
    }

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = item.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: MGSummary): Any =
    new GenericArrayData(buffer.sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    })

  // Length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps entries at
  // 64 KiB and would crash shuffle serialization on a pathological
  // whitespace-free token instead of sketching it.
  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new MGSummary(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object MisraGries {
  /** Column API: Misra–Gries frequency summary of a string column. */
  def mg_topk(item: Column, k: Int): Column =
    ColumnShim.column(MisraGriesAgg(ColumnShim.expression(item), k)
      .toAggregateExpression())
}
