package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", arXiv:1902.04023) — the MERGEABLE quantile
  * sketch that replaces the exact per-group percentile at scale: the exact
  * path's state is a value→count map (∝ distinct values per group), while
  * a t-digest holds O(δ) centroids whatever the group size, survives
  * arbitrary partial-aggregate merges (map-side combine, AQE re-splits),
  * and bounds RANK error by construction — the k1 scale function
  * `k(q) = δ/(2π)·asin(2q−1)` caps each centroid's quantile width at
  * `kInv(k+1)−kInv(k)` ≤ 2π/δ·√(q(1−q))-ish, tightest at the tails.
  * With δ = 200 the mid-range rank error is ≲ 0.8%, far inside the 2%
  * gate the oracle query states.
  *
  * Buffered inserts amortize the sort: points land in a fixed buffer and
  * are folded into the committed centroids by one sort+merge pass when it
  * fills — the standard merging-digest design, O(log δ)-free and
  * allocation-light, which is what a per-row Spark `update` path needs.
  */
final class TDigest(val compression: Double) extends Serializable {
  private var means = new Array[Double](0)
  private var weights = new Array[Double](0)
  private var nCentroids = 0
  var total: Double = 0.0

  private val bufCap = 512
  private var bufM = new Array[Double](bufCap)
  private var bufW = new Array[Double](bufCap)
  private var bufN = 0

  def add(x: Double, w: Double = 1.0): Unit = {
    if (bufN == bufCap) compress()
    bufM(bufN) = x; bufW(bufN) = w; bufN += 1
    total += w
  }

  def mergeIn(o: TDigest): Unit = {
    o.compress()
    var i = 0
    while (i < o.nCentroids) {
      if (bufN == bufCap) compress()
      bufM(bufN) = o.means(i); bufW(bufN) = o.weights(i); bufN += 1
      i += 1
    }
    total += o.total
  }

  private def k(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
  private def kInv(kv: Double): Double =
    (math.sin(math.min(compression / 4.0, math.max(-compression / 4.0, kv)) *
      2.0 * math.Pi / compression) + 1.0) / 2.0

  /** Fold the buffer into the committed centroids: gather, sort by mean,
    * then one greedy pass merging neighbors while the merged centroid's
    * quantile span stays within one k-unit.
    */
  def compress(): Unit = {
    if (bufN == 0) return
    val n = nCentroids + bufN
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    System.arraycopy(means, 0, m, 0, nCentroids)
    System.arraycopy(weights, 0, w, 0, nCentroids)
    System.arraycopy(bufM, 0, m, nCentroids, bufN)
    System.arraycopy(bufW, 0, w, nCentroids, bufN)
    bufN = 0
    // index sort by mean (values and weights travel together)
    val idx = Array.range(0, n).sortBy(m(_))
    val sm = idx.map(m(_)); val sw = idx.map(w(_))
    val w0 = sw.sum
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var out = 0
    var curM = sm(0); var curW = sw(0)
    var wSoFar = 0.0
    var qLimit = kInv(k(0.0) + 1.0)
    var i = 1
    while (i < n) {
      if ((wSoFar + curW + sw(i)) / w0 <= qLimit) {
        // weighted-mean fold keeps the centroid exact for its members
        val wNew = curW + sw(i)
        curM += (sm(i) - curM) * sw(i) / wNew
        curW = wNew
      } else {
        om(out) = curM; ow(out) = curW; out += 1
        wSoFar += curW
        qLimit = kInv(k(wSoFar / w0) + 1.0)
        curM = sm(i); curW = sw(i)
      }
      i += 1
    }
    om(out) = curM; ow(out) = curW; out += 1
    means = java.util.Arrays.copyOf(om, out)
    weights = java.util.Arrays.copyOf(ow, out)
    nCentroids = out
  }

  /** Quantile by linear interpolation between centroid MIDPOINTS (each
    * centroid is assumed to straddle half its weight on each side — the
    * paper's estimator), clamped to the observed extremes.
    */
  def quantile(q: Double): Double = {
    compress()
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < nCentroids) {
      val mid = cum + weights(i) / 2.0
      if (target <= mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2.0
        val t = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + t * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(nCentroids - 1)
  }

  def toBytes: Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + nCentroids * 16)
    bb.putDouble(compression)
    bb.putInt(nCentroids)
    var i = 0
    while (i < nCentroids) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def fromBytes(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val m = bb.getDouble; val w = bb.getDouble
      d.add(m, w)
      i += 1
    }
    d
  }
}

/** `tdigest_quantiles(x, percentages, δ)` aggregate → `array<double>`, one
  * estimate per requested quantile. Null inputs are skipped (the SQL
  * aggregate convention). See [[TDigest]] for the error bound.
  */
case class TDigestQuantiles(child: Expression, percentages: Seq[Double],
                            compression: Double,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest] with Serializable {
  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    "percentages must be in [0, 1]")
  require(compression >= 20, s"compression too small for a useful sketch: $compression")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantiles requires a numeric column, got $t")
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    child.eval(input) match {
      case null => ()
      case d: Decimal => buffer.add(d.toDouble)
      case n: java.lang.Number => buffer.add(n.doubleValue())
      case other => throw new IllegalStateException(
        s"tdigest_quantiles: unexpected value $other") // unreachable: type-checked numeric
    }
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TDigest): Any =
    new GenericArrayData(percentages.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantiles =
    copy(child = newChildren.head)
  override def prettyName: String = "tdigest_quantiles"
}

object Quantiles {
  /** Column API: `tdigestQuantiles($"x", Seq(0.5, 0.9))` → array<double>. */
  def tdigestQuantiles(c: Column, percentages: Seq[Double],
                       compression: Double = 200.0): Column =
    ColumnShim.column(TDigestQuantiles(ColumnShim.expression(c), percentages,
      compression).toAggregateExpression())
}
