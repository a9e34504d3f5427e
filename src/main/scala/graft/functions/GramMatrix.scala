package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** `gram_matrix(vec, d)` — one-pass exact second-moment statistics of a
  * `d`-dimensional `array<float>` column, the input every covariance/PCA
  * computation needs:
  *
  *   rows `(-1, -1, n)`, `(i, -1, Σ ⌊xᵢ·10⁶⌋)`, and `(i, j, Σ ⌊xᵢxⱼ·10⁶⌋)`
  *   for the upper triangle i ≤ j.
  *
  * Sums are `floor`-quantized to longs BEFORE aggregation (the
  * `emb_centroids` idiom), so the result is independent of row order and
  * partitioning — exact, not merely reproducible — and replayable by any
  * engine that can `floor(x*1e6)`.
  *
  * Scale shape: the aggregation state is `1 + d + d(d+1)/2` longs
  * (d=64 → ~17 KB), built with map-side combine; the shuffle carries one
  * such buffer per partition instead of the `n·d²` rows a
  * posexplode-pairs plan would move. Update cost is O(d²) per row in a
  * tight primitive loop. This is the aggregate that makes covariance/PCA
  * over 100 TB of embeddings a single narrow pass.
  *
  * Rows whose vector is null, not exactly `d` long, or contains a null
  * element are skipped (counted in neither `n` nor the sums) — a partial
  * vector has no well-defined contribution to a cross-moment.
  */
case class GramMatrixAgg(vec: Expression, d: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with Serializable {
  require(d > 0 && d <= 4096, s"d must be in [1, 4096], got $d")

  private val Scale = 1e6
  private val tri = d * (d + 1) / 2
  private val len = 1 + d + tri

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gram_matrix requires array<float|double>, got $t")
    }

  // lazy: the child is unresolved at construction (dataType would throw).
  private lazy val isFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var wellFormed = arr.numElements() == d
      if (wellFormed) {
        var i = 0
        while (wellFormed && i < d) {
          if (arr.isNullAt(i)) wellFormed = false
          i += 1
        }
      }
      if (wellFormed) {
        val xs = new Array[Double](d)
        var i = 0
        while (i < d) {
          xs(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        buffer(0) += 1L
        i = 0
        while (i < d) {
          buffer(1 + i) += math.floor(xs(i) * Scale).toLong
          i += 1
        }
        var k = 1 + d
        i = 0
        while (i < d) {
          var j = i
          val xi = xs(i)
          while (j < d) {
            buffer(k) += math.floor(xi * xs(j) * Scale).toLong
            k += 1; j += 1
          }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = new Array[Any](len)
    out(0) = new GenericInternalRow(Array[Any](-1, -1, buffer(0)))
    var i = 0
    while (i < d) {
      out(1 + i) = new GenericInternalRow(Array[Any](i, -1, buffer(1 + i)))
      i += 1
    }
    var k = 1 + d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(Array[Any](i, j, buffer(k)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](len)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object GramMatrix {
  /** Column API: quantized-exact second-moment rows of a vector column. */
  def gram_matrix(vec: Column, d: Int): Column =
    ColumnShim.column(GramMatrixAgg(ColumnShim.expression(vec), d)
      .toAggregateExpression())

  /** Decode a collected gram result into `(n, sx, sxy)` — dequantized
    * first/second moment sums; `sxy` is the full symmetric matrix. Driver
    * helper for the d²-sized (bounded) PCA path.
    */
  def decode(rows: Seq[org.apache.spark.sql.Row], d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    var n = 0L
    val sx = new Array[Double](d)
    val sxy = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (i == -1 && j == -1) n = v
      else if (j == -1) sx(i) = v / 1e6
      else { sxy(i)(j) = v / 1e6; sxy(j)(i) = v / 1e6 }
    }
    (n, sx, sxy)
  }

  /** Covariance matrix from decoded gram stats (population form). */
  def covariance(n: Long, sx: Array[Double], sxy: Array[Array[Double]]): Array[Array[Double]] = {
    val d = sx.length
    val c = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        c(i)(j) = sxy(i)(j) / n - (sx(i) / n) * (sx(j) / n)
        j += 1
      }
      i += 1
    }
    c
  }

  /** Top-k eigenpairs of a symmetric PSD matrix by power iteration with
    * deflation — deterministic (fixed start vector, convergence-checked with
    * a fixed iteration cap), dependency-free, O(k · iters · d²) on the
    * driver over a d×d input that is bounded (d ≤ 4096) by construction.
    * Near-degenerate spectra (λ₂ ≈ λ₁) converge slowly; the cap plus the
    * residual-scaled gate tolerances in callers absorb that.
    */
  def topEigen(m: Array[Array[Double]], k: Int, iters: Int = 5000): Seq[(Double, Array[Double])] = {
    val d = m.length
    val a = m.map(_.clone())
    (0 until math.min(k, d)).map { p =>
      // Deterministic start: basis-ish vector varying by p to avoid a start
      // orthogonal to the dominant eigenvector.
      var v = Array.tabulate(d)(i => 1.0 + 0.5 * math.sin(i + p))
      def normalize(x: Array[Double]): Array[Double] = {
        val nrm = math.sqrt(x.map(t => t * t).sum)
        if (nrm == 0.0) x else x.map(_ / nrm)
      }
      v = normalize(v)
      var it = 0
      var delta = Double.MaxValue
      while (it < iters && delta > 1e-14) {
        val nv = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * v(j); j += 1 }
          nv(i) = s; i += 1
        }
        val nvn = normalize(nv)
        // sin²-style change measure, sign-insensitive (eigenvectors are
        // defined up to sign, and iteration can alternate it).
        var dot = 0.0
        var i2 = 0
        while (i2 < d) { dot += nvn(i2) * v(i2); i2 += 1 }
        delta = 1.0 - math.abs(dot)
        v = nvn
        it += 1
      }
      // Rayleigh quotient = eigenvalue estimate.
      val av = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += a(i)(j) * v(j); j += 1 }
        s
      }
      val lambda = v.zip(av).map { case (x, y) => x * y }.sum
      // Deflate: a -= lambda v vᵀ
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { a(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (lambda, v)
    }
  }
}
