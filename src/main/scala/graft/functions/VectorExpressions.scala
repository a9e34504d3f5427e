package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the similarity-search hot path.
  *
  * The built-in way to express a dot product — `aggregate(zip_with(a, b,
  * (x,y) => x*y), 0d, (acc,v) => acc+v)` — evaluates per element through
  * interpreted lambda machinery (higher-order functions are excluded from
  * whole-stage codegen). At millions of (pair × dimension) steps that
  * dominates ANN queries. `ArrayDot` generates a tight primitive loop
  * instead (preference order (b) of the build brief: a scalar Expression,
  * not a whole-operator plan node).
  *
  * Semantics match the left-fold exactly (sequential sum, same order —
  * bit-identical doubles) for array<float> / array<double> inputs. Null
  * array → null; both arrays must have equal length (min is used, matching
  * zip_with's non-null prefix for equal-length inputs).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numHashes` seeded min-hashes of an `array<string>` shingle column in
  * ONE pass — `minhash_sig` replaces the interpreted higher-order fold
  * (`aggregate` + `zip_with` + per-seed `xxhash64`), which evaluates lambda
  * machinery per (shingle × seed) and dominated the near-dup corpus queries
  * (~10 s → sub-second at sf0.1, 5k docs × ~46 shingles × 32 seeds).
  *
  * Value-compatible with the fold it replaces: per seed k the hash is
  * `xxhash64(lit(k), shingle)` = `XXH64.hashUTF8String(s, XXH64.hashInt(k,
  * 42))` (Spark's fold over child expressions), min'd over shingles;
  * empty array → Long.MaxValue per slot; null array → null.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got $t")
    }

  /** Per-seed start state: Spark's `xxhash64(lit(k), s)` folds the int
    * literal first with the default seed 42.
    */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUTF8String(s, seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    UTF8String $s = $c.getUTF8String($j);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($s, $seedsRef[$k]);
         |      if ($h < $mins[$k]) $mins[$k] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<string>` token column in ONE compiled pass —
  * replaces the interpreted `aggregate`/`zip_with` fold that built a
  * 64-element ±1 array per token (higher-order functions are excluded from
  * whole-stage codegen and allocate per element; this was the suite's
  * slowest per-row compute after the minhash fold it mirrors).
  *
  * Value-compatible with the fold it replaces: per token the hash is Spark's
  * `xxhash64(token)` (XXH64 over UTF-8 bytes, seed 42; a NULL element leaves
  * the seed's value 42 — xxhash64 skips nulls); bit i of the result is set
  * iff strictly more tokens had bit i set than clear; empty array → 0L;
  * null array → null.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_sig requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 42L
              else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        counts(i) += (((h >>> i) & 1L) * 2L) - 1L
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0L) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |long[] $counts = new long[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.isNullAt($j) ? 42L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($c.getUTF8String($j), 42L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $counts[$i] += ((($h >>> $i) & 1L) * 2L) - 1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0L) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All xxhash64'd k-shingles of an `array<string>` token column in ONE
  * compiled pass — replaces `transform(shingles(text, k), s => xxhash64(s))`,
  * whose interpreted window/slice/concat lambda tree re-evaluates the token
  * subexpression per window (HOFs are excluded from whole-stage codegen and
  * get no subexpression elimination).
  *
  * Value-compatible with the expression it replaces: window join is
  * `concat_ws(" ", ...)` (null tokens skipped), hash is Spark's `xxhash64`
  * (XXH64 over UTF-8 bytes, seed 42); ≤ k tokens → the single whole-array
  * shingle (hash of "" for an empty array); null array → null. Output may
  * contain duplicates, exactly like the original — wrap in `array_distinct`
  * for set semantics.
  */
case class ShingleHash64(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hash64 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64.hashShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash64.hashShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash64 {
  private val Sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Static helper shared by interpreted eval and generated code (scalac
    * emits a static forwarder, so generated Java calls it directly).
    */
  def hashShingles(arr: ArrayData, k: Int): GenericArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (n <= k) {
      val s = UTF8String.concatWs(Sep, toks: _*)
      new GenericArrayData(Array(XXH64.hashUTF8String(s, 42L)))
    } else {
      val m = n - k + 1
      val out = new Array[Long](m)
      val win = new Array[UTF8String](k)
      var j = 0
      while (j < m) {
        var t = 0
        while (t < k) { win(t) = toks(j + t); t += 1 }
        out(j) = XXH64.hashUTF8String(UTF8String.concatWs(Sep, win: _*), 42L)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Product-quantization encode: an `array<float|double>` vector becomes `m`
  * small codes (one per subspace), each the index of the nearest codebook
  * centroid for that subvector — 1 byte/subspace vs 4 bytes/dimension.
  * `codebooks(j)(c)` is centroid `c` of subspace `j` (dsub doubles each).
  * Evaluation is a compiled static helper (ShingleHash64 pattern).
  */
case class PQEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<float|double>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PQSupport.encode(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PQSupport.encode($c, $cbRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric PQ cosine: scores a CODE array (left) against a full-precision
  * query vector (right) by reconstructing each subspace's centroid on the
  * fly — the query side never loses precision, the corpus side stores only
  * codes.
  */
case class PQCosine(left: Expression, right: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_cosine requires (array<int>, array<float|double>), got $l / $r")
    }

  private def qIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(code: Any, q: Any): Any =
    PQSupport.cosine(code.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      codebooks, qIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.functions.PQSupport.cosine($c, $q, $cbRef, $qIsFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PQSupport {
  /** Nearest-centroid code per subspace (squared-L2 argmin). */
  def encode(vec: ArrayData, codebooks: Array[Array[Array[Double]]],
             isFloat: Boolean): GenericArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = codebooks(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (isFloat) vec.getFloat(j * dsub + i).toDouble
                   else vec.getDouble(j * dsub + i)) - cent(i)
          d2 += x * x
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** cosine(reconstruct(code), q) — reconstruction never materializes. */
  def cosine(code: ArrayData, q: ArrayData, codebooks: Array[Array[Array[Double]]],
             qIsFloat: Boolean): Double = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    var dot = 0.0
    var nc = 0.0
    var nq = 0.0
    var j = 0
    while (j < m) {
      val cent = codebooks(j)(code.getInt(j))
      var i = 0
      while (i < dsub) {
        val qv = if (qIsFloat) q.getFloat(j * dsub + i).toDouble
                 else q.getDouble(j * dsub + i)
        dot += cent(i) * qv
        nc += cent(i) * cent(i)
        nq += qv * qv
        i += 1
      }
      j += 1
    }
    val n = math.sqrt(nc) * math.sqrt(nq)
    if (n == 0.0) 0.0 else dot / n
  }

  /** `vec - centroids(cell)` as a fresh double array (residual encoding). */
  def residual(vec: ArrayData, cell: Int, centroids: Array[Array[Double]],
               isFloat: Boolean): GenericArrayData = {
    val cent = centroids(cell)
    val n = math.min(vec.numElements(), cent.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = (if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)) - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** cosine(q, centroids(cell) + reconstruct(code)) — residual ADC scoring;
    * the reconstruction never materializes. */
  def cosineResidual(code: ArrayData, q: ArrayData, cell: Int,
                     codebooks: Array[Array[Array[Double]]],
                     centroids: Array[Array[Double]], qIsFloat: Boolean): Double = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cent = centroids(cell)
    var dot = 0.0
    var nc = 0.0
    var nq = 0.0
    var j = 0
    while (j < m) {
      val sub = codebooks(j)(code.getInt(j))
      var i = 0
      while (i < dsub) {
        val pos = j * dsub + i
        val rv = cent(pos) + sub(i)
        val qv = if (qIsFloat) q.getFloat(pos).toDouble else q.getDouble(pos)
        dot += rv * qv
        nc += rv * rv
        nq += qv * qv
        i += 1
      }
      j += 1
    }
    val n = math.sqrt(nc) * math.sqrt(nq)
    if (n == 0.0) 0.0 else dot / n
  }
}

/** All LSH hash-table buckets of a vector in ONE compiled pass.
  *
  * `planes` holds `tables × nPlanes` hyperplanes (row-major by table);
  * output slot `t` is the sign-bit bucket of table `t`: bit `p` is set when
  * `dot(vec, planes(t*nPlanes + p)) >= 0`. Bit-identical to the column
  * formula it replaces (`when(array_dot(vec, lit-array) >= 0, 1L << p)`
  * OR-folded per table): same left-to-right dot order, same `>= 0` rule.
  *
  * The literal-array form inflated the plan to tables × nPlanes × dim
  * literal nodes (3 840 at the bench config) — analysis/optimization and
  * codegen of that tree cost multiple seconds per query; one expression
  * holding the matrix as a reference object makes planning O(1).
  */
case class LshBuckets(child: Expression, planes: Array[Array[Double]], tables: Int)
    extends UnaryExpression with Serializable {
  require(tables > 0 && planes.length % tables == 0,
    s"planes (${planes.length}) must split evenly across $tables tables")
  require(planes.length / tables <= 63, "more than 63 planes per table")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets requires array<float|double>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorSupport.lshBuckets(input.asInstanceOf[ArrayData], planes, tables, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorSupport.lshBuckets($c, $pRef, $tables, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Index of the centroid with the max dot product (first wins on ties) —
  * the compiled form of `array_position(scores, array_max(scores)) - 1`
  * over per-centroid literal-array dots. Caller pre-normalizes centroids
  * when cosine order (not dot order) is wanted.
  */
case class ArgMaxDot(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argmax_dot requires array<float|double>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorSupport.argMaxDot(input.asInstanceOf[ArrayData], centroids, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("argmaxCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorSupport.argMaxDot($c, $cRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` centroid indexes with the highest dot products, best first,
  * ties to the lower index — the compiled form of IVF probe selection
  * (`slice(array_sort(struct(-dot, cell)), 1, nProbe)`).
  */
case class TopCells(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_cells requires array<float|double>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorSupport.topCells(input.asInstanceOf[ArrayData], centroids, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("probeCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorSupport.topCells($c, $cRef, $nProbe, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorSupport {
  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Left-to-right dot against a driver-held plane — same order as ArrayDot. */
  private def dotPlane(vec: ArrayData, plane: Array[Double], isFloat: Boolean): Double = {
    val n = math.min(vec.numElements(), plane.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += elem(vec, i, isFloat) * plane(i); i += 1 }
    s
  }

  def lshBuckets(vec: ArrayData, planes: Array[Array[Double]], tables: Int,
                 isFloat: Boolean): GenericArrayData = {
    val perTable = planes.length / tables
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < perTable) {
        if (dotPlane(vec, planes(t * perTable + p), isFloat) >= 0) b |= (1L << p)
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  def argMaxDot(vec: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val s = dotPlane(vec, centroids(c), isFloat)
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  def topCells(vec: ArrayData, centroids: Array[Array[Double]], nProbe: Int,
               isFloat: Boolean): GenericArrayData = {
    val n = centroids.length
    val scores = new Array[Double](n)
    var c = 0
    while (c < n) { scores(c) = dotPlane(vec, centroids(c), isFloat); c += 1 }
    val m = math.min(nProbe, n)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < m) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i) && scores(i) > bestS) { bestS = scores(i); best = i }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-row IVF residual `vec - centroids(cell)` as one compiled pass —
  * the encode-side half of residual product quantization (FAISS IVF-PQ:
  * codes quantize the offset from the cell centroid, whose magnitude is
  * much smaller than the raw vector, so the same code budget spends its
  * resolution where the variance actually is). Centroids ride along as a
  * reference object (un-normalized — residuals are offsets from the MEAN,
  * not from a direction); output is array<double> so [[PQEncode]] composes
  * directly on top and the whole encode stays inside codegen.
  */
case class CellResidual(left: Expression, right: Expression,
                        centroids: Array[Array[Double]])
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cell_residual requires (array<float|double>, int), got $l / $r")
    }

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(vec: Any, cell: Any): Any =
    PQSupport.residual(vec.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      centroids, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("residCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PQSupport.residual($v, $c, $cRef, $vecIsFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric residual-PQ cosine: `cosine(q, centroids(cell) + decode(code))`
  * with the reconstruction never materialized — the score-side half of
  * residual IVF-PQ ([[CellResidual]] is the encode side). Children are
  * (codes, full-precision query, cell id); codebooks + centroids are
  * reference objects, exactly like [[PQCosine]].
  */
case class PQCosineResidual(first: Expression, second: Expression, third: Expression,
                            codebooks: Array[Array[Array[Double]]],
                            centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_cosine_residual requires (array<int>, array<float|double>, int), got $a / $b / $c")
    }

  private def qIsFloat: Boolean = second.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(code: Any, q: Any, cell: Any): Any =
    PQSupport.cosineResidual(code.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], codebooks, centroids, qIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqResidCodebooks", codebooks, "double[][][]")
    val ceRef = ctx.addReferenceObj("pqResidCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (c, q, cell) =>
      s"${ev.value} = graft.functions.PQSupport.cosineResidual($c, $q, $cell, $cbRef, $ceRef, $qIsFloat);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Count of array<long> elements that MIGHT be in a pre-built Bloom filter
  * — one compiled loop per row, zero shuffle. The filter deserializes once
  * per executor via the codegen reference-object channel (the standard
  * `spark.util.sketch` byte format, so any `df.stat.bloomFilter` output
  * plugs in). `mightContain = false` is definite absence, so `hits == 0`
  * proves a row shares NOTHING with the filtered set — the map-side
  * pre-filter that lets a contamination / membership check skip the
  * inverted-index shuffle for the (overwhelming at corpus scale) clean
  * majority. Empty array → 0 hits; null array → null.
  */
case class BloomHits(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_hits requires array<long>, got $t")
    }

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (filter.mightContainLong(a.getLong(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""int $hits = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($fRef.mightContainLong($a.getLong($i))) $hits++;
         |}
         |${ev.value} = $hits;""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<float|double> columns. */
  def array_dot(a: Column, b: Column): Column =
    ColumnShim.column(ArrayDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Codegen'd one-pass MinHash signature of an array<string> column. */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), numHashes))

  /** Codegen'd one-pass xxhash64 k-shingle hashes of an array<string> token column. */
  def shingle_hash64(tokens: Column, k: Int): Column =
    ColumnShim.column(ShingleHash64(ColumnShim.expression(tokens), k))

  /** Codegen'd one-pass 64-bit SimHash of an array<string> token column. */
  def simhash_sig(tokens: Column): Column =
    ColumnShim.column(SimHashSig(ColumnShim.expression(tokens)))

  /** Codegen'd PQ nearest-centroid encoding of a vector column. */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PQEncode(ColumnShim.expression(vec), codebooks))

  /** Codegen'd asymmetric PQ cosine of (codes, full-precision query). */
  def pq_cosine(code: Column, qVec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PQCosine(ColumnShim.expression(code), ColumnShim.expression(qVec), codebooks))

  /** Codegen'd all-tables LSH sign-bucket array of a vector column. */
  def lsh_buckets(vec: Column, planes: Array[Array[Double]], tables: Int): Column =
    ColumnShim.column(LshBuckets(ColumnShim.expression(vec), planes, tables))

  /** Codegen'd argmax-dot centroid assignment of a vector column. */
  def argmax_dot(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnShim.column(ArgMaxDot(ColumnShim.expression(vec), centroids))

  /** Codegen'd top-nProbe-by-dot centroid probe list of a vector column. */
  def top_cells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnShim.column(TopCells(ColumnShim.expression(vec), centroids, nProbe))

  /** Codegen'd IVF residual `vec - centroids(cell)` of a vector column. */
  def cell_residual(vec: Column, cell: Column, centroids: Array[Array[Double]]): Column =
    ColumnShim.column(CellResidual(ColumnShim.expression(vec),
      ColumnShim.expression(cell), centroids))

  /** Codegen'd asymmetric residual-PQ cosine of (codes, query, cell). */
  def pq_cosine_residual(code: Column, qVec: Column, cell: Column,
                         codebooks: Array[Array[Array[Double]]],
                         centroids: Array[Array[Double]]): Column =
    ColumnShim.column(PQCosineResidual(ColumnShim.expression(code),
      ColumnShim.expression(qVec), ColumnShim.expression(cell), codebooks, centroids))

  /** Codegen'd Bloom-filter hit count over an array<long> column. */
  def bloom_hits(hashes: Column, filterBytes: Array[Byte]): Column =
    ColumnShim.column(BloomHits(ColumnShim.expression(hashes), filterBytes))

  /** Bounded-heap top-k aggregate: per group keeps only the k best
    * (score desc, id asc) pairs — map-side partial aggregation ships k rows
    * per task instead of the whole scored set through the shuffle. */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ColumnShim.column(TopKByScore(ColumnShim.expression(score),
      ColumnShim.expression(id), k).toAggregateExpression())
}
