package graft

import graft.functions.GramMatrix
import org.apache.spark.sql.functions._

/** gram_matrix: quantized-exact second moments must equal a driver-side
  * brute force REGARDLESS of partitioning (the sums are longs, so merge
  * order cannot perturb them), malformed rows are skipped, and the
  * driver-side eigen path satisfies the PSD invariants the emb_pca gate
  * pins.
  */
class GramMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val d = 5
  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[Seq[Float]] =
    Seq.fill(200)(Seq.fill(d)((rnd.nextDouble() * 2 - 1).toFloat))

  private def gramRows(parts: Int): Map[(Int, Int), Long] =
    vecs.toDF("v").repartition(parts)
      .agg(GramMatrix.gram_matrix(col("v"), d).as("g"))
      .select(explode(col("g")).as("r"))
      .select("r.i", "r.j", "r.v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  private def brute: Map[(Int, Int), Long] = {
    val m = scala.collection.mutable.Map.empty[(Int, Int), Long].withDefaultValue(0L)
    m((-1, -1)) = vecs.size.toLong
    vecs.foreach { v =>
      val xs = v.map(_.toDouble)
      for (i <- 0 until d) {
        m((i, -1)) += math.floor(xs(i) * 1e6).toLong
        for (j <- i until d) m((i, j)) += math.floor(xs(i) * xs(j) * 1e6).toLong
      }
    }
    m.toMap
  }

  test("exact vs driver brute force, invariant to partitioning") {
    val expected = brute
    assert(gramRows(1) == expected)
    assert(gramRows(7) == expected)
  }

  test("null, wrong-length, and null-element vectors are skipped entirely") {
    val withNullElem: Seq[Option[Float]] =
      Seq(Some(0.5f), None) ++ Seq.fill(d - 2)(Some(0.25f))
    val mixed: Seq[Option[Seq[Option[Float]]]] =
      vecs.map(v => Option(v.map(Option(_)))) ++
        Seq(None, Some(Seq(Some(1f), Some(2f))),
          Some(Seq.fill(d + 1)(Some(0.5f))), Some(withNullElem))
    val got = mixed.toDF("v").repartition(3)
      .agg(GramMatrix.gram_matrix(col("v"), d).as("g"))
      .select(explode(col("g")).as("r"))
      .select("r.i", "r.j", "r.v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == brute)
  }

  test("SQL surface: gram_matrix registered and equal to the column API") {
    GraftExtensions.register(spark)
    vecs.toDF("v").createOrReplaceTempView("gm_vecs")
    val viaSql = spark.sql(s"SELECT explode(gram_matrix(v, $d)) AS r FROM gm_vecs")
      .select("r.i", "r.j", "r.v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaSql == brute)
  }

  test("eigen path: PSD invariants hold on the decoded covariance") {
    val rows = vecs.toDF("v")
      .agg(GramMatrix.gram_matrix(col("v"), d).as("g"))
      .select(explode(col("g")).as("r")).select("r.i", "r.j", "r.v").collect().toSeq
    val (n, sx, sxy) = GramMatrix.decode(rows, d)
    assert(n == vecs.size)
    val cov = GramMatrix.covariance(n, sx, sxy)
    val eig = GramMatrix.topEigen(cov, 3)
    val ls = eig.map(_._1)
    assert(ls.sliding(2).forall(p => p.head >= p(1) - 1e-9), s"not descending: $ls")
    val maxDiag = (0 until d).map(i => cov(i)(i)).max
    assert(ls.head >= maxDiag - 1e-9, "lambda1 must dominate every diagonal entry")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(ls.sum <= trace + 1e-9, "partial spectrum cannot exceed the trace")
    // Eigen residual: ‖Cv − λv‖ small relative to λ.
    val (l1, v1) = eig.head
    val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v1(j)).sum)
    val resid = math.sqrt((0 until d).map(i => math.pow(cv(i) - l1 * v1(i), 2)).sum)
    assert(resid <= 1e-6 * math.max(l1, 1e-12), s"residual $resid too large for lambda $l1")
  }

  test("topEigen deflation recovers a KNOWN multi-component spectrum, pairwise orthogonal") {
    // Synthetic data with an exactly known covariance: axis-aligned
    // independent coordinates with variances 9, 4, 1, 0 → eigenvalues
    // (9, 4, 1) on the canonical axes. Built as all sign combinations so
    // sample covariance is exact (population over the 8-point set).
    val d4 = 4
    val pts = for (a <- Seq(-3.0, 3.0); b <- Seq(-2.0, 2.0); c <- Seq(-1.0, 1.0))
      yield Array(a, b, c, 0.0)
    val cov = {
      val n = pts.size
      val mean = Array.tabulate(d4)(i => pts.map(_(i)).sum / n)
      Array.tabulate(d4, d4)((i, j) =>
        pts.map(p => (p(i) - mean(i)) * (p(j) - mean(j))).sum / n)
    }
    val eig = GramMatrix.topEigen(cov, 3)
    val ls = eig.map(_._1)
    assert(math.abs(ls(0) - 9.0) < 1e-9 && math.abs(ls(1) - 4.0) < 1e-9 &&
      math.abs(ls(2) - 1.0) < 1e-9, s"spectrum off: $ls")
    // Each eigenvector is the expected canonical axis (up to sign)…
    Seq(0, 1, 2).foreach { k =>
      val v = eig(k)._2
      assert(math.abs(math.abs(v(k)) - 1.0) < 1e-9, s"v$k not axis-aligned: ${v.toSeq}")
    }
    // …and deflation kept the basis orthogonal.
    for (i <- 0 until 3; j <- 0 until i) {
      val dot = eig(i)._2.zip(eig(j)._2).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-6, s"v${i} . v${j} = $dot")
    }
  }
}
