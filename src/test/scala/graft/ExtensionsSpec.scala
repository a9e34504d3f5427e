package graft

/** SQL registration of custom expressions (GraftExtensions). */
class ExtensionsSpec extends SparkSpec {

  test("array_dot and minhash_sig callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)
    val sig = spark.sql("SELECT minhash_sig(array('a', 'b'), 4) AS sig")
      .head().getSeq[Long](0)
    assert(sig.length === 4)
    // matches the DataFrame-API expression values
    import org.apache.spark.sql.functions._
    val viaDf = spark.range(1)
      .select(graft.functions.VectorExpressions.minhash_sig(
        array(lit("a"), lit("b")), 4).as("sig"))
      .head().getSeq[Long](0)
    assert(sig === viaDf)
  }

  test("shingle_hash64 matches the interpreted transform+xxhash64 expression") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.TextAnalysis
    val df = Seq("a b c d e f", "x", "", "   ", "one two three",
      "w w w w w w w w").toDF("text")
    val fast = df.select(graft.functions.VectorExpressions
      .shingle_hash64(TextAnalysis.tokens(col("text")), 3).as("h"))
      .as[Seq[Long]].collect()
    val slow = df.select(transform(TextAnalysis.shingles(col("text"), 3),
      s => xxhash64(s)).as("h")).as[Seq[Long]].collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("lsh_buckets matches the literal-array sign-bit formula bit for bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.VectorExpressions
    import graft.ops.Similarity
    val dim = 16
    val tables = 3
    val nPlanes = 5
    val vecs = (0 until 20).map(i =>
      (i.toLong, (0 until dim).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat))).toDF("id", "v")
    val planes = Array.concat((0 until tables).map(t =>
      Similarity.hyperplanes(nPlanes, dim, seed = 42L + t)): _*)
    val fast = vecs.orderBy("id")
      .select(VectorExpressions.lsh_buckets($"v", planes, tables).as("b"))
      .as[Seq[Long]].collect()
    // the per-table column formula the compiled expression replaced
    val slow = vecs.orderBy("id").select(array((0 until tables).map { t =>
      val hp = Similarity.hyperplanes(nPlanes, dim, seed = 42L + t)
      hp.zipWithIndex.map { case (p, i) =>
        when(VectorExpressions.array_dot($"v",
          array(p.toIndexedSeq.map(lit): _*)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*).as("b")).as[Seq[Long]].collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("topk_by_score equals row_number-window top-k, including ties") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // scores with deliberate ties: tie broken by lower id in both forms
    val scored = (1L to 200L).map(i => (i % 4, i, (i % 7).toDouble))
      .toDF("q", "id", "sim")
    val viaAgg = scored.groupBy("q")
      .agg(graft.functions.VectorExpressions.topk_by_score($"sim", $"id", 5).as("tk"))
      .select($"q", posexplode($"tk").as(Seq("pos", "e")))
      .select($"q", $"e.id".as("id"), $"e.sim".as("sim"), ($"pos" + 1).as("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy($"sim".desc, $"id")
    val viaWin = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5).select($"q", $"id", $"sim", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWin)
    // SQL surface
    GraftExtensions.register(spark)
    scored.createOrReplaceTempView("scored_tk")
    val viaSql = spark.sql(
      "SELECT q, topk_by_score(sim, id, 5) AS tk FROM scored_tk GROUP BY q")
    assert(viaSql.select(explode($"tk")).count() == 20)
  }

  test("mg_topk callable from SQL; exact under capacity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val items = Seq.fill(30)("x") ++ Seq.fill(12)("y") ++ Seq.fill(4)("z")
    scala.util.Random.shuffle(items).toDF("item").repartition(5)
      .createOrReplaceTempView("mg_items")
    val got = spark.sql("SELECT mg_topk(item, 8) AS s FROM mg_items")
      .select(explode($"s").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 30L, "y" -> 12L, "z" -> 4L))
  }
}
