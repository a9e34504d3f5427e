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
}
