package graft

import graft.functions.{ArrayDot, GramMatrixAgg, MinHashSig, MisraGriesAgg, ShingleHash64, TopKByScore}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnShim

/** SQL-surface registration of the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT array_dot(a, b)")` works next to the DataFrame API.
  *
  * Install at build time via `SparkSession.builder.withExtensions(new
  * GraftExtensions)` / `spark.sql.extensions=graft.GraftExtensions`, or on a
  * live session with [[GraftExtensions.register]] (extensions passed to
  * `getOrCreate` are silently skipped when a session already exists).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Ordered batch: DV reads FIRST (so a MERGE's source side is rewritten
    // before the merge rule compiles the statement), then MERGE/UPDATE on
    // graft.-catalog tables → the engine's keyed COW machinery. Analyzer
    // rules only attach at session build, unlike functions (no live-session
    // fallback exists for them).
    ext.injectPostHocResolutionRule(spark => graft.sources.GraftDvReadRule(spark))
    ext.injectPostHocResolutionRule(spark => graft.sources.GraftMergeRule(spark))
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot(a, b) takes exactly 2 arguments")
        ArrayDot(args.head, args(1))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(shingles, numHashes) takes exactly 2 arguments")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig numHashes must be an integer literal, got $other")
        }
        MinHashSig(args.head, n)
      }),
    (FunctionIdentifier("shingle_hash64"),
      new ExpressionInfo(classOf[ShingleHash64].getName, "shingle_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hash64(tokens, k) takes exactly 2 arguments")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hash64 k must be an integer literal, got $other")
        }
        ShingleHash64(args.head, k)
      }),
    (FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "topk_by_score(score, id, k) takes exactly 3 arguments")
        val k = args(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be an integer literal, got $other")
        }
        TopKByScore(args.head, args(1), k)
      }),
    (FunctionIdentifier("gram_matrix"),
      new ExpressionInfo(classOf[GramMatrixAgg].getName, "gram_matrix"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "gram_matrix(vec, d) takes exactly 2 arguments")
        val d = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"gram_matrix d must be an integer literal, got $other")
        }
        GramMatrixAgg(args.head, d)
      }),
    (FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "mg_topk(item, k) takes exactly 2 arguments")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"mg_topk k must be an integer literal, got $other")
        }
        MisraGriesAgg(args.head, k)
      }))

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, b) =>
      ColumnShim.registerFunction(spark, id, info, b)
    }
}
