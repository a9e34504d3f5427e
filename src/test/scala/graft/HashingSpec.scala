package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions._

class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("rowHash golden value: md5 of '#'-joined canonical strings") {
    val df = Seq((1, "a", 2.5)).toDF("k", "s", "d")
    val got = df.select(Hashing.rowHash(df, Seq("k", "s", "d")).as("h")).head().getString(0)
    // md5("1#a#2.5") — independently computable
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("1#a#2.5".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == exp)
  }

  test("NullColumnTest: [2,null,null] and [null,2,null] must hash differently (fixed mode)") {
    // Reference bug it guards against at table level: TableConnection.php:472-477
    val df = Seq(
      (1, Option(2), Option.empty[Int], Option.empty[Int]),
      (2, Option.empty[Int], Option(2), Option.empty[Int])).toDF("id", "a", "b", "c")
    val hashes = df.select(Hashing.rowHash(df, Seq("a", "b", "c")).as("h"))
      .collect().map(_.getString(0))
    assert(hashes.distinct.length == 2)
  }

  test("legacyNullSkip reproduces the reference NULL-permutation collision") {
    val df = Seq(
      (1, Option(2), Option.empty[Int], Option.empty[Int]),
      (2, Option.empty[Int], Option(2), Option.empty[Int])).toDF("id", "a", "b", "c")
    val hashes = df.select(Hashing.rowHash(df, Seq("a", "b", "c"), legacyNullSkip = true).as("h"))
      .collect().map(_.getString(0))
    assert(hashes.distinct.length == 1)
  }

  test("tableFingerprint is order-insensitive and content-sensitive") {
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val b = Seq((3, "z"), (1, "x"), (2, "y")).toDF("k", "v") // permuted
    val c = Seq((1, "x"), (2, "y"), (3, "w")).toDF("k", "v") // mutated
    val cols = Seq("k", "v")
    assert(Hashing.tableFingerprint(a, cols) == Hashing.tableFingerprint(b, cols))
    assert(Hashing.tableFingerprint(a, cols) != Hashing.tableFingerprint(c, cols))
  }

  test("tableFingerprint distinguishes duplicate multiplicity") {
    val a = Seq((1, "x"), (1, "x")).toDF("k", "v")
    val b = Seq((1, "x")).toDF("k", "v")
    assert(Hashing.tableFingerprint(a, Seq("k", "v")) != Hashing.tableFingerprint(b, Seq("k", "v")))
  }

  test("partitionFingerprints: one row per partition value, matches whole-table semantics") {
    val df = Seq((1, "p1", "a"), (2, "p1", "b"), (3, "p2", "c")).toDF("k", "p", "v")
    val fps = Hashing.partitionFingerprints(df, "p", Seq("k", "p", "v")).collect()
    assert(fps.length == 2)
    val p1 = fps.find(_.getString(0) == "p1").get
    assert(p1.getLong(1) == 2) // fp_count
  }

  test("empty table fingerprints are stable") {
    val df = Seq.empty[(Int, String)].toDF("k", "v")
    assert(Hashing.tableFingerprint(df, Seq("k", "v")) ==
      Hashing.tableFingerprint(df, Seq("k", "v")))
  }

  test("multiset fingerprint is incrementally maintainable (group algebra)") {
    val cols = Seq("k", "v")
    val base = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
    val deletes = Seq((2, "b"), (4, "d")).toDF("k", "v")
    val inserts = Seq((2, "B2"), (5, "e")).toDF("k", "v")
    val after = Seq((1, "a"), (3, "c"), (2, "B2"), (5, "e")).toDF("k", "v")
    val maintained = Hashing.multisetFp(base, cols)
      .remove(Hashing.multisetFp(deletes, cols))
      .merge(Hashing.multisetFp(inserts, cols))
    assert(maintained == Hashing.multisetFp(after, cols))
    // render matches the one-shot aggregate's string form
    assert(maintained.render ==
      Hashing.multisetFingerprintAgg(after, cols).head().getString(0))
  }

  test("multisetFpDelta: one-pass maintenance equals three-aggregate form") {
    import org.apache.spark.sql.functions._
    val cols = Seq("k", "v")
    // delta = rows with even k get v upper-cased (delete pre-image, insert
    // post-image); one pass over before/after hash images must agree with
    // the recompute over the post-delta frame.
    val base = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")).toDF("k", "v")
    val staged = base.withColumn("__v2", upper(col("v")))
    val afterCols = Seq("k", "__v2")
    val maintained = Hashing.multisetFpDelta(
      staged.select((col("k") % 2 === 0).as("__d"),
        Hashing.rowHash(staged, cols).as("__hb"),
        Hashing.rowHash(staged, afterCols).as("__hi")),
      deltaCol = "__d", beforeHash = "__hb", afterHash = "__hi")
    val after = Seq((1, "a"), (2, "B"), (3, "c"), (4, "D"), (5, "e")).toDF("k", "v")
    assert(maintained == Hashing.multisetFp(after, cols))
  }
}
