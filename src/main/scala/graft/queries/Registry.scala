package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle statement
  * over the same parquet tables. Queries without an oracle get the driver's
  * weaker rows-only check.
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String] = None)

object Registry {
  def all: Seq[Q] =
    CoreQueries.all ++ SyncQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ StreamingQueries.all ++ ExtendedQueries.all ++
      SourceQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Read one of the driver-provided parquet tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects. Read nanos as long and truncate to microseconds —
    * matching DuckDB's own ns→µs truncation, so oracles stay aligned.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Streaming variant of [[events]]: same nanos→micros handling over a
    * `readStream` source. Spark's streaming file source requires a
    * *directory*; the testdata table is a single parquet file, so stage it
    * via symlink into a scratch dir (the usual raw→bronze ingest shape).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val schema = {
      val s = table(spark, sfDir, "events").schema // footer read, no scan
      org.apache.spark.sql.types.StructType(s.fields.map {
        case f if f.name == "ts" => f.copy(dataType = org.apache.spark.sql.types.LongType)
        case f => f
      })
    }
    spark.readStream.schema(schema).parquet(stage.toString)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** DuckDB-side row-hash canonicalization — MUST stay in lockstep with
    * [[graft.functions.Hashing.rowHash]]: md5 over '#'-joined per-column
    * string casts with 'NULL' sentinels. Both engines format integers,
    * sub-1e7 doubles, and timestamps identically, which the harness verifies.
    */
  def duckRowHash(cols: Seq[String]): String =
    cols.map(c => s"coalesce(cast($c as varchar),'NULL')")
      .mkString("md5(concat_ws('#', ", ", ", "))")

  /** DuckDB-side mirror of [[graft.functions.Hashing.multisetFingerprintAgg]]
    * over table `from`: `"count:sum:xor"` of the md5 hash's first 15 hex
    * digits — order-insensitive, no string_agg materialization.
    */
  def duckMultisetFingerprint(cols: Seq[String], from: String): String =
    s"""SELECT cast(count(*) as varchar) || ':' ||
       | cast(coalesce(sum(h15), 0) as varchar) || ':' ||
       | cast(coalesce(bit_xor(h15), 0) as varchar) AS fingerprint,
       | count(*) AS n_rows
       |FROM (SELECT ('0x' || substr(${duckRowHash(cols)}, 1, 15))::BIGINT AS h15 FROM $from)""".stripMargin
}
