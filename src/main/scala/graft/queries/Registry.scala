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

  /** Repo-relative source file DEFINING each query — the granularity the
    * bench's changed-path analysis keys on (a query is "untouched this
    * round" only if neither its defining file nor any shared non-queries
    * source changed).
    */
  def definingFile: Map[String, String] = {
    val groups: Seq[(Seq[Q], String)] = Seq(
      CoreQueries.all -> "src/main/scala/graft/queries/CoreQueries.scala",
      SyncQueries.all -> "src/main/scala/graft/queries/SyncQueries.scala",
      TextQueries.all -> "src/main/scala/graft/queries/TextQueries.scala",
      SimilarityQueries.all -> "src/main/scala/graft/queries/SimilarityQueries.scala",
      StreamingQueries.all -> "src/main/scala/graft/queries/StreamingQueries.scala",
      ExtendedQueries.all -> "src/main/scala/graft/queries/ExtendedQueries.scala",
      SourceQueries.all -> "src/main/scala/graft/queries/SourceQueries.scala")
    groups.flatMap { case (qs, f) => qs.map(_.name -> f) }.toMap
  }

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Read one of the driver-provided parquet tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` physical type varies by testdata generation:
    * TIMESTAMP(NANOS) (which Spark's reader rejects — read nanos as long and
    * truncate to microseconds, matching DuckDB's own ns→µs truncation) or
    * TIMESTAMP(MICROS) without UTC adjustment (inferred as timestamp_ntz).
    * Both normalize to a plain session-tz TimestampType; the session runs in
    * UTC, so the rendered values match DuckDB either way.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    normalizeEventsTs(raw)
  }

  /** Normalize the `ts` column of an events frame to TimestampType regardless
    * of which physical parquet type it was read as (see [[events]]).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType          => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType  => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                 => df
    }
  }

  /** Footer schema of the events table as the streaming source must declare
    * it (nanos generations surface `ts` as LongType via nanosAsLong; micros
    * generations as timestamp_ntz). Footer read only — no scan.
    */
  def eventsRawSchema(spark: SparkSession, sfDir: String): org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  /** Streaming variant of [[events]]: same nanos→micros handling over a
    * `readStream` source. Spark's streaming file source requires a
    * *directory*; the testdata table is a single parquet file, so stage it
    * via symlink into a scratch dir (the usual raw→bronze ingest shape).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val schema = eventsRawSchema(spark, sfDir) // footer read, no scan
    normalizeEventsTs(spark.readStream.schema(schema).parquet(stage.toString))
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
