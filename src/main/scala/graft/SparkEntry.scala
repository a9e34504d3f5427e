package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query corpus lives in [[graft.queries.Registry]]: one entry per
  * operator from SURVEY §2 plus the LLM-pipeline extension ops, each with a
  * DuckDB oracle where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {
  /** Flagship: full sync-engine convergence run on sf0.001 (C2 cascade:
    * schema compare → fingerprint short-circuit → hash diff → delta apply),
    * returning the converged fingerprint + row count (rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("sync_converge")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
