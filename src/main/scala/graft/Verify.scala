package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), rest) = args.splitAt(2)
    // Dev filter must be EXPLICIT: `--only name1 name2 ...`. A stray extra
    // arg fails loudly instead of silently narrowing the verified corpus
    // (a partial parquet dump looks exactly like a full verification run).
    val only: Array[String] = rest match {
      case Array() => Array.empty
      case Array("--only", names @ _*) if names.nonEmpty => names.toArray
      case other => sys.error(
        s"unexpected args ${other.mkString("[", ", ", "]")}; use --only <query>... to filter")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The driver passes exactly (sfDir, outDir) and gets the full corpus.
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    if (only.nonEmpty)
      println(s"[verify] --only filter active: running ${selected.size} of " +
        s"${SparkEntry.queries.size} queries (${only.mkString(", ")})")
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        graft.ops.Caching.release(df)
      } catch { case e: Throwable =>
        failures(name) = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: ${failures(name)}")
      }
    }
    // A query that throws is otherwise just ABSENT from the correctness
    // artifact — indistinguishable from never having been declared (the
    // round-8 events-type drift hid 9 erroring queries this way). Summarize
    // loudly on stdout and leave a machine-readable trail next to the dump.
    if (failures.nonEmpty) {
      println(s"[verify] ${failures.size} of ${selected.size} queries FAILED: " +
        failures.keys.mkString(", "))
      Files.writeString(Paths.get(s"$outDir/_errors.json"),
        failures.map { case (k, v) =>
          s"${graft.util.JsonUtil.quote(k)}: ${graft.util.JsonUtil.quote(v)}"
        }.mkString("{", ",", "}"))
    } else println(s"[verify] all ${selected.size} queries dumped OK")
    // JSON string escape (shared with the audit-log sink): a tab or CR in
    // builder-authored SQL would otherwise make the driver's json.load fail
    // and silently zero the round's correctness.
    def q(s: String): String = graft.util.JsonUtil.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
