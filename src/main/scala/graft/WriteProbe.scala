package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbench: where does a tiny dynamic-partitioned append spend its
  * time? Isolates shuffle vs write-task vs committer cost for the
  * durable-index store shape (64 id_bucket dirs, KB-sized batch).
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_wprobe").toString
    val batch = spark.range(0, 2000, 1, 8)
      .select(col("id"), concat_ws(" ", lit("text"), col("id")).as("sh"))
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(64)))
      .localCheckpoint(true)
    batch.count()
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { i =>
      time(s"append 64-dir dynamic, repartition(col) [$i]") {
        batch.repartition(col("id_bucket"))
          .write.mode("append").partitionBy("id_bucket").parquet(s"$dir/a")
      }
      time(s"append flat, as-is [$i]") {
        batch.write.mode("append").parquet(s"$dir/b")
      }
      time(s"append 64-dir dynamic, repartition(16, col) [$i]") {
        batch.repartition(16, col("id_bucket"))
          .write.mode("append").partitionBy("id_bucket").parquet(s"$dir/c")
      }
      time(s"append 64-dir dynamic, repartition(32, col) [$i]") {
        batch.repartition(32, col("id_bucket"))
          .write.mode("append").partitionBy("id_bucket").parquet(s"$dir/d")
      }
    }
    spark.stop()
  }
}
