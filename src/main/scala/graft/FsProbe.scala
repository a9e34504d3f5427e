package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbench for driver-side FS metadata costs (guide §1): times
  * FsMaint.dataFileCount / totalDataBytes / newHadoopConf / getFileSystem on
  * a representative hive-partitioned dir, isolating the suspected per-call
  * overheads from the job-side noise in Profile's samples.
  */
object FsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_fsprobe").toString
    spark.range(0, 100000, 1, 32)
      .select((col("id") % 16).as("cell"), col("id"))
      .write.partitionBy("cell").parquet(s"$dir/vectors")
    val p = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    def time[T](label: String, n: Int)(f: => T): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/call (n=$n)")
    }
    time("newHadoopConf", 20)(spark.sessionState.newHadoopConf())
    val conf = spark.sessionState.newHadoopConf()
    time("getFileSystem(cached conf)", 20)(p.getFileSystem(conf))
    val fs = p.getFileSystem(conf)
    println(s"fs class: ${fs.getClass.getName}")
    var nf = 0L
    time("dataFileCount", 10) { nf = graft.ops.FsMaint.dataFileCount(fs, p) }
    println(s"files: $nf")
    time("totalDataBytes", 10)(graft.ops.FsMaint.totalDataBytes(fs, p))
    time("newHadoopConf+getFS+dataFileCount", 10) {
      val c2 = spark.sessionState.newHadoopConf()
      graft.ops.FsMaint.dataFileCount(p.getFileSystem(c2), p)
    }
    time("raw listFiles recursive", 10) {
      val it = fs.listFiles(p, true)
      var n = 0; while (it.hasNext) { it.next(); n += 1 }; n
    }
    time("listStatus recursion", 10) {
      def walk(d: org.apache.hadoop.fs.Path): Long = {
        var n = 0L
        fs.listStatus(d).foreach { st =>
          if (st.isDirectory) n += walk(st.getPath)
          else if (st.getPath.getName.startsWith("part-") && st.getLen > 0) n += 1
        }
        n
      }
      walk(p)
    }
    time("raw listStatus flat (one dir)", 10)(fs.listStatus(p).length)
    spark.stop()
  }
}
