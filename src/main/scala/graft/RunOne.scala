package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query and show its result/plan.
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // Dev escape hatch for A/B conf experiments, mirroring Bench.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match { case Array(k, v) => builder.config(k.trim, v.trim); case _ => () }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev profiling: GRAFT_JOBLOG=1 prints per-job wall time + call site.
    if (sys.env.get("GRAFT_JOBLOG").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(js.properties).map { p =>
            Option(p.getProperty("spark.job.description"))
              .orElse(Option(p.getProperty("callSite.short")))
              .getOrElse("?")
          }.getOrElse("?")
          starts.put(js.jobId, (System.nanoTime(), site)); ()
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"[job ${je.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%7.3fs  $site")
          }
        }
      })
    }
    if (args.contains("time")) {
      // Bench-parity timing: same warmup + fixture prestage, N samples.
      try {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag").count().count()
        graft.queries.SyncQueries.prestage(spark, sfDir)
        graft.queries.SourceQueries.prestage(spark, sfDir)
      } catch { case _: Throwable => () }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count()
        graft.ops.Caching.release(df)
        println(f"""{"query":"$name","run":$i,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      }
    } else {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (args.contains("explain")) df.explain("formatted")
      df.show(20, truncate = false)
      println(s"rows: ${df.count()}")
    }
    spark.stop()
  }
}
