package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (guide §1: measure first): run the named queries in
  * ONE session — bench-parity confs — and attribute each query's wall time to
  * (a) Spark jobs, keyed by the job's first stage name (which carries the
  * submitting call site, e.g. "parquet at DedupIndex.scala:169"), and
  * (b) driver-side gaps, via a 25 ms main-thread stack sampler aggregated by
  * the innermost graft frame — so both job-count debt and driver FS/commit
  * work are visible per fixture.
  *
  * Usage: runMain graft.Profile <q1> [q2 ...]   (env: SPARK_GRAFT_SF_DIR/CPUS)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((site, (System.nanoTime() - t0) / 1e9)); ()
        }
      }
    })

    // Main-thread stack sampler: innermost graft.* frame (else top frame).
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          if (st.nonEmpty) {
            val key = st.find(f => f.getClassName.startsWith("graft."))
              .map(f => s"${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}:${f.getLineNumber}")
              .getOrElse {
                val f = st.head
                s"[non-graft] ${f.getClassName}.${f.getMethodName}"
              }
            samples.merge(key, 1, (a, b) => a + b); ()
          }
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      graft.queries.SyncQueries.prestage(spark, sfDir)
      graft.queries.SourceQueries.prestage(spark, sfDir)
    } catch { case _: Throwable => () }

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        done.clear(); samples.clear()
        sampling = run == 2
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.count()
        graft.ops.Caching.release(df)
        val wall = (System.nanoTime() - t0) / 1e9
        sampling = false
        if (run == 2) {
          val jobs = {
            val b = Vector.newBuilder[(String, Double)]
            val it = done.iterator()
            while (it.hasNext) b += it.next()
            b.result()
          }
          val jobSum = jobs.map(_._2).sum
          println(f"\n=== $name wall=$wall%.3f jobs=${jobs.size} jobSum=$jobSum%.3f driverGap=${wall - jobSum}%.3f")
          jobs.groupBy(_._1).view.mapValues(v => (v.size, v.map(_._2).sum)).toSeq
            .sortBy(-_._2._2).take(16).foreach { case (site, (n, s)) =>
              println(f"  job $s%7.3fs n=$n%-4d $site")
            }
          println("  -- main-thread samples (25ms) --")
          val it = samples.entrySet().iterator()
          val b = Vector.newBuilder[(String, Int)]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.intValue() }
          b.result().sortBy(-_._2).take(16).foreach { case (k, n) =>
            println(f"  smp ${n * 0.025}%7.2fs $k")
          }
        } else println(f"($name run1 wall=$wall%.3f)")
      }
    }
    spark.stop()
  }
}
