package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-anatomy profiler (r16): runs prefix-matched SparkEntry queries
  * with a SparkListener attached and prints, per query, the wall time
  * next to where it went — number of Spark jobs, wall time covered by
  * jobs (start→end of each job, overlaps merged), summed executor task
  * time, and stage count. The uncovered gap (wall − job-covered) is
  * driver-side work: planning, codegen compilation, snapshot manifest
  * I/O, stream trigger machinery. The streaming/multi-action gates are
  * STAGE-COUNT bound, not data bound (NOTES 123) — this main makes
  * that attribution a printed number instead of a guess.
  *
  * Usage: runMain graft.ProfileJobs q353 q380 [...]  (prefix match,
  * the BenchSome convention). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val detail = sys.env.get("SPARK_GRAFT_PJ_DETAIL").contains("1")
    final class Rec extends SparkListener {
      val jobs = scala.collection.concurrent.TrieMap[Int, (Long, Long)]()
      val sites = scala.collection.concurrent.TrieMap[Int, String]()
      @volatile var stages = 0
      @volatile var taskMs = 0L
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        if (detail) sites.put(j.jobId, Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")): Unit
        jobs.put(j.jobId, (j.time, -1L)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.updateWith(j.jobId)(_.map(p => (p._1, j.time))): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += s.stageInfo.taskMetrics.executorRunTime
      }
      /** Wall ms covered by ≥1 running job (intervals merged). */
      def coveredMs(upTo: Long): Long = {
        val iv = jobs.values.toSeq
          .map { case (s, e) => (s, if (e < 0) upTo else e) }
          .filter(p => p._2 > p._1).sortBy(_._1)
        var cov = 0L; var end = Long.MinValue
        iv.foreach { case (s, e) =>
          if (s > end) { cov += e - s; end = e }
          else if (e > end) { cov += e - end; end = e }
        }
        cov
      }
    }

    // warmup: JIT + codegen + parquet reader init
    try SparkEntry.queries("q14_summary_stats")(spark, sfDir).count()
    catch { case _: Throwable => () }
    Bench.calibrate(spark)
    println(f"[pj] calib_s ${math.min(Bench.calibrate(spark), Bench.calibrate(spark))}%.3f")

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(n.startsWith))
    for (name <- names) {
      val rec = new Rec
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count(): Unit
      catch { case e: Throwable =>
        println(s"[pj] $name FAILED: ${e.getMessage}") }
      val wallMs = (System.nanoTime() - t0) / 1000000
      // listener bus is async — let it drain before reading counters
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(rec)
      val cov = rec.coveredMs(System.currentTimeMillis())
      println(f"[pj] $name%-34s wall=${wallMs / 1000.0}%7.2fs " +
        f"jobs=${rec.jobs.size}%4d stages=${rec.stages}%4d " +
        f"jobcov=${cov / 1000.0}%7.2fs gap=${(wallMs - cov) / 1000.0}%7.2fs " +
        f"tasksum=${rec.taskMs / 1000.0}%8.2fs")
      if (detail) {
        // group job wall time by call site: which actions pay
        rec.jobs.toSeq.groupBy(p => rec.sites.getOrElse(p._1, "?"))
          .map { case (site, js) =>
            (site, js.size,
              js.map(p => math.max(0L, p._2._2 - p._2._1)).sum) }
          .toSeq.sortBy(-_._3).take(14)
          .foreach { case (site, n, ms) =>
            println(f"[pj]   $site%-46s n=$n%4d ${ms / 1000.0}%7.2fs") }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
