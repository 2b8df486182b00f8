package graft
import org.apache.spark.sql.SparkSession

/** Iteration helper: time a subset of SparkEntry.queries (args = query
  * names; default prefix-match). Same session config as Bench; prints
  * per-query seconds for `runs` passes (env SPARK_GRAFT_RUNS, default 2)
  * so plan changes can be measured without the full 67-query sweep.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q14_summary_stats")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // same host-speed probe as the full bench, so subset measurements
    // are comparable across sessions/hosts
    Bench.calibrate(spark)
    println(f"calib_s ${math.min(Bench.calibrate(spark), Bench.calibrate(spark))}%.3f")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.startsWith))
    for (r <- 1 to runs; name <- names) {
      val t0 = System.nanoTime()
      // toRdd.count(): execute the plan as-is — see Bench.scala (plain
      // count() prunes row-preserving final operators)
      val n = try SparkEntry.queries(name)(spark, sfDir)
                    .queryExecution.toRdd.count()
              catch { case e: Throwable => println(s"$name FAILED: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"run$r $name%-28s $dt%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
