package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** VERDICT r10 task 2: stage-level profile of q67_dedup_keep_best.
  * Times the three stages in isolation (each materialized with
  * toRdd.count, caches cleared between stages) so the 4-round ~5 s
  * plateau can be attributed: (1) shingling + prefix-filter pair join,
  * (2) duplicateClusters label propagation, (3) keep-best winner agg +
  * semi-join. Stage 2/3 inputs are materialized first so each number
  * is that stage's own cost, not its upstream's.
  */
object ProfileQ67 {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the JVM/codegen paths on a cheap query first
    SparkEntry.queries("q14_summary_stats")(spark, sfDir).count()
    Bench.calibrate(spark)
    println(f"calib_s ${math.min(Bench.calibrate(spark), Bench.calibrate(spark))}%.3f")

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val dup = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .repartition(spark.sessionState.conf.numShufflePartitions)
      // near-dup copy offset: far above any plausible doc_id (ADVICE
      // r11: a hardcoded +10000 collides with real ids once the fixture
      // exceeds 10k documents, silently skewing the pair stage)
      val corpus = dup.unionByName(dup.select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" zz9 qq8")).as("text"))).persist()
      time("stage0 corpus materialize")(corpus.count())

      val shingled = corpus.select(col("doc_id").as("id"),
        Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs")).persist()
      time("stage1a shingling")(shingled.count())

      val pairs = Dedup.jaccardPairsPrefixHashed(shingled, "id", "hs", 0.5)
        .select(col("id_a"), col("id_b")).persist()
      time("stage1b prefix pair join")(pairs.count())

      val clusters = time("stage2 duplicateClusters")(
        Dedup.duplicateClusters(pairs))
      time("stage2 clusters materialize")(clusters.count())

      time("stage3 keep-best agg + semi-join")(
        Dedup.dedupByClustersBest(corpus, "doc_id", pairs,
            Text.bpeTokenCount(col("text")))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).cast("long").as("id_sum"))
          .queryExecution.toRdd.count())

      time("whole q67 as shipped")(
        SparkEntry.queries("q67_dedup_keep_best")(spark, sfDir)
          .queryExecution.toRdd.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
