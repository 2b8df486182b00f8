package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SuffixArray

/** Cost probe for the INCREMENTAL exact-substring tier (q373): against
  * one persisted train index, replay B successive increment batches
  * (disjoint 1-in-(10·B) slices of the train docs, near-copied with
  * two appended tokens — the docsDup convention) and time each batch's
  * probe → candidates → scoped rebuild → rollup end to end; then time
  * the FULL train∪batch rebuild once for the same last batch. The
  * incremental claim is two readings: per-batch cost stays flat as
  * batches accumulate (each batch probes the same index; nothing
  * recomputes old×old), and a batch costs a fraction of the full
  * rebuild it replaces. Args: [mod] [batches] [sfDir]
  * (defaults 2, 4, SPARK_GRAFT_SF_DIR or sf0.1); the ProfileSA sibling.
  */
object ProfileSAIncrement {
  def main(args: Array[String]): Unit = {
    val mod = if (args.nonEmpty) args(0).toInt else 2
    val batches = if (args.length > 1) args(1).toInt else 4
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SA_PARTS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val idx = java.nio.file.Files.createTempDirectory("sa-inc-probe-")
      .toFile.getAbsolutePath + "/sa_index"
    val train = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id"), col("text"))
    def batch(i: Int) = train
      .filter(col("doc_id") % (10L * batches) === i * 10L)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(col("text"), lit(" zz9 qq8")).as("text"))
    val (_, tBuild) = timed {
      val c = SuffixArray.corpus(train, col("doc_id"), col("text"))
      // a threshold-8 probe index needs 3 doubling rounds, not the
      // full distinctness ceiling (buildTo; NOTES 123)
      val b = SuffixArray.buildTo(c, 8L)
      SuffixArray.persistProbeIndex(c, b, idx, 8L)
      b.unpersistAll()
    }
    println(f"[sa-inc] index build+persist ${tBuild}%7.2f s " +
      s"(mod=$mod, parts=$parts)")
    def rollup(m: org.apache.spark.sql.DataFrame): Long =
      m.groupBy(col("doc_id"))
        .agg(max(col("train_match")).as("lm"))
        .filter(col("lm") >= 8).count()
    // the production shape: faces load + pin once, every batch reuses
    val index = SuffixArray.loadProbeIndex(spark, idx, 8L)
    for (i <- 0 until batches) {
      val (n, tb) = timed {
        rollup(SuffixArray.decontaminateIncrement(index, batch(i)))
      }
      println(f"[sa-inc] batch $i probe+chain ${tb}%7.2f s " +
        s"(contaminated_docs=$n)")
    }
    index.unpersistAll()
    val (n, tFull) = timed {
      val all = train.unionByName(batch(batches - 1))
      val c = SuffixArray.corpus(all, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      val r = rollup(SuffixArray.longestCrossMatch(b, c.numDocs,
        d => d < 1000000000L))
      b.unpersistAll()
      r
    }
    println(f"[sa-inc] FULL rebuild (same last batch) ${tFull}%7.2f s " +
      s"(contaminated_docs=$n)")
    spark.stop()
  }
}
