package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, Text}

/** Empirical scale probe for the r14-new candidate-generation tiers
  * (r14 verdict optional 9a), in the sa_scale_probe style: run the
  * kernel at an sf dir and at its gen_scale_fixture.py replication,
  * record seconds + row counts, append one bench_history entry by
  * hand. Kernels:
  *  - `oph`: one-permutation-hashing signatures (k=32) over ALL
  *    documents' distinct-token element hashes, then the banded
  *    candidate join (8 bands) — both should scale ~linearly in
  *    corpus tokens (signature) and bucket mass (pairs).
  *  - `maxsim`: late-interaction MaxSim retrieval (m=4, k=5) with the
  *    query panel HELD FIXED (ids ≤ cap, the source dir's originals)
  *    while the doc side grows — cost should scale ~linearly in docs.
  * Args: kernel sfDir [capForMaxsimPanel]. Two timed runs per phase
  * (per-query min policy).
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val kernel = args(0)
    val sfDir = args(1)
    val cap = if (args.length > 2) args(2).toLong else Long.MaxValue
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.calibrate(spark)
    println(f"calib_s ${math.min(Bench.calibrate(spark), Bench.calibrate(spark))}%.3f")
    def ph(tag: String)(f: => Long): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale] $kernel $tag run$r ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
    }
    kernel match {
      case "oph" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val elems = docs.select(col("doc_id").as("id"),
            explode(array_distinct(Text.tokens(col("text")))).as("tok"))
          .select(col("id"), Dedup.hashLong(col("tok")).as("h"))
        println(s"[scale] oph corpus elems=${elems.count()}")
        ph("signature") {
          Dedup.ophDensifiedSignature(elems, col("id"), col("h"), 32)
            .count()
        }
        val sig = Dedup.ophDensifiedSignature(elems, col("id"),
          col("h"), 32).persist()
        sig.count()
        ph("bands") { Dedup.ophCandidatePairs(sig, 32, 8).count() }
        ph("bands_cap256") {
          Dedup.ophCandidatePairs(sig, 32, 8, maxBucket = 256).count()
        }
        sig.unpersist(): Unit
      case "maxsim" =>
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        def dd(c: org.apache.spark.sql.Column) =
          transform(c, x => x.cast("double"))
        val queries = e.filter(col("vec_id") % 89 === 0 &&
            col("vec_id") <= cap)
          .select(col("vec_id").as("id"), dd(col("embedding")).as("vec"))
        val corpus = e.select(col("vec_id").as("id"),
          dd(col("embedding")).as("vec"))
        println(s"[scale] maxsim panel=${queries.count()} docs=${corpus.count()}")
        ph("maxsim") {
          Similarity.lateInteractionTopK(queries, corpus, 4, 5).count()
        }
      case other => sys.error(s"unknown kernel $other")
    }
    spark.stop()
  }
}
