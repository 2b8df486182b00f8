package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Measures the Jaccard-pair plans head-to-head on the q28 input
  * (documents ∪ planted near-dups) at SPARK_GRAFT_SF_DIR: the inverted
  * join and the PPJoin prefix variant. Decides NOTES' ">20% win" gate
  * with data, not guesses.
  *
  * SPARK_GRAFT_SKEW=1 appends the same boilerplate phrase to EVERY doc
  * (footer/header text, the real-corpus skew mode): each boilerplate
  * shingle then has df = n_docs, so the inverted join's candidate
  * stream gains Σ C(df,2) ≈ shingles·n²/2 rows while the prefix path —
  * which never indexes hot shingles — is unaffected. Run at sf0.01
  * unless you have time to watch the inverted variant suffer.
  */
object BenchJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val skew = sys.env.get("SPARK_GRAFT_SKEW").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = {
      val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val d =
        if (!skew) d0
        else d0.select(col("doc_id"), concat(col("text"),
          lit(" subscribe to our newsletter terms of service apply " +
            "all rights reserved")).as("text"))
      d.unionByName(d.select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" zz9 qq8")).as("text")))
        .select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
    }
    // prefix first: under SKEW the inverted warmup would be the very
    // blowup being demonstrated
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "prefix"   -> (() => Dedup.jaccardPairsPrefixHashed(docs, "id", "hs", 0.5)),
      "inverted" -> (() => Dedup.jaccardPairsHashed(docs, "id", "hs", 0.5)))
    // warmup
    variants.head._2().count()
    spark.catalog.clearCache()
    for (r <- 1 to runs; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      val n = fn().count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"run$r $name%-20s $dt%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
