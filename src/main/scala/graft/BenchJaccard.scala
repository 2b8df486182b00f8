package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Measures the three Jaccard-pair plans head-to-head on the q28 input
  * (documents ∪ planted near-dups) at SPARK_GRAFT_SF_DIR: the inverted
  * join with and without df==1 singleton pruning, and the PPJoin prefix
  * variant. Decides NOTES' ">20% win" gate with data, not guesses.
  */
object BenchJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zz9 qq8")).as("text")))
        .select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
    }
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "inverted" -> (() => Dedup.jaccardPairsHashed(docs, "id", "hs", 0.5)),
      "prefix"   -> (() => Dedup.jaccardPairsPrefixHashed(docs, "id", "hs", 0.5)))
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
