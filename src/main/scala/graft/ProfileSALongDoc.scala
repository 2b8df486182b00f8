package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SuffixArray

/** Long-document probe for the suffix-array round-ceiling claim
  * (⌈log₂ max-doc-slots⌉, NEVER log₂ corpus): the same token mass laid
  * out as normal documents vs MEGA-documents (id-ordered groups of
  * `grp` concatenated into one doc, 100× the max doc length) — the
  * doubling rounds may grow by ~log₂ grp, and the wall must track the
  * ROUNDS (remaining tie mass per round), not explode with document
  * length. Args: [mod] [grp] [sfDir] (defaults 2, 100,
  * SPARK_GRAFT_SF_DIR or sf0.1). The ProfileSA sibling.
  */
object ProfileSALongDoc {
  def main(args: Array[String]): Unit = {
    val mod = if (args.nonEmpty) args(0).toInt else 2
    val grp = if (args.length > 1) args(1).toLong else 100L
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
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id"), col("text"))
    for (g <- Seq(1L, grp)) {
      val docs =
        if (g == 1L) base
        else base
          .groupBy((col("doc_id") - pmod(col("doc_id"), lit(g)))
            .as("doc_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("doc_id").as("i"),
              col("text").as("t")))),
            x => x.getField("t")), " ").as("text"))
      val t0 = System.nanoTime()
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      val wall = (System.nanoTime() - t0) / 1e9
      val ceil = math.ceil(math.log(c.maxSlots.toDouble) /
        math.log(2.0)).toInt
      println(f"[sa-long] grp=$g%-4d docs=${c.numDocs}%-6d " +
        f"slots=${c.numSlots}%-8d maxSlots=${c.maxSlots}%-7d " +
        f"ceil=$ceil%-3d rounds=${b.tables.size - 1}%-3d " +
        f"build=${wall}%7.2f s")
      b.unpersistAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
