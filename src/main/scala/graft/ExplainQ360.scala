package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{SuffixArray, Text}

/** Dev tool (r16): q360's shipped query localCheckpoints its match
  * frame, so `Explain` shows only the post-checkpoint tail — this main
  * dumps the LAZY plan of the match frame itself for both the former
  * full-rebuild screen (build + adjacentLcp + longestCrossMatch) and
  * the r16 probe-index screen (buildTo(train, 8) + probeFaces +
  * decontaminateIncrement), so the plan delta the round doc claims is
  * checkable. Usage: runMain graft.ExplainQ360 [before|after]
  */
object ExplainQ360 {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "after"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = Tables(spark, dir, "documents")
    val m =
      if (which == "before") {
        val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
        val b = SuffixArray.build(c)
        SuffixArray.longestCrossMatch(b, c.numDocs, d => d % 2 === 0)
      } else {
        val train = docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"))
        val ev = docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text"))
        val c = SuffixArray.corpus(train, col("doc_id"), col("text"))
        val b = SuffixArray.buildTo(c, 8L)
        SuffixArray.decontaminateIncrement(
          SuffixArray.probeFaces(c, b, 8L), ev, materializeLevels = true)
      }
    val nTok = (if (which == "before")
        docs.filter(col("doc_id") % 2 === 1)
      else docs.filter(col("doc_id") % 2 === 1))
      .select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    val out = m.groupBy(col("doc_id"))
      .agg(max(col("train_match")).as("longest_train_match"),
        sum(when(col("train_match") >= 8, lit(1L)).otherwise(lit(0L)))
          .as("contaminated_starts"))
      .join(nTok, "doc_id")
      .filter(col("longest_train_match") >= 8)
      .orderBy(col("longest_train_match").desc, col("doc_id"))
      .limit(50)
    println(s"===================== q360 lazy [$which] =====================")
    println(out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
