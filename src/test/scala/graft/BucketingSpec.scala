package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Bucketing — the co-located-join tool for repeated big joins at
  * scale: both tables pre-hashed into the same bucket layout on the
  * join key join WITHOUT a shuffle on either side.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val n = 10000
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — clear them or CTAS refuses
    for (t <- Seq("b_facts", "b_dims")) {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    (1 to n).map(i => (i % 500, i.toDouble)).toDF("symbol", "px")
      .write.bucketBy(8, "symbol").sortBy("symbol")
      .mode("overwrite").saveAsTable("b_facts")
    (0 until 500).map(i => (i, s"name$i")).toDF("symbol", "name")
      .write.bucketBy(8, "symbol").sortBy("symbol")
      .mode("overwrite").saveAsTable("b_dims")

    val joined = spark.table("b_facts")
      .join(spark.table("b_dims").hint("merge"), Seq("symbol"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$p")
    assert(joined.count() == n)
  }
}
