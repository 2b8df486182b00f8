package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{SuffixArray, Text}

/** Phase-level profiler for the suffix-array gates (q356–q358): times
  * corpus layout, each doubling round (via the tables' count), the LCP
  * descent, and the q358 coverage tail separately, at the gate's own
  * slice/partition settings. Args: [mod] [sfDir] (defaults 2,
  * SPARK_GRAFT_SF_DIR or sf0.1). The ProfileQ67 sibling.
  */
object ProfileSA {
  def main(args: Array[String]): Unit = {
    val mod = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = if (args.length > 1) args(1)
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
    def ph[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sa] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // per-round anatomy: one replicated doubling round, timed in its
    // three parts (pair-join+window plan, checkpoint, unresolved count)
    def anatomy(c: SuffixArray.Corpus): Unit = {
      import org.apache.spark.sql.expressions.Window
      var cur = c.positions.localCheckpoint(true)
      var len = 1L
      var unresolved = cur.filter(col("cnt") > 1).count()
      var round = 0
      while (unresolved > 0 && round < 10) {
        round += 1
        val t0 = System.nanoTime()
        val nxt = cur.select((col("gpos") - len).as("gpos"),
          col("rank").as("r2"))
        val un = cur.filter(col("cnt") > 1)
          .join(nxt, Seq("gpos"), "left")
          .withColumn("r2f", coalesce(col("r2"), lit(-1L)))
        val wg = Window.partitionBy(col("rank")).orderBy(col("r2f"))
        val upd = un
          .withColumn("below", count(lit(1)).over(
            wg.rangeBetween(Window.unboundedPreceding, -1)))
          .withColumn("ties", count(lit(1)).over(wg.rangeBetween(0, 0)))
          .select(col("gpos"), col("doc_id"), col("pos"), col("sent"),
            (col("rank") + col("below")).as("rank"),
            col("ties").as("cnt"))
        val next = cur.filter(col("cnt") === 1).unionByName(upd)
          .localCheckpoint(true)
        val t1 = System.nanoTime()
        cur.unpersist()
        cur = next
        len *= 2
        unresolved = cur.filter(col("cnt") > 1).count()
        val t2 = System.nanoTime()
        println(f"[sa] round $round len=$len%-4d ckpt=${(t1 - t0) / 1e9}%5.2f" +
          f" count=${(t2 - t1) / 1e9}%5.2f unresolved=$unresolved")
      }
      cur.unpersist()
    }
    // A/B knob for the stage-overhead hypothesis: the doubling rounds
    // are tiny-stage bound at gate scale — AQE's per-exchange replan
    // adds latency per round. Dev-tool only; the library never sets it.
    if (sys.env.contains("SPARK_GRAFT_SA_NOAQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (mod=$mod, parts=$parts) ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % mod === 0)
      val c = ph("corpus")(SuffixArray.corpus(docs, col("doc_id"),
        col("text")))
      if (sys.env.contains("SPARK_GRAFT_SA_ANATOMY")) anatomy(c)
      println(s"[sa] docs=${c.numDocs} slots=${c.numSlots} " +
        s"maxSlots=${c.maxSlots}")
      val b = ph("build")(SuffixArray.build(c))
      println(s"[sa] rounds=${b.tables.size - 1}")
      val lcps = ph("lcp-descent")(
        SuffixArray.adjacentLcp(b, c.numDocs).localCheckpoint(true))
      val nTok = docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      ph("coverage")(SuffixArray.dupSpanCoverage(lcps, nTok, 8L)
        .queryExecution.toRdd.count())
      ph("q356-tail")(b.sa.filter(!col("sent"))
        .select(col("doc_id"), (col("rank") - c.numDocs).as("r"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("sum_rank"))
        .queryExecution.toRdd.count())
      b.unpersistAll(); lcps.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
