package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch cost probe for the three INDEX-READING dedup streams
  * (VERDICT r12 task 3): every micro-batch of `dedupStream` /
  * `lshDedupStream` / `annDedupStream` reads the accumulated corpus
  * (or index) snapshot, so at a FIXED increment size the question is
  * whether per-batch wall time tracks the increment (index read
  * amortized by pruning/compaction) or grows with corpus age. This
  * main feeds each pipeline `nBatches` equal-size, content-distinct
  * increments (doc_id % nBatches split — near-zero true duplicates,
  * so pair work stays flat and any growth is the snapshot side) and
  * prints one JSON line per pipeline with the per-batch seconds
  * measured INSIDE foreachBatch (state machinery excluded).
  *
  * Usage: runMain graft.StreamProbe <sfDir> [nBatches=16] [compactEvery=8]
  * Run once with compaction on and once with 0 to see the cadence's
  * effect on the manifest-read tail.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 16
    val compactEvery = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-sprobe")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val fs = f.listFiles(); if (fs != null) fs.foreach(rm)
        f.delete(): Unit
      }
      rm(root.toFile)
    }))
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(root, tag)
        .toFile.getAbsolutePath

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<float>").as("vec"))
    def split(df: org.apache.spark.sql.DataFrame) =
      (0 until nBatches).map(i => df.filter(col("doc_id") % nBatches === i))

    def run(name: String, body: ((Long, Double) => Unit) => Unit): Unit = {
      val times = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      body((b, s) => times.synchronized { times += ((b, s)): Unit })
      val bs = times.sortBy(_._1).map(_._2)
      val json = bs.map(s => f"$s%.3f").mkString("[", ",", "]")
      println(s"""{"metric":"stream_probe","pipeline":"$name",""" +
        s""""sf":"$sfDir","n_batches":$nBatches,""" +
        s""""compact_every":$compactEvery,"batch_s":$json}""")
    }

    run("dedupStream", onBatch => {
      val base = tmp("dedup")
      val in = SparkEntry.writeStreamBatches(split(docs), base)
      val schema = spark.read.parquet(in).schema
      graft.streaming.Streams.dedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in), s"$base/t", s"$base/ck",
        compactEvery = compactEvery, onBatch = onBatch)
    })
    run("lshDedupStream", onBatch => {
      val base = tmp("lsh")
      val in = SparkEntry.writeStreamBatches(split(docs), base)
      val schema = spark.read.parquet(in).schema
      graft.streaming.Streams.lshDedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in), s"$base/t", s"$base/idx", s"$base/ck",
        compactEvery = compactEvery, onBatch = onBatch)
    })
    run("annDedupStream", onBatch => {
      val base = tmp("ann")
      val in = SparkEntry.writeStreamBatches(split(vecs), base)
      val schema = spark.read.parquet(in).schema
      graft.streaming.Streams.annDedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in), s"$base/t", s"$base/model", s"$base/ck",
        threshold = 0.9, compactEvery = compactEvery,
        refreshFactor = 2.0, onBatch = onBatch)
    })
    spark.stop()
  }
}
