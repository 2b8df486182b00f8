package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads (image/audio/video)
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages. The decode step is a STUB — media codecs are not available in
  * this environment — but it is a *deterministic* stub (byte arithmetic),
  * so the full pipeline (schema, batching, partitioning, feature shape)
  * is real and oracle-testable; swapping in a true JNI/ffmpeg decoder
  * changes one function body, not the plan.
  *
  * Scale posture: payloads never pass through a shuffle — metadata and
  * features are extracted in the scan stage (narrow, codegen'd column
  * exprs or one mapPartitions), and only the small typed outputs flow
  * downstream. At 100 TB the binary column stays in parquet, loaded
  * lazily per-row-group; feature extraction fuses with the scan.
  */
object Multimodal {

  /** A decoded media record: id + fixed-shape stub features. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
                                 checksum: Long, first_byte: Int)

  /** Typed metadata extracted without decoding: byte length and a
    * hex header prefix (magic-number sniffing in a real pipeline).
    */
  def withBlobMetadata(df: DataFrame, blob: Column): DataFrame =
    df.withColumn("n_bytes", octet_length(blob))
      .withColumn("header_hex", substring(hex(blob), 1, 16))

  /** Byte value at 1-based position i, via the hex encoding (engine
    * portable; avoids binary indexing differences).
    */
  def byteAt(blob: Column, i: Column): Column =
    conv(hex(blob).substr((i - 1) * 2 + 1, lit(2)), 16, 10).cast("int")

  /** Frame sampling: every `stride`-th window of `frameLen` bytes,
    * returned as hex strings (a real decoder would emit tensors). Pure
    * column expression — the sampling plan is identical with a real
    * codec behind it.
    */
  def sampleFrames(blob: Column, stride: Int, frameLen: Int): Column = {
    val h = hex(blob)
    val nFrames = greatest(floor((octet_length(blob) - frameLen) / stride) + 1, lit(0))
    when(octet_length(blob) < frameLen, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nFrames.cast("int") - 1),
        i => h.substr(i * (stride * 2) + 1, lit(frameLen * 2))))
  }

  /** Stub per-frame "feature": sum of the frame's byte values (a real
    * pipeline computes an embedding here). Deterministic → oracle-able.
    */
  def frameChecksum(frameHex: Column, frameLen: Int): Column =
    (1 to frameLen).map { i =>
      conv(substring(frameHex, (i - 1) * 2 + 1, 2), 16, 10).cast("long")
    }.reduce(_ + _)

  /** The mapPartitions decode path — the real plumbing a Pandas-UDF /
    * Arrow batch decoder would use on a Python stack: iterate a partition
    * of (id, payload) rows, run the (stubbed) decoder per payload, emit a
    * typed feature record. Batch shape: one partition in, one typed
    * Dataset out; no shuffle, no driver involvement.
    */
  def decodeFeatures(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { case (id, bytes) =>
      // STUB decoder: replace with a real codec (JNI/ffmpeg/JPEG) —
      // contract: Array[Byte] => fixed-shape features, no side effects.
      val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val first = if (bytes.nonEmpty) bytes(0) & 0xff else -1
      MediaFeatures(id, bytes.length, checksum, first)
    })
  }

  /** The pluggable decode SEAM: a codec turns one payload batch into
    * fixed-shape feature records. Implementations must be pure
    * (payload bytes → features, no side effects) and serializable —
    * the instance is constructed executor-side via the `open` factory
    * passed to [[decodeFeaturesBatched]], once per partition. A real
    * deployment implements this with JNI/ffmpeg/JPEG and changes
    * NOTHING else: the pipeline (schema, batching, partitioning) is
    * fixed, and MultimodalSpec proves output varies only through this
    * trait by swapping a second decoder in.
    */
  trait Decoder extends Serializable {
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures]
  }

  /** The (stub) default decoder with an expensive handle — stands in
    * for a JNI / ffmpeg / tokenizer context whose construction
    * dominates per-row costs if done naively. `open()` is what must be
    * amortized.
    */
  final class StubDecoder private () extends Decoder {
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
      batch.map { case (id, bytes) =>
        val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val first = if (bytes.nonEmpty) bytes(0) & 0xff else -1
        MediaFeatures(id, bytes.length, checksum, first)
      }
  }
  object StubDecoder {
    /** Executor-side open counter, observable from specs (local mode). */
    val opened = new java.util.concurrent.atomic.AtomicInteger(0)
    def open(): StubDecoder = { opened.incrementAndGet(); new StubDecoder }
  }

  /** Batched decode — the JVM face of the Arrow-batch (mapInArrow /
    * mapInPandas) contract a Python stack would use: the decoder handle
    * opens ONCE per partition, payloads stream through in bounded
    * batches (vectorization unit; also the memory bound — at most
    * `batchSize` payloads are resident per task), typed records come
    * out. Identical results to the per-row path; only the batching
    * shape differs.
    */
  def decodeFeaturesBatched(media: Dataset[(Long, Array[Byte])],
                            batchSize: Int = 64,
                            open: () => Decoder = () => StubDecoder.open())
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = open() // once per partition, NOT per row
      it.grouped(batchSize).flatMap(batch => decoder.decodeBatch(batch.toSeq))
    }
  }
}
