package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("blob metadata: byte length and hex header") {
    val r = Multimodal.withBlobMetadata(
        Seq("ABCD").toDF("text"), $"text".cast("binary"))
      .select($"n_bytes", $"header_hex").as[(Int, String)].head()
    assert(r == ((4, "41424344")))
  }

  test("byteAt decodes positional byte values") {
    val df = Seq("AZ").toDF("text")
    val r = df.select(
      Multimodal.byteAt($"text".cast("binary"), lit(1)),
      Multimodal.byteAt($"text".cast("binary"), lit(2))).as[(Int, Int)].head()
    assert(r == ((65, 90)))
  }

  test("sampleFrames: stride windows in hex; short payloads give none") {
    // 12 bytes, frameLen 4, stride 4 -> 3 frames
    val r = Seq("ABCDEFGHIJKL", "AB").toDF("text")
      .select(Multimodal.sampleFrames($"text".cast("binary"), 4, 4))
      .as[Seq[String]].collect().toSeq
    assert(r.head == Seq("41424344", "45464748", "494A4B4C"))
    assert(r(1) == Seq())
  }

  test("frameChecksum sums the frame's byte values") {
    val df = Seq("AB").toDF("text")
      .select(Multimodal.sampleFrames($"text".cast("binary"), 2, 2).as("f"))
    val r = df.select(Multimodal.frameChecksum(element_at($"f", 1), 2))
      .as[Long].head()
    assert(r == 65L + 66L)
  }

  test("decodeFeatures: typed mapPartitions stub decoder matches column math") {
    val media = Seq((1L, "ABC".getBytes("UTF-8")), (2L, Array.empty[Byte]))
      .toDS()
    val r = Multimodal.decodeFeatures(media).collect().map(f =>
      (f.doc_id, f.n_bytes, f.checksum, f.first_byte)).toSet
    assert(r == Set((1L, 3, 65L + 66L + 67L, 65), (2L, 0, 0L, -1)))
  }

  test("batched decode: one decoder open per partition, same results") {
    val media = spark.range(0, 100).map(i =>
      (i.toLong, s"payload-$i".getBytes("UTF-8"))).repartition(4)
    val perRow = Multimodal.decodeFeatures(media).collect().toSet
    Multimodal.StubDecoder.opened.set(0)
    val batched = Multimodal.decodeFeaturesBatched(media, batchSize = 8)
      .collect().toSet
    assert(batched == perRow)
    // 100 rows across 4 partitions, batch size 8: the decoder handle
    // opened once per PARTITION, never per row or per batch
    assert(Multimodal.StubDecoder.opened.get() == 4,
      s"opened ${Multimodal.StubDecoder.opened.get()} times")
  }

  test("decoder seam: swapping the codec changes output ONLY through the trait") {
    // a second "golden" decoder standing in for a real codec: same
    // contract, recognizably different features
    class GoldenDecoder extends Multimodal.Decoder {
      def decodeBatch(batch: Seq[(Long, Array[Byte])]) =
        batch.map { case (id, bytes) =>
          Multimodal.MediaFeatures(id, bytes.length, 4242L, 7)
        }
    }
    val media = spark.range(0, 40).map(i =>
      (i.toLong, s"payload-$i".getBytes("UTF-8"))).repartition(4)
    val stub = Multimodal.decodeFeaturesBatched(media, batchSize = 8)
    val golden = Multimodal.decodeFeaturesBatched(media, batchSize = 8,
      open = () => new GoldenDecoder)
    // the pipeline around the seam is unchanged: same schema, same row
    // set keyed by (doc_id, n_bytes) — only the decoder-computed
    // features differ, and exactly as the golden codec dictates
    assert(stub.schema == golden.schema)
    val s = stub.collect().map(f => f.doc_id -> f).toMap
    val g = golden.collect().map(f => f.doc_id -> f).toMap
    assert(s.keySet == g.keySet)
    assert(s.keySet.forall(id => s(id).n_bytes == g(id).n_bytes))
    assert(g.values.forall(f => f.checksum == 4242L && f.first_byte == 7))
    assert(s.values.forall(f => f.checksum != 4242L))
  }
}
