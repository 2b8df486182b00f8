package graft

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[(Long, Long)] = Seq(
    (1L, 7L), (2L, 0L), (3L, 13L), (4L, 3L), (5L, 25L), (6L, 1L),
    (7L, 10L), (8L, 4L))

  test("sequencePacking matches a sequential concat-and-chunk " +
      "simulation: straddling docs, zero-length docs, partial tail") {
    val cap = 10L
    val got = Packing.sequencePacking(docs.toDF("doc_id", "n"), cap)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute: walk the stream
    val spans = docs.filter(_._2 > 0).sortBy(_._1)
      .foldLeft((0L, Seq.empty[(Long, Long, Long)])) {
        case ((off, acc), (id, n)) =>
          (off + n, acc :+ ((id, off / cap, (off + n - 1) / cap)))
      }._2
    val total = docs.map(_._2).sum
    val expect = spans.flatMap { case (id, s, e) =>
      (s to e).map(q => (q, id, s))
    }.groupBy(_._1).map { case (q, rows) =>
      (q, rows.size.toLong, rows.count(_._3 == q).toLong,
        rows.map(_._2).min, math.min(cap, total - q * cap))
    }.toSet
    assert(got == expect)
    // every token lands exactly once: filled sums to the total
    assert(got.toSeq.map(_._5).sum == total)
    // doc 5 (25 tokens) straddles >= 3 sequences
    assert(got.count(r => r._1 >= 2) >= 2)
  }

  test("stripedBinPacking: (len desc, id) rank striping, exact loads " +
      "and measured overflow") {
    val cap = 15L
    val got = Packing.stripedBinPacking(docs.toDF("doc_id", "n"), cap)
      .as[(Long, Long, Long, Long)].collect().toSet
    val total = docs.map(_._2).sum
    val nb = math.ceil(total.toDouble / cap).toLong
    val ranked = docs.sortBy { case (id, n) => (-n, id) }.zipWithIndex
    val expect = ranked.groupBy(_._2 % nb).map { case (b, rows) =>
      val tok = rows.map(_._1._2).sum
      (b, rows.size.toLong, tok, math.max(0L, tok - cap))
    }.toSet
    assert(got == expect)
  }
}
