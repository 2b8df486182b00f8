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

  test("paddingWaste: both strategies replay a local brute force; " +
      "sorted batching never wastes more than shuffled here") {
    import graft.ops.Packing
    val lens = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 40L)
    val docs = lens.zipWithIndex.map { case (l, i) => (i * 7L, l) }
      .toDF("id", "len")
    val got = Packing.paddingWaste(docs, $"id", $"len", 4)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(15), 16)
    def replay(order: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val batches = order.grouped(4).toSeq
      val tot = order.map(_._2).sum
      val padded = batches.map(b => b.map(_._2).max * b.size).sum
      (order.size.toLong, batches.size.toLong, tot, padded,
        (padded - tot) * 1000000L / padded)
    }
    val rows = lens.zipWithIndex.map { case (l, i) => (i * 7L, l) }
    val sortedExp = replay(rows.sortBy { case (id, l) => (l, id) })
    val shufExp = replay(rows.sortBy { case (id, _) => (h(id), id) })
    assert(got("sorted") == (("sorted", sortedExp._1, sortedExp._2,
      sortedExp._3, sortedExp._4, sortedExp._5)))
    assert(got("shuffled") == (("shuffled", shufExp._1, shufExp._2,
      shufExp._3, shufExp._4, shufExp._5)))
    assert(got("sorted")._6 <= got("shuffled")._6,
      "the length-40 outlier must hurt shuffled batching more")
  }
}
