package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Double, Long)*) =
    rows.toDF("symbol", "date", "close", "version")

  test("upsert: newer version wins per key, old rows survive") {
    val existing = batch(("A", "2024-01-01", 10.0, 0L), ("A", "2024-01-02", 11.0, 0L))
    val incoming = batch(("A", "2024-01-02", 99.0, 1L), ("A", "2024-01-03", 12.0, 1L))
    val out = Merge.upsert(existing, incoming, Seq("symbol", "date"), "version")
      .select($"date", $"close").as[(String, Double)].collect().toSet
    assert(out == Set(("2024-01-01", 10.0), ("2024-01-02", 99.0), ("2024-01-03", 12.0)))
  }

  test("upsert is idempotent: merging the same batch twice changes nothing") {
    val b = batch(("A", "2024-01-01", 10.0, 1L), ("B", "2024-01-01", 20.0, 1L))
    val once = Merge.upsert(b, b, Seq("symbol", "date"), "version")
    assert(once.count() == 2)
    val twice = Merge.upsert(once, b, Seq("symbol", "date"), "version")
    assert(rowsOf(twice.select("symbol", "date", "close")) ==
      rowsOf(b.select("symbol", "date", "close")))
  }

  test("keepLatest honours explicit tiebreaks deterministically") {
    val df = Seq(("A", "2024-01-01", 1.0, 5L), ("A", "2024-01-01", 2.0, 5L))
      .toDF("symbol", "date", "close", "v")
    val kept = Merge.keepLatest(df, Seq("symbol", "date"), struct($"v", $"close"))
      .select($"close").as[Double].collect().toSeq
    assert(kept == Seq(2.0)) // equal version -> higher close wins
  }

  test("keepLatestInSeries picks the same winners as keepLatest") {
    val df = Seq(
      ("A", "2024-01-01", 1.0, 1L), ("A", "2024-01-01", 2.0, 3L),
      ("A", "2024-01-01", 9.0, 2L), ("A", "2024-01-02", 4.0, 1L),
      ("B", "2024-01-01", 5.0, 2L), ("B", "2024-01-01", 6.0, 2L))
      .toDF("symbol", "date", "close", "v")
    val viaAgg = Merge.keepLatest(df, Seq("symbol", "date"),
      struct($"v", $"close"))
      .select($"symbol", $"date", $"close", $"v").collect().toSet
    val viaWindow = Merge.keepLatestInSeries(df, Seq("symbol"), Seq("date"),
      struct($"v", $"close"))
      .select($"symbol", $"date", $"close", $"v").collect().toSet
    assert(viaWindow == viaAgg)
    assert(viaWindow.size == 3)
  }

  test("upsertIntoPath only rewrites touched date partitions") {
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/prices"
      val b0 = batch(("A", "2024-01-01", 10.0, 0L), ("A", "2024-01-02", 11.0, 0L))
      b0.write.partitionBy("date").parquet(path)
      val day1 = new java.io.File(s"$path/date=2024-01-01")
      val before = day1.listFiles().map(f => (f.getName, f.lastModified)).toSet

      val inc = batch(("A", "2024-01-02", 99.0, 1L))
      Merge.upsertIntoPath(inc, path, Seq("symbol", "date"), "version", "date")

      val after = day1.listFiles().map(f => (f.getName, f.lastModified)).toSet
      assert(before == after, "untouched partition must not be rewritten")
      val out = spark.read.parquet(path)
        .select($"date".cast("string"), $"close").as[(String, Double)].collect().toSet
      assert(out == Set(("2024-01-01", 10.0), ("2024-01-02", 99.0)))
    }
  }

  test("a merge that fails mid-write leaves the table intact and readable") {
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/prices"
      val b0 = batch(("A", "2024-01-01", 10.0, 0L), ("A", "2024-01-02", 11.0, 0L))
      Merge.upsertIntoPath(b0, path, Seq("symbol", "date"), "version", "date")
      val before = spark.read.parquet(path)
        .select($"date".cast("string"), $"close").as[(String, Double)].collect().toSet

      // incoming batch that detonates during task execution — the write
      // job fails after tasks have started producing output
      val bomb = batch(("A", "2024-01-02", 99.0, 1L), ("A", "2024-01-03", 12.0, 1L))
        .withColumn("close",
          when($"close" === 12.0, raise_error(lit("disk full"))).otherwise($"close"))
      intercept[Exception] {
        Merge.upsertIntoPath(bomb, path, Seq("symbol", "date"), "version", "date")
      }

      // dynamic partition overwrite only swaps partitions at job commit,
      // so the failed job must leave every original row readable
      val after = spark.read.parquet(path)
        .select($"date".cast("string"), $"close").as[(String, Double)].collect().toSet
      assert(after == before, "failed merge must not corrupt the table")
    }
  }

  test("a transient read failure aborts the merge instead of replacing the table") {
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/prices"
      val b0 = batch(("A", "2024-01-01", 10.0, 0L))
      Merge.upsertIntoPath(b0, path, Seq("symbol", "date"), "version", "date")
      // corrupt the store: an unreadable footer is NOT path-not-found, so
      // the probe must propagate instead of treating the table as absent
      // (which would silently drop history)
      val part = new java.io.File(s"$path/date=2024-01-01")
      part.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val w = new java.io.FileOutputStream(f); w.write(Array.fill(8)(0x00.toByte)); w.close()
      }
      val inc = batch(("A", "2024-01-02", 11.0, 1L))
      intercept[Exception] {
        Merge.upsertIntoPath(inc, path, Seq("symbol", "date"), "version", "date")
      }
      // the (corrupt) original bytes are still there — nothing was replaced
      assert(part.listFiles().exists(_.getName.endsWith(".parquet")))
    }
  }

  test("reconcile: exact cent classification with tolerance, missing keys both ways") {
    val a = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 400L))
      .toDF("k", "cents")
    val b = Seq((1L, 100L), (2L, 203L), (3L, 400L), (5L, 7L))
      .toDF("k", "cents")
    val out = Merge.reconcile(a, b, Seq("k"), "cents", 5L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out == Map(
      "equal" -> (("equal", 1L, 0L)),
      "within_tol" -> (("within_tol", 1L, 3L)),
      "mismatch" -> (("mismatch", 1L, 100L)),
      "missing_in_b" -> (("missing_in_b", 1L, 0L)),
      "missing_in_a" -> (("missing_in_a", 1L, 0L))))
  }

  test("schemaDiff: added/removed/type_changed/unchanged classification") {
    import org.apache.spark.sql.functions.{col, lit}
    val a = Seq((1L, "x", 2.0)).toDF("id", "s", "v")
    val b = a.drop("s").withColumn("v", col("v").cast("float"))
      .withColumn("extra", lit(true))
    val out = Merge.schemaDiff(a, b)
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id") == (("id", "unchanged", "bigint", "bigint")))
    assert(out("s") == (("s", "removed", "string", "")))
    assert(out("v") == (("v", "type_changed", "double", "float")))
    assert(out("extra") == (("extra", "added", "", "boolean")))
  }

}
