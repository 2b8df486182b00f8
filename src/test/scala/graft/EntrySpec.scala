package graft

/** The driver's smoke contract: `SparkEntry.entry(spark)` on sf0.001
  * must return rows. Pinned here so a refactor can't silently break the
  * per-round gate.
  */
class EntrySpec extends SparkSpec {
  test("entry() produces a non-empty flagship result on the smoke fixture") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.nonEmpty)
    assert(df.count() > 0, "driver smoke-checks rows > 0")
  }

  test("entry() honors the fixture-dir override (SPARK_GRAFT_ENTRY_DIR seam)") {
    withTempDir { dir =>
      // a COPIED fixture dir: only the table entry() scans, new path
      val copy = new java.io.File(dir, "fixture")
      copy.mkdirs()
      val src = java.nio.file.Paths.get("/root/testdata/sf0.001/lineitem.parquet")
      java.nio.file.Files.walk(src).forEach { p =>
        val dst = copy.toPath.resolve("lineitem.parquet")
          .resolve(src.relativize(p).toString)
        java.nio.file.Files.createDirectories(dst.getParent)
        if (!java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.copy(p, dst)
      }
      // SPARK_GRAFT_ENTRY_DIR feeds entryFrom's dir parameter and
      // nothing else (see entry()); redirecting that parameter at the
      // copy must reproduce the default run exactly
      val redirected = SparkEntry.entryFrom(spark, copy.getAbsolutePath)
      val default = SparkEntry.entry(spark)
      assert(redirected.count() == default.count() && default.count() > 0)
      assert(redirected.exceptAll(default).isEmpty &&
        default.exceptAll(redirected).isEmpty,
        "the override must fully determine the scanned input")
    }
  }

  test("every query has an oracle and every oracle a query — the " +
      "correctness gate covers the full surface") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"orphan oracles: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert(q.size >= 511, s"query surface shrank: ${q.size}")
  }
}
