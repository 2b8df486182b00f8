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
}
