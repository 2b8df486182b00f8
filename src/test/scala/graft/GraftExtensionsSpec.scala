package graft

class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects every native function into a session registry") {
    // spark.sql.extensions is a STATIC conf — it binds at SparkContext
    // creation, which the suite-shared context predates — so exercise
    // the injection body exactly the way Spark's bootstrap does:
    // build the extensions, apply the injector, register into the
    // session's function registry.
    val session = spark.newSession()
    org.apache.spark.sql.graftshim.GraftExtensionsShim.applyTo(session)
    val r = session.sql(
      """SELECT
        |  cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  simhash(array('a', 'b'), 32) AS sh,
        |  size(hashed_shingles(array('a', 'b', 'c', 'd'), 3)) AS nsh,
        |  size(minhash_sig(hashed_shingles(array('a', 'b', 'c', 'd'), 3), 16)) AS k
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 2) // "a b c", "b c d"
    assert(r.getInt(3) == 16)
  }
}
