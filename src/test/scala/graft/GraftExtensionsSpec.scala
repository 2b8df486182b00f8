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
    val ic = session.sql(
      "SELECT intersect_count(array(3L, 1L, 2L, 2L), array(2L, 5L, 3L))")
      .collect()(0)
    assert(ic.getInt(0) == 2) // {2, 3} — duplicates count once
  }

  test("unicode_norm matches java.text.Normalizer on every form, " +
      "keeps nulls, and is idempotent; SQL registration works") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.NativeFunctions
    // composed, decomposed, compat (ﬁ ligature U+FB01, ² U+00B2),
    // mixed marks, plain ascii, empty, null
    val rows = Seq("caf\u00e9", "cafe\u0301", "nai\u0308ve na\u00efve",
      "\ufb01le x\u00b2", "plain ascii", "",
      "a\u0300\u0316 stacked", null)
    val df = rows.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(NativeFunctions.unicodeNorm($"s", form))
        .as[Option[String]].collect()
      val want = rows.map(s => Option(s).map(
        java.text.Normalizer.normalize(_,
          java.text.Normalizer.Form.valueOf(form))))
      assert(got.toSeq == want, s"form $form")
      // idempotence: normalizing twice is the identity
      val twice = df.select(NativeFunctions.unicodeNorm(
        NativeFunctions.unicodeNorm($"s", form), form))
        .as[Option[String]].collect()
      assert(twice.toSeq == got.toSeq, s"$form not idempotent")
    }
    // the dedup property the gate leans on: NFC folds the composed
    // and decomposed spellings to one byte string
    val folded = Seq(("caf\u00e9", "cafe\u0301")).toDF("a", "b")
      .select(NativeFunctions.unicodeNorm($"a", "NFC") ===
        NativeFunctions.unicodeNorm($"b", "NFC")).as[Boolean].head()
    assert(folded)
    // SQL face via the extensions injector
    val session = spark.newSession()
    org.apache.spark.sql.graftshim.GraftExtensionsShim.applyTo(session)
    val viaSql = session.sql(
      "SELECT unicode_norm('cafe\u0301', 'NFC') = 'caf\u00e9'")
      .collect()(0).getBoolean(0)
    assert(viaSql)
    // unknown form fails loudly at construction
    intercept[IllegalArgumentException] {
      df.select(NativeFunctions.unicodeNorm($"s", "NFX")).collect()
    }
  }

  test("intersect_count equals size(array_intersect) on random long " +
      "arrays with duplicates, empties and disjoint sets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val rows = (1 to 300).map { _ =>
      def arr(n: Int) = Seq.fill(n)(rnd.nextInt(40).toLong)
      (arr(rnd.nextInt(60)), arr(rnd.nextInt(60)))
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+
      ((Seq(100L, 101L), Seq(200L, 201L)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        graft.functions.NativeFunctions.intersectCountLong($"a", $"b")
          .as("native"),
        size(array_intersect($"a", $"b")).as("builtin"))
      .filter($"native" =!= $"builtin")
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("BandedLevenshteinRule rewrites every comparison shape, results equal") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // RDD-backed (LogicalRDD), so ConvertToLocalRelation cannot fold
    // the whole projection away before the rewrite is observable
    val fixture = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq[(java.lang.Long, String, String)](
        (1L, "kitten", "sitting"), (2L, "abc", "abc"), (3L, "abc", "abd"),
        (4L, "", "ab"), (5L, null, "x"), (6L, "y", null),
        (7L, "short", "muchlongerstring"), (8L, "aa", "aaa")), 2))
      .toDF("id", "a", "b")
    val exprs = Seq(
      "levenshtein(a, b) <= 1", "1 >= levenshtein(a, b)",
      "levenshtein(a, b) < 2", "2 > levenshtein(a, b)",
      "levenshtein(a, b) = 3", "3 = levenshtein(a, b)",
      "levenshtein(a, b) > 1", "1 <= levenshtein(a, b)",
      "levenshtein(a, b) >= 2", "2 < levenshtein(a, b)")
    // plain session: rule off; rule session: injected via the
    // experimental hook (the in-process stand-in for the static
    // spark.sql.extensions conf)
    val before = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        before :+ graft.plans.BandedLevenshteinRule
      exprs.foreach { e =>
        val df = fixture.select($"id", expr(e).as("flag"))
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(optimized.contains("lev_within") &&
          !optimized.toLowerCase.contains("levenshtein("),
          s"'$e' not rewritten:\n$optimized")
        // equality vs the unrewritten evaluation, nulls included
        spark.experimental.extraOptimizations = before
        val plain = fixture.select($"id", expr(e).as("flag")).collect()
          .map(r => (r.getLong(0), Option(r.get(1)))).toSet
        spark.experimental.extraOptimizations =
          before :+ graft.plans.BandedLevenshteinRule
        val rewritten = df.collect()
          .map(r => (r.getLong(0), Option(r.get(1)))).toSet
        assert(rewritten == plain, s"'$e' diverged")
      }
      // negatives: projection without comparison, negative threshold,
      // and Spark's own 3-arg thresholded form stay untouched
      Seq("levenshtein(a, b)", "levenshtein(a, b) <= -1",
        "levenshtein(a, b, 2) <= 1").foreach { e =>
        val p = fixture.select(expr(e)).queryExecution.optimizedPlan.toString
        assert(!p.contains("lev_within"), s"'$e' wrongly rewritten:\n$p")
      }
    } finally spark.experimental.extraOptimizations = before
  }
}
