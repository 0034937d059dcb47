package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  test("edit1 blocking finds sub/ins/del pairs, rejects transpositions") {
    import spark.implicits._
    // cat~cut (substitution), cat~cats (insertion), cat~at (deletion),
    // ab~ba (transposition, distance 2 — shares deletion keys 'a','b'
    // so it IS a blocking candidate and must die in the verify step),
    // xyz (no neighbor)
    val names = Seq("cat", "cut", "cats", "at", "ab", "ba", "xyz")
      .toDF("name")
    val got = FuzzyJoin.edit1JoinOf(names)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("ab", "at"), // b→t substitution, also distance 1
      ("at", "cat"), ("cat", "cats"), ("cat", "cut")))
  }

  test("edit1 pairs on supplier names match a brute-force check") {
    val names = graft.Tables.supplier(spark, sfDir)
      .select("s_name").collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    val got = FuzzyJoin.edit1Join(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === want)
    assert(got.nonEmpty) // the dataset genuinely exercises the join
  }

  // Both physical strategies' whole claim is LOSSLESSNESS: each must
  // produce the same pair set as the full token self-join it avoids —
  // and the adaptive entry must agree with both.
  test("both cosine-join paths == brute-force token self-join referee") {
    import org.apache.spark.sql.functions._
    val t = 0.9
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val wn = FuzzyJoin.weightedVectors(spark, sfDir)
    val brute = pairs(wn.as("a").join(wn.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(round(sum(col("a.wn") * col("b.wn")), 6).as("sim"))
      .filter(col("sim") >= t))
    assert(brute.nonEmpty, "threshold too high — the referee is vacuous")

    val prefix = pairs(FuzzyJoin.cosinePrefixJoin(wn, t))
    assert(prefix === brute,
      s"prefix blocking dropped or invented pairs: " +
        s"only-prefix=${prefix -- brute}, only-brute=${brute -- prefix}")

    val allPairs = pairs(FuzzyJoin.cosineAllPairsJoin(wn, t))
    assert(allPairs === brute,
      s"blocked all-pairs dropped or invented pairs: " +
        s"only-ap=${allPairs -- brute}, only-brute=${brute -- allPairs}")

    val adaptive = pairs(FuzzyJoin.cosineJoin(spark, sfDir, t))
    spark.catalog.clearCache()
    assert(adaptive === brute, "adaptive entry diverged from the referee")
  }

  // The vector attach must not force a corpus-sized broadcast: under a
  // zero byte budget the SAME pair set must come back through the
  // shuffle (sort-merge) attach, and the plan must carry no broadcast
  // hint (AQE may still freely convert at runtime when actual sizes
  // are small — that's its call, made from real sizes, not ours).
  test("prefix-path attach is size-gated: shuffle attach == broadcast attach") {
    import org.apache.spark.sql.functions._
    val t = 0.9
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val wn = FuzzyJoin.weightedVectors(spark, sfDir)

    graft.Counters.clear()
    val viaBcast = FuzzyJoin.cosinePrefixJoin(wn, t,
      attachBudgetBytes = Long.MaxValue)
    assert(viaBcast.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "under-budget attach should carry explicit broadcast hints")
    val viaShuffle = FuzzyJoin.cosinePrefixJoin(wn, t, attachBudgetBytes = 0L)
    assert(!viaShuffle.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "over-budget attach must not force a broadcast")
    val c = graft.Counters.drain()
    assert(c.getOrElse("fuzzy_attach_broadcast", 0L) === 1L)
    assert(c.getOrElse("fuzzy_attach_shuffle", 0L) === 1L)

    val b = pairs(viaBcast)
    val s = pairs(viaShuffle)
    assert(b === s, "attach strategy changed the pair set")
    assert(b.nonEmpty)
    spark.catalog.clearCache()
  }

  // The Zipfian reshaped corpus must flip the adaptive decision to the
  // prefix path (the real synthetic corpus is template-heavy and always
  // takes all-pairs), and the result must match the brute-force token
  // self-join referee over the same reshaped frame.
  test("zipf variant takes the prefix path and matches the referee") {
    import org.apache.spark.sql.functions._
    val t = 0.75
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    graft.Counters.clear()
    val got = pairs(FuzzyJoin.cosineZipf(spark, sfDir, t))
    val c = graft.Counters.drain()
    assert(c.getOrElse("fuzzy_path_prefix", 0L) === 1L,
      s"estimator did not take the prefix path on the Zipfian corpus: $c")

    val wn = FuzzyJoin.weightedVectorsOf(FuzzyJoin.zipfCorpus(spark, sfDir))
    val brute = pairs(wn.as("a").join(wn.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(round(sum(col("a.wn") * col("b.wn")), 6).as("sim"))
      .filter(col("sim") >= t))
    assert(brute.nonEmpty, "zipf corpus yields no pairs — threshold too high")
    assert(got === brute)
    spark.catalog.clearCache()
  }

  test("empty corpus short-circuits to an empty pair frame (no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = FuzzyJoin.cosineJoinOf(spark, empty, 0.9)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("doc_a", "doc_b", "sim"))
  }
}
