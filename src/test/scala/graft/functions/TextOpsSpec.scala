package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class TextOpsSpec extends SparkSpec {
  test("repetition fractions are consistent and bigram-safe on short docs") {
    val rep = TextOps.repetition(spark, sfDir)
    // top term can never cover more of the stream than exists, and a
    // doc with bigrams must have exactly n_tok - 1 of them
    val bad = rep.filter(
      col("top_tok") > col("n_tok") ||
        col("top_tok_frac") > 1.0 || col("top_tok_frac") <= 0.0 ||
        (col("n_bigram") > 0 && col("n_bigram") =!= col("n_tok") - 1) ||
        col("top_bigram_frac") > 1.0)
    assert(bad.count() === 0)
    assert(rep.count() === Tables.documents(spark, sfDir).count())
  }

  test("token counts are positive and bounded by char counts") {
    val bad = TextOps.tokenCount(spark, sfDir)
      .filter(col("n_tokens") <= 0 || col("n_tokens") > col("n_chars") + 1)
    assert(bad.count() === 0)
  }

  test("quality ratios live in [0,1]") {
    val bad = TextOps.qualityScore(spark, sfDir)
      .filter(col("distinct_ratio") < 0 || col("distinct_ratio") > 1 ||
        col("stop_ratio") < 0 || col("stop_ratio") > 1)
    assert(bad.count() === 0)
  }

  test("qualityModel matches an independent JVM reference scorer") {
    // reference implementation: same hash->bucket->weight->sum chain,
    // computed with MessageDigest instead of Catalyst expressions
    def refScore(text: String): (Int, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val toks = text.split(" ", -1)
      val sum = toks.map { t =>
        val hex = md.digest(t.getBytes("UTF-8"))
          .take(2).map(b => f"$b%02x").mkString
        val b = Integer.parseInt(hex, 16) % 256
        ((b * 37) % 97 - 48).toLong
      }.sum
      (toks.length, sum)
    }
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> refScore(r.getString(1))).toMap
    val out = TextOps.qualityModel(spark, sfDir).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val (nt, sc) = docs(r.getLong(0))
      assert(r.getInt(1) === nt && r.getLong(2) === sc)
      assert(r.getBoolean(4) === (sc.toDouble / nt > 0))
    }
    // the threshold must actually split the corpus, not rubber-stamp it
    val kept = out.count(_.getBoolean(4))
    assert(kept > 0 && kept < out.length)
  }

  test("langId predicts a label for every doc") {
    val df = TextOps.langId(spark, sfDir)
    assert(df.filter(col("predicted_lang").isNull).count() === 0)
    assert(df.select("predicted_lang").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("en", "und")))
  }

  test("piiScrub leaves no matchable PII and counts every redaction") {
    val df = TextOps.piiScrub(spark, sfDir)
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    // nothing matching either pattern survives scrubbing
    assert(df.filter(col("scrubbed").rlike(emailRe) ||
      col("scrubbed").rlike(phoneRe)).count() === 0)
    // each detection produced exactly one mask, and at least the
    // planted contact strings (doc_id % 3 / % 2 rule) were detected
    val bad = df.filter(
      size(split(col("scrubbed"), "<EMAIL>")) - 1 =!= col("n_emails") ||
        size(split(col("scrubbed"), "<PHONE>")) - 1 =!= col("n_phones") ||
        col("n_emails") < when(col("doc_id") % 3 =!= 0, 1).otherwise(0) ||
        col("n_phones") < when(col("doc_id") % 2 === 0, 1).otherwise(0))
    assert(bad.count() === 0)
  }

  test("piiScrub adversarial cases: masks, counts, and the email/phone overlap") {
    import spark.implicits._
    val cases = Seq(
      // phone-shaped digits inside an email local part: the email mask
      // swallows them — counted as 0 phones, and nothing leaks
      ("reach me at 555-123-4567@corp.example.com ok", 1, 0),
      ("tel 123-456-7890 and 111-222-3333 x", 0, 2),
      ("a@b.co then c.d+e@f-g.h.io end", 2, 0),
      ("almost 12-345-6789 and 1234-567-8901 edge", 0, 1), // only the 234-567-8901 tail matches
      ("no pii here at all", 0, 0),
      ("mixed user9@example1.com tel 900-100-2000", 1, 1))
    val (scrub, nEmails, nPhones) = TextOps.scrubCols(col("raw"))
    val got = cases.map(_._1).toDF("raw")
      .select(col("raw"), scrub.as("scrubbed"),
        nEmails.as("n_emails"), nPhones.as("n_phones"))
      .collect()
    got.zip(cases).foreach { case (r, (raw, e, p)) =>
      assert(r.getInt(2) === e, s"n_emails for: $raw")
      assert(r.getInt(3) === p, s"n_phones for: $raw")
      val s2 = r.getString(1)
      assert(!s2.matches(s".*${TextOps.EmailRe}.*") &&
        !s2.matches(s".*${TextOps.PhoneRe}.*"), s"leak in: $s2")
      assert(s2.sliding(7).count(_ == "<EMAIL>") === e, s"email masks: $s2")
      assert(s2.sliding(7).count(_ == "<PHONE>") === p, s"phone masks: $s2")
    }
  }

  test("vocabOov rates are consistent and the vocab actually covers tokens") {
    try {
      val df = TextOps.vocabOov(spark, sfDir).persist()
      assert(df.count() === Tables.documents(spark, sfDir).count())
      val bad = df.filter(col("n_oov") < 0 || col("n_oov") > col("n_tokens") ||
        col("oov_rate") < 0 || col("oov_rate") > 1 ||
        (col("oov_rate") === 0) =!= (col("n_oov") === 0))
      assert(bad.count() === 0)
      // a 50-token vocab over a small synthetic vocabulary must cover
      // most of the stream — a broken join would send this to ~1.0
      val corpusRate = df.agg(sum("n_oov") / sum("n_tokens")).head.getDouble(0)
      assert(corpusRate < 0.5, s"corpus OOV rate $corpusRate")
      df.unpersist()
    } finally spark.catalog.clearCache() // vocabOov's tf cache is caller-owned
  }

  test("fingerprint is whitespace/case canonical") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("fp").toString
    Seq(
      (0L, "Hello  World", "en", "s", 12L),
      (1L, "  hello world ", "en", "s", 14L),  // same after canon
      (2L, "hello\tworld", "en", "s", 11L),    // same after canon
      (3L, "different text", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val fps = TextOps.fingerprint(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(0L) === fps(1L) && fps(1L) === fps(2L))
    assert(fps(3L) !== fps(0L))
  }

  test("bpe-ish tokenizer splits punctuation off words") {
    import spark.implicits._
    val got = Seq("hello, world!").toDF("t")
      .select(TextOps.bpeTokens(col("t")).as("tk"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("hello", ",", "world", "!"))
  }

  test("urlExtract parts reassemble into the planted url") {
    val out = TextOps.urlExtract(spark, sfDir).limit(50).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, host, path, query) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      assert(host == s"h${id % 20}.example${id % 7}.com")
      assert(path == s"/p/${id % 5}")
      assert(query.startsWith("q="))
    }
  }

  test("surprisal matches a hand-computed unigram model") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("surp").toString
    // corpus: 4 tokens total; p(a)=3/4, p(b)=1/4
    Seq((1L, "a a a", "en", "s", 5L), (2L, "b", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextOps.surprisal(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    spark.catalog.clearCache() // surprisal's tf cache is caller-owned
    val ln43 = math.round(-math.log(3.0 / 4.0) * 1e6) / 1e6
    val ln4 = math.round(-math.log(1.0 / 4.0) * 1e6) / 1e6
    assert(got(1L) == ((3L, ln43))) // rare-token doc scores higher:
    assert(got(2L) == ((1L, ln4)))  // ln 4 > ln 4/3
  }

  test("gopher filter signals match hand-computed values; both branches fire") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("gopher").toString
    val fortyTokens = Seq.tabulate(40)(i => s"w${i % 20}ab").mkString(" ")
    Seq(
      (1L, fortyTokens, "en", "s", 5L),       // 40 tokens, top_frac 2/40
      (2L, "tiny doc here", "en", "s", 1L),   // 3 tokens -> dropped
      (3L, ("spam " * 30).trim, "en", "s", 1L)) // top_frac 1.0 -> dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = TextOps.gopherFilter(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // w0ab..w9ab are 4 chars, w10ab..w19ab are 5: mean = (2*10*4+2*10*5)/40
    assert(got(1L) === ((40, 4.5, 0.05, true)))
    assert(got(2L)._4 === false)
    assert(got(3L) === ((30, 4.0, 1.0, false)))
    // and on the real corpus both branches occur
    val keeps = TextOps.gopherFilter(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("keep")).count().count()
    assert(keeps === 2, "thresholds no longer split the corpus")
  }

  test("jsd: 0 on identical slices, ln 2 on disjoint vocab, mid between") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("jsd").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def jsd(): Double = {
      val r = TextOps.jsDivergence(spark, d).head()
      r.getDouble(0)
    }
    write(Seq((0L, "a b c", "en"), (1L, "a b c", "fr")))
    assert(jsd() === 0.0)
    write(Seq((0L, "a b c", "en"), (1L, "x y z", "fr")))
    assert(math.abs(jsd() - math.log(2)) < 1e-6, "disjoint vocab != ln 2")
    write(Seq((0L, "a a b b", "en"), (1L, "a b b b", "fr")))
    val mid = jsd()
    assert(mid > 0.0 && mid < math.log(2), s"mid-overlap jsd $mid out of range")
  }
}
