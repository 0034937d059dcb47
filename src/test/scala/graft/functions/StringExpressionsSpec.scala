package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unaccent expression: NFD-decompose + drop combining marks, with a
  * zero-copy ASCII fast path. The text_normalize oracle proves parity
  * with DuckDB's strip_accents at the query level; these tests pin the
  * expression's own semantics on inputs the corpus never produces.
  */
class StringExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def un(s: String): String =
    StringExpressions.stripAccentsJava(UTF8String.fromString(s)).toString

  test("latin accents strip to their base letters") {
    assert(un("áéîöü àêíñç") == "aeiou aeinc")
    assert(un("crème brûlée") == "creme brulee")
  }

  test("pure ASCII returns the identical UTF8String (fast path, no copy)") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(StringExpressions.stripAccentsJava(in) eq in)
  }

  test("already-decomposed combining marks are dropped too") {
    assert(un("éclair") == "eclair") // e + COMBINING ACUTE
  }

  test("non-decomposable characters pass through unchanged") {
    assert(un("straße ħello 中文 øre") == "straße ħello 中文 øre")
  }

  test("empty string and lone combining mark") {
    assert(un("") == "")
    assert(un("́") == "")
  }

  test("column API handles NULL and matches the static helper") {
    import spark.implicits._
    val out = Seq(Some("café"), None, Some("ascii"))
      .toDF("t")
      .select(StringExpressions.unaccent(col("t")).as("u"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("cafe", null, "ascii"))
  }

  test("SQL-registered and codegen'd: unaccent works from spark.sql over rows") {
    StringExpressions.register(spark)
    import spark.implicits._
    // enough rows that the projection really goes through the codegen
    // path; values cover fast path, accents, and decomposed marks
    val variants = Seq("ascii only", "café", "éclair", "ñoño")
    Seq.tabulate(256)(i => i -> variants(i % variants.size))
      .toDF("id", "t").createOrReplaceTempView("unaccent_in")
    val got = spark.sql(
      "SELECT count(distinct unaccent(t)) AS n FROM unaccent_in")
      .head().getLong(0)
    // "cafe", "eclair", "nono", "ascii only"
    assert(got == 4)
  }
}
