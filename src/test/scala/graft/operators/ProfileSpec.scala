package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** profileOf must count NULLs and distincts exactly — including
  * all-NULL and constant columns — since a profile that miscounts
  * nulls is worse than none (it green-lights a broken drop). */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("null, distinct, and min/max stats per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(2L), None),
      (None, Some("a")),
      (Some(2L), None)
    ).toDF("k", "s")
    val got = Profile.profileOf(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(got("k") === ((1L, 2L, "1", "2")))
    assert(got("s") === ((2L, 1L, "a", "a")))
  }

  test("all-NULL column profiles as zero-distinct with null extremes") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val row = Profile.profileOf(df, Seq("s")).collect()(0)
    assert(row.getLong(1) === 2L)      // n_null
    assert(row.getLong(2) === 0L)      // n_distinct
    assert(row.isNullAt(3) && row.isNullAt(4))
  }
}
