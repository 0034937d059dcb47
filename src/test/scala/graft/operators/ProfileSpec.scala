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

  // The fingerprint's whole job is order/partitioning invariance plus
  // sensitivity to any single-row change — both XOR-blind edits
  // (insert a row twice: XOR cancels, SUM must not) and value edits.
  test("fingerprint is partitioning-invariant and tamper-evident") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.tableFingerprint(df,
        Seq(col("k").cast("string"), col("v"))).collect()(0)

    val a = fp(base.repartition(1))
    val b = fp(base.repartition(13, col("v")).sortWithinPartitions("v"))
    assert(a === b, "same content must fingerprint equal regardless of layout")

    val edited = fp(base.withColumn("v",
      when(col("k") === 117L, lit("vX")).otherwise(col("v"))))
    assert(edited !== a, "single value edit must change the signature")

    // duplicate-pair insertion: XOR component cancels, SUM+COUNT catch it
    val dupPair = fp(base.union(base.filter(col("k") === 7L))
      .union(base.filter(col("k") === 7L)))
    assert(dupPair !== a, "x XOR x = 0 must not fool the combined signature")
    assert(dupPair.getLong(1) === a.getLong(1),
      "sanity: the duplicated pair IS invisible to XOR alone")

    // the modular SUM residue must be a plain long below the modulus
    assert(a.getLong(2) >= 0L && a.getLong(2) < Profile.FpMod,
      "sum_sig must be the int64 residue, never a wider dtype")
  }

  // The bucketed fingerprint's job is LOCALIZATION: a value edit must
  // move exactly one bucket's (xor, sum) — and no bucket's count —
  // because the bucket id hashes only the business KEY.
  test("bucketed fingerprint localizes a single edit to exactly one bucket") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (1 to 400).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    def buckets(df: org.apache.spark.sql.DataFrame) =
      Profile.fingerprintBuckets(df, Seq(col("k").cast("string")),
        Seq(col("k").cast("string"), col("v")), 64)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val a = buckets(base)
    assert(a.keySet.forall(b => b >= 0 && b < 64))
    assert(a.size > 32, "400 keys over 64 uniform buckets should hit most")

    val edited = buckets(base.withColumn("v",
      when(col("k") === 117L, lit("vX")).otherwise(col("v"))))
    assert(a.keySet === edited.keySet, "same keys must occupy same buckets")
    assert(a.view.mapValues(_._1).toMap === edited.view.mapValues(_._1).toMap,
      "a value edit must not move any bucket's row count")
    val moved = a.keySet.filter(b => a(b) != edited(b))
    assert(moved.size === 1,
      s"one edited row must change exactly one bucket, got $moved")
  }
}
