package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** Salting must never change results — only the shuffle key space. */
object SkewProps extends Properties("Skew") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark

  // skewed generator: key "hot" dominates
  private val rowsGen = Gen.listOf(Gen.zip(
    Gen.frequency(8 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b", "c")),
    Gen.chooseNum(-1000L, 1000L)))

  property("saltedAgg equals direct groupBy sum/count") =
    Prop.forAll(rowsGen, Gen.chooseNum(1, 8)) { (xs, saltN) =>
      import spark.implicits._
      val df = xs.toDF("k", "v")
      val got = Skew.saltedAgg(df, col("k"), col("v"), saltN)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val exp = df.groupBy(col("k"))
        .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      got == exp
    }

  property("saltedJoin equals plain inner join") =
    Prop.forAll(rowsGen, Gen.someOf("hot", "a", "b"), Gen.chooseNum(1, 8)) {
      (xs, dimKeys, saltN) =>
        import spark.implicits._
        val fact = xs.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("id", "k", "v")
        val dim = dimKeys.toSeq.map(k => (k, s"payload_$k")).toDF("dk", "payload")
        val got = Skew.saltedJoin(fact, dim, "k", "dk", saltN)
          .select("id", "payload").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        val exp = fact.join(dim, fact("k") === dim("dk"))
          .select("id", "payload").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        got == exp
    }

  // the round-2 regression case: a hot key whose PAYLOAD is constant.
  // A value-derived salt (hash of the row's columns) maps every such
  // row to one salt bucket — zero spread, exactly when salting matters.
  property("constant-payload hot key fans out across salts") = {
    import spark.implicits._
    val fact = Seq.fill(2000)(("hot", 1L)).toDF("k", "v").repartition(4)
    val nSalts = fact.withColumn("_salt", Skew.rowSalt(8))
      .select("_salt").distinct().count()
    Prop(nSalts > 1) :| s"distinct salt buckets = $nSalts (want > 1)"
  }

  property("saltedJoin correct when hot key payload is constant") = {
    import spark.implicits._
    val fact = (0 until 500).map(i => (i.toLong, "hot", 7L)).toDF("id", "k", "v")
    val dim = Seq(("hot", "p")).toDF("dk", "payload")
    val got = Skew.saltedJoin(fact, dim, "k", "dk", 8)
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val exp = fact.join(dim, fact("k") === dim("dk"))
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    Prop(got == exp) :| s"got ${got.size} rows, expected ${exp.size}"
  }
}
