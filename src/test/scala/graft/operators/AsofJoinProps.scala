package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** asofJoin vs a brute-force in-memory reference on random event sets —
  * the spec pins hand-built edge cases; this sweeps the space
  * (key collisions, equal timestamps, tie groups, keys with no right
  * rows). */
object AsofJoinProps extends Properties("AsofJoin") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val t0 = 1700000000000L
  // small key/time domains force collisions and exact-tie cases
  private val rightGen = Gen.listOf(Gen.zip(
    Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 500L)))
  private val leftGen = Gen.listOf(Gen.zip(
    Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 20L)))

  property("matches the brute-force most-recent-at-or-before semantics") =
    Prop.forAll(leftGen, rightGen) { (ls0, rs0) =>
      import spark.implicits._
      // unique left ids; right (key, ts, tie) rows may collide freely
      val ls = ls0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rs = rs0.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val left = ls.map { case (id, k, t) =>
        (id, k, new Timestamp(t0 + t * 60000))
      }.toDF("purchase_id", "user_id", "ts")
      val right = rs.map { case (k, t, tie) =>
        (k, new Timestamp(t0 + t * 60000), tie)
      }.toDF("user_id", "click_ts", "click_id")

      val got = AsofJoin.asofJoin(left, right,
        key = "user_id", leftTs = "ts", rightTs = "click_ts",
        rightTie = "click_id", rightCols = Seq("click_id"))
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }.toMap

      val expected = ls.map { case (id, k, t) =>
        val candidates = rs.filter { case (rk, rt, _) => rk == k && rt <= t }
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy { case (_, rt, tie) => (rt, tie) }._3))
      }.toMap

      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("forward join matches the brute-force earliest-at-or-after semantics") =
    Prop.forAll(leftGen, rightGen) { (ls0, rs0) =>
      import spark.implicits._
      val ls = ls0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rs = rs0.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val left = ls.map { case (id, k, t) =>
        (id, k, new Timestamp(t0 + t * 60000))
      }.toDF("probe_id", "user_id", "ts")
      val right = rs.map { case (k, t, tie) =>
        (k, new Timestamp(t0 + t * 60000), tie)
      }.toDF("user_id", "click_ts", "click_id")

      val got = AsofJoin.asofJoinForward(left, right,
        key = "user_id", leftTs = "ts", rightTs = "click_ts",
        rightTie = "click_id", rightCols = Seq("click_id"))
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }.toMap

      // nearest following ts; at equal (key, ts) the max tie wins —
      // the same rule as backward, so minBy on (ts, -tie)
      val expected = ls.map { case (id, k, t) =>
        val candidates = rs.filter { case (rk, rt, _) => rk == k && rt >= t }
        id -> (if (candidates.isEmpty) None
               else Some(candidates.minBy { case (_, rt, tie) => (rt, -tie) }._3))
      }.toMap

      Prop(got == expected) :| s"got=$got expected=$expected"
    }
}
