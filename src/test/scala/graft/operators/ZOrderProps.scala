package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** The Column-expression Morton interleave must equal the obvious
  * bit-twiddling reference, and must actually interleave (locality:
  * the code of (x, y) bounds both coordinates' bits). */
object ZOrderProps extends Properties("ZOrder") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private def refMorton(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val mx = x & mask; val my = y & mask
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((mx >> i & 1L) << (2 * i)) | ((my >> i & 1L) << (2 * i + 1))
    }
  }

  private val xyGen = Gen.listOf(Gen.zip(
    Gen.chooseNum(0L, Long.MaxValue - 1), Gen.chooseNum(0L, Long.MaxValue - 1)))

  property("morton2 equals the bit-twiddling reference for any inputs") =
    Prop.forAll(xyGen, Gen.oneOf(4, 8, 16)) { (xs, bits) =>
      import spark.implicits._
      val df = xs.toDF("x", "y")
      val got = df.select(col("x"), col("y"),
          ZOrder.morton2(col("x"), col("y"), bits).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.forall { case (x, y, z) => z == refMorton(x, y, bits) }
    }
}
