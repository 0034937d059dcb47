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

  property("zorderBy partitions are each z-sorted and cover disjoint z-ranges") =
    Prop.forAll(xyGen.suchThat(_.nonEmpty)) { xs =>
      import spark.implicits._
      val df = xs.toDF("x", "y").repartition(5)
      // recompute the code over the laid-out frame (a narrow projection
      // preserves partitioning) and inspect each partition directly
      val parts = ZOrder.zorderBy(df, "x", "y", bits = 8)
        .select(ZOrder.morton2(col("x"), col("y"), 8).as("z")).as[Long]
        .mapPartitions { it =>
          val v = it.toVector
          if (v.isEmpty) Iterator.empty
          else Iterator(
            (v.zip(v.tail).forall { case (a, b) => a <= b }, v.min, v.max))
        }.collect()
      val sortedWithin = parts.forall(_._1)
      val ranges = parts.map(p => (p._2, p._3)).sortBy(_._1)
      val disjoint = ranges.zip(ranges.drop(1)).forall {
        case ((_, hi), (lo2, _)) => hi <= lo2
      }
      sortedWithin && disjoint
    }
}
