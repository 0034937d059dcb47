package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** The max_by compaction must equal the textbook row_number-window
  * reference for ANY changelog — including tie storms (many records
  * per key on one timestamp) and single-record keys — since the whole
  * point of the aggregate formulation is replacing that window without
  * changing results. */
object ChangelogProps extends Properties("Changelog") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  // few keys, few timestamps -> dense (key, ts) collisions exercise
  // the event_id tie-break constantly
  private val rowsGen = Gen.listOf(Gen.zip(
    Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 5L), Gen.chooseNum(0.0, 9.0)))

  property("max_by compaction equals the row_number window reference") =
    Prop.forAll(rowsGen) { xs =>
      import spark.implicits._
      val df = xs.zipWithIndex.map { case ((uid, tsSlot, v), i) =>
        (i.toLong, new Timestamp(1700000000000L + tsSlot * 1000), uid,
          s"t${i % 3}", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Changelog.latestByKeyOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val ref = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == ref
    }

  property("scd2 intervals tile each user's history: no gaps, no overlaps, right versions") =
    Prop.forAll(rowsGen) { xs =>
      import spark.implicits._
      val df = xs.zipWithIndex.map { case ((uid, tsSlot, v), i) =>
        (i.toLong, new Timestamp(1700000000000L + tsSlot * 1000), uid,
          s"t${(v / 3).toInt}", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val rows = Changelog.scd2IntervalsOf(df).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      val ok = rows.groupBy(_._1).forall { case (_, ivs) =>
        val sorted = ivs.sortBy(_._2)
        sorted.head._2 == 1 &&
          sorted.map(_._2).toSeq == (1 to sorted.length) &&  // dense versions
          sorted.init.zip(sorted.tail).forall { case (a, b) =>
            a._4.contains(b._3) } &&                          // valid_to chains
          sorted.last._4.isEmpty                              // current is open
      }
      Prop(ok) :| s"intervals=${rows.toSeq}"
    }

  property("mergeCompacted is the semilattice: merge of chunk compactions == one-shot") =
    Prop.forAll(rowsGen, Gen.chooseNum(2, 4)) { (xs, nChunks) =>
      import spark.implicits._
      val df = xs.zipWithIndex.map { case ((uid, tsSlot, v), i) =>
        (i.toLong, new Timestamp(1700000000000L + tsSlot * 1000), uid,
          s"t${i % 3}", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      // arbitrary micro-batching of the same changelog
      val chunks = (0 until nChunks).map(i =>
        Changelog.latestByKeyOf(
          df.filter(pmod(col("event_id"), lit(nChunks)) === i)))
      val incremental = chunks.reduce(Changelog.mergeCompacted)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val oneShot = Changelog.latestByKeyOf(df)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      incremental == oneShot
    }
}
