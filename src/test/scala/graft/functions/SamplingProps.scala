package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** The distributed two-phase formulations must equal their
  * single-partition references for ANY id distribution — dense,
  * sparse, clustered, snowflake-huge — since the bucketing is
  * value-derived. */
object SamplingProps extends Properties("Sampling") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  // distinct ids across the full long range — dense, huge, and
  // negative (negative ids clamp into bucket 0; ordering still holds)
  private val idsGen = Gen.chooseNum(1, 60).flatMap { n =>
    Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(0L, 100L),
      Gen.chooseNum(-100L, -1L),
      Gen.chooseNum(Long.MinValue + 2, Long.MinValue / 2),
      Gen.chooseNum(0L, Long.MaxValue / 2),
      Gen.chooseNum(Long.MaxValue / 2, Long.MaxValue - 2)))
      .map(_.distinct)
  }

  property("packChunksOf equals single-partition running sum for any ids") =
    Prop.forAll(idsGen, Gen.chooseNum(1, 200)) { (ids0, maxTok0) =>
      import spark.implicits._
      // re-impose generator invariants: ScalaCheck shrinking does not
      // preserve them (doc_id uniqueness is the operator's contract)
      val ids = ids0.distinct
      val maxTok = math.max(1, maxTok0)
      val rows = ids.zipWithIndex.map { case (id, i) =>
        (id, (i % maxTok) + 1)
      }
      val df = rows.toDF("doc_id", "n_tokens")
      val got = Sampling.packChunksOf(df, capacity = 64, nP = 4)
        .select("doc_id", "start_tok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val ref = df.withColumn("start_tok",
          sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, 0)) - col("n_tokens"))
        .select("doc_id", "start_tok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      got == ref
    }

  property("stratifiedSampleOf keeps exactly ceil(n/denom) lowest ids per stratum") =
    Prop.forAll(idsGen, Gen.chooseNum(2, 10)) { (ids0, denom0) =>
      import spark.implicits._
      // re-impose generator invariants post-shrinking (see above)
      val ids = ids0.distinct
      val denom = math.max(2, denom0)
      val rows = ids.zipWithIndex.map { case (id, i) =>
        (s"lang${i % 3}", id)
      }
      val df = rows.toDF("lang", "doc_id")
      val got = Sampling.stratifiedSampleOf(df, denom, nP = 4)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // .toSeq first — flatMap on a Map producing pairs would collapse
      // back into a Map keyed by lang, keeping one row per stratum
      val ref = rows.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
        val keep = math.ceil(xs.size.toDouble / denom).toInt
        xs.map(_._2).sorted.take(keep).map(lang -> _)
      }.toSet
      got == ref
    }

  property("stratifiedSampleOf treats NULL strata as a regular stratum") =
    Prop.forAll(idsGen, Gen.chooseNum(2, 10)) { (ids0, denom0) =>
      import spark.implicits._
      val ids = ids0.distinct
      val denom = math.max(2, denom0)
      // every 3rd row has a NULL stratum — the SQL-window oracle keeps
      // NULL as its own partition, so the engine must too
      val rows = ids.zipWithIndex.map { case (id, i) =>
        (if (i % 3 == 0) null else s"lang${i % 2}", id)
      }
      val df = rows.toDF("lang", "doc_id")
      val got = Sampling.stratifiedSampleOf(df, denom, nP = 4)
        .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
      val ref = rows.groupBy(r => Option(r._1)).toSeq.flatMap { case (lang, xs) =>
        val keep = math.ceil(xs.size.toDouble / denom).toInt
        xs.map(_._2).sorted.take(keep).map(lang -> _)
      }.toSet
      got == ref
    }

  property("chunkOverlapOf covers every token with stride-spaced windows") =
    Prop.forAll(
      Gen.listOf(Gen.chooseNum(1L, 500L)).map(_.distinct),
      Gen.chooseNum(1, 64), Gen.chooseNum(1, 64)) { (ids0, a, b) =>
      import spark.implicits._
      // re-impose generator invariants lost to shrinking (cf. packChunks)
      val ids = ids0.distinct
      val size = math.max(1, math.max(a, b))
      val stride = math.max(1, math.min(a, b)) // 1 <= stride <= size
      val rows = ids.zipWithIndex.map { case (id, i) => (id, (i * 7) % 120 + 1L) }
      val got = Sampling.chunkOverlapOf(
        rows.toDF("doc_id", "n_tokens"), size, stride)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1).toSeq).toMap
      val ok = rows.forall { case (id, n) =>
        val chunks = got(id)
        val ids0 = chunks.map(_._1)
        ids0 == (0L until chunks.length).toSeq && // dense chunk ids
        chunks.forall { case (c, s0, e) =>
          s0 == c * stride && e == math.min(s0 + size, n) } &&
        chunks.last._3 == n &&                    // full coverage
        chunks.init.forall { case (_, s0, _) =>   // every non-final
          s0 + size < n } &&                      // window is full
        (chunks.length == 1 && n <= size ||
          chunks.length == (n - size + stride - 1) / stride + 1)
      }
      Prop(ok) :| s"got=$got size=$size stride=$stride"
    }
}
