package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** Funnel vs an obviously-correct single-threaded reference on random
  * event streams (FunnelSpec pins hand-built edges; this sweeps ts
  * ties, missing stages, and out-of-order arrivals), plus the monotone
  * stage-count chain.
  */
object FunnelProps extends Properties("Funnel") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark

  private case class Ev(user: Long, t: Long, typ: String)

  // few users + coarse time -> dense per-user streams, frequent ties
  private val genEvents: Gen[List[Ev]] = Gen.nonEmptyListOf(for {
    u <- Gen.chooseNum(1L, 5L)
    t <- Gen.chooseNum(0L, 40L)
    y <- Gen.oneOf("view", "click", "purchase", "error")
  } yield Ev(u, t, y)).map(_.take(60))

  /** First view, first click >= it, first purchase >= that. */
  private def reference(evs: List[Ev]): (Long, Long, Long, Long) = {
    val byUser = evs.groupBy(_.user)
    def firstAtOrAfter(es: List[Ev], typ: String, lo: Option[Long]) =
      lo.flatMap(b => es.filter(e => e.typ == typ && e.t >= b)
        .map(_.t).minOption)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { es =>
      val t1 = es.filter(_.typ == "view").map(_.t).minOption
      val t2 = firstAtOrAfter(es, "click", t1)
      val t3 = firstAtOrAfter(es, "purchase", t2)
      if (t1.isDefined) nv += 1
      if (t2.isDefined) nc += 1
      if (t3.isDefined) np += 1
    }
    (byUser.size.toLong, nv, nc, np)
  }

  property("matches the reference; stage counts form a monotone chain") =
    Prop.forAll(genEvents) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case (e, i) =>
        (i.toLong, new Timestamp(1700000000000L + e.t * 1000),
          e.user, e.typ, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val r = EventOps.funnelOf(df).head()
      val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      (got == reference(evs)) :| s"engine $got != reference ${reference(evs)}" &&
        (got._1 >= got._2 && got._2 >= got._3 && got._3 >= got._4) :| "monotone"
    }
}
