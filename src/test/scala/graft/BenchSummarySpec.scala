package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench summary line is the ONE artifact the recording harness
  * parses, and it only sees the last 2000 characters of stdout: in
  * rounds 1–3 the line outgrew that window and every recorded bench
  * came back unparsed. These tests pin the contract that prevents a
  * fourth: hard byte budget, valid JSON, failures never hidden, and
  * the omitted remainder summarized exactly.
  */
class BenchSummarySpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** A suite larger and longer-named than the real one, so the budget
    * logic is exercised harder than production will ever push it. */
  private def bigSuite(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"some_quite_long_query_name_$i%03d" -> i * 0.037)

  test("summary line stays under budget even for a 150-query suite") {
    val line = Bench.summaryLine(bigSuite(150), "sf0.1")
    assert(line.length <= 1700, s"line is ${line.length} chars")
  }

  test("summary line is valid JSON with the contract fields") {
    val line = Bench.summaryLine(bigSuite(150), "sf0.1")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("sf").asText == "sf0.1")
    assert(node.get("queries").isObject)
    assert(node.get("n_queries").asInt == 150)
    assert(node.get("value").isNumber)
  }

  test("value equals the full-suite total; omitted_sec accounts for the rest") {
    val times = bigSuite(150)
    val node = mapper.readTree(Bench.summaryLine(times, "sf0.1"))
    val total = times.map(_._2).sum
    assert(math.abs(node.get("value").asDouble - total) < 0.02)
    val qs = node.get("queries")
    var kept = 0.0
    qs.properties().forEach(e => kept += e.getValue.asDouble)
    val omitted = node.get("omitted_sec").asDouble
    assert(node.get("omitted").asInt ==
      times.size - qs.size, "omitted count = suite - map size")
    // kept (2dp-rounded) + omitted ≈ total
    assert(math.abs(kept + omitted - total) < 0.01 * times.size)
  }

  test("the slowest queries are the ones kept in the map") {
    val times = bigSuite(150)
    val node = mapper.readTree(Bench.summaryLine(times, "sf0.1"))
    val keptNames = {
      val b = Seq.newBuilder[String]
      node.get("queries").fieldNames().forEachRemaining(n => b += n)
      b.result().toSet
    }
    val slowest = times.sortBy(-_._2).take(keptNames.size).map(_._1).toSet
    assert(keptNames == slowest)
  }

  test("failed queries (-1) always survive the cut, even at a tiny budget") {
    val times = bigSuite(150) ++ Seq("broken_query_a" -> -1.0, "broken_b" -> -1.0)
    val line = Bench.summaryLine(times, "sf0.1", budget = 300)
    assert(line.length <= 400) // failures + wrapper may exceed 300 slightly: never drop them
    val node = mapper.readTree(line)
    assert(node.get("queries").get("broken_query_a").asInt == -1)
    assert(node.get("queries").get("broken_b").asInt == -1)
    // failed queries don't poison the total
    assert(node.get("value").asDouble > 0)
  }

  test("a small suite is emitted whole, nothing omitted") {
    val times = Seq("q1" -> 1.234, "q2" -> 0.051, "q3" -> 12.0)
    val node = mapper.readTree(Bench.summaryLine(times, "sf0.01"))
    assert(node.get("omitted").asInt == 0)
    assert(node.get("queries").size == 3)
    assert(math.abs(node.get("queries").get("q1").asDouble - 1.23) < 1e-9)
  }

  /** 250 queries across the real suite's family spread, with realistic
    * name lengths — the scale the omission mechanism plus the family
    * rollup must absorb without losing coverage information. */
  private def suite250: Seq[(String, Double)] = {
    val fams = Seq("dedup", "text", "stream", "sim", "mm", "ev", "asof",
      "sample", "q", "w", "x", "a", "j", "t", "s", "p", "f", "g",
      "scd", "merge", "range", "skew", "profile", "zorder", "decon")
    (0 until 250).map { i =>
      s"${fams(i % fams.size)}_${i / fams.size}_synthetic_case" -> (i * 0.713 % 19)
    }
  }

  test("250-query suite: line under budget, families keep full coverage") {
    val times = suite250 ++ Seq("stream_9_broken" -> -1.0)
    val line = Bench.summaryLine(times, "sf0.1")
    assert(line.length <= 1700, s"line is ${line.length} chars")
    val node = mapper.readTree(line)
    assert(node.get("omitted").asInt > 0, "250 queries must overflow the map")
    // the rollup covers EVERY query even though most timings are omitted
    val fams = node.get("families")
    var n = 0
    var sec = 0.0
    var nFail = 0
    fams.properties().forEach { e =>
      n += e.getValue.get(0).asInt
      sec += e.getValue.get(1).asDouble
      nFail += e.getValue.get(2).asInt
    }
    assert(n == times.size, "family counts must sum to the whole suite")
    assert(nFail == 1, "the failure is visible in its family's tally")
    val total = times.filter(_._2 >= 0).map(_._2).sum
    assert(math.abs(sec - total) < 0.01 * times.size,
      "family seconds must sum to the full-suite total")
    // and the per-query failure entry still survives the cut
    assert(node.get("queries").get("stream_9_broken").asInt == -1)
  }

  test("signature drift is self-reported: exact count, capped name list") {
    val changed = Seq("stream_session_parity", "a10_median",
      "q17_small_qty", "g4_shortest_path", "dedup_corpus")
    val node = mapper.readTree(
      Bench.summaryLine(bigSuite(150), "sf0.1", sigChanged = changed))
    assert(node.get("sig_changed").asInt == 5, "count is exact")
    val names = node.get("sig_changed_names")
    assert(names.size == 3, "name list capped at 3")
    // deterministic: first 3 sorted, so the judge sees the same names
    // the TRENDS ledger leads with
    assert(names.get(0).asText == "a10_median")
    // and the field must not blow the budget at full scale
    val big = Bench.summaryLine(suite250, "sf0.1",
      sigChanged = suite250.take(40).map(_._1))
    assert(big.length <= 1700, s"line is ${big.length} chars")
    assert(mapper.readTree(big).get("sig_changed").asInt == 40)
  }

  test("no drift, no field: the common case costs zero bytes") {
    val node = mapper.readTree(Bench.summaryLine(bigSuite(10), "sf0.1"))
    assert(node.get("sig_changed") == null)
    assert(node.get("sig_changed_names") == null)
  }

  test("host-fault probe times self-label the artifact and fit the " +
      "budget at full scale") {
    val node = mapper.readTree(Bench.summaryLine(bigSuite(10), "sf0.1",
      hostFaultMs = Seq(412L, 180543L)))
    val hf = node.get("host_fault_ms")
    assert(hf.size == 2 && hf.get(0).asLong == 412L &&
      hf.get(1).asLong == 180543L)
    // absent when not probed (fast mode), costs zero bytes
    assert(mapper.readTree(Bench.summaryLine(bigSuite(10), "sf0.1"))
      .get("host_fault_ms") == null)
    // at 250 queries WITH drift names the line still fits and stays
    // parseable — the probe field must never displace failure entries
    val big = Bench.summaryLine(suite250, "sf0.1",
      sigChanged = suite250.take(40).map(_._1),
      hostFaultMs = Seq(99999L, 99999L))
    assert(big.length <= 1700, s"line is ${big.length} chars")
    assert(mapper.readTree(big).get("host_fault_ms").size == 2)
  }

  test("familyOf strips trailing digits from the head token only") {
    assert(Bench.familyOf("q17_small_qty") == "q")
    assert(Bench.familyOf("a10_median") == "a")
    assert(Bench.familyOf("dedup_corpus") == "dedup")
    assert(Bench.familyOf("mm_decode") == "mm")
    assert(Bench.familyOf("b1_bucketed_join") == "b")
    assert(Bench.familyOf("stream_availablenow_parity") == "stream")
  }

  test("the real suite's names fit with room to spare at current sizes") {
    // every registered query at a worst-case 2-digit-seconds timing:
    // if this ever fails, the suite has outgrown even the omission
    // mechanism's usefulness and the contract needs rethinking
    val times = SparkEntry.queries.keys.toSeq.map(_ -> 87.65)
    val line = Bench.summaryLine(times, "sf0.1")
    assert(line.length <= 1700)
    assert(mapper.readTree(line).get("n_queries").asInt ==
      SparkEntry.queries.size)
  }

  /** A synthetic TRENDS ledger: `sigsPerEntry` maps query → signature
    * for each successive entry (oldest first), all at `sf`. */
  private def ledger(sf: String,
      sigsPerEntry: Seq[Map[String, String]])
      : com.fasterxml.jackson.databind.node.ArrayNode = {
    val root = mapper.createArrayNode()
    sigsPerEntry.foreach { sigs =>
      val e = root.addObject()
      e.put("sf", sf)
      val s = e.putObject("signatures")
      sigs.foreach { case (k, v) => s.put(k, v) }
    }
    root
  }

  test("accepted-set ledger: a seen A<->B flip goes quiet, a novel shape still flags") {
    val A = "13:13:58"
    val B = "12:12:44"
    val C = "20:20:400" // genuinely different jobs/stages
    val root = ledger("sf0.1", Seq(
      Map("flippy" -> A), Map("flippy" -> B), Map("flippy" -> A)))
    val sets = Bench.acceptedSigSets(root, "sf0.1")
    assert(sets("flippy").toSet == Set(A, B))
    // the anti-NOISE half: both variants are accepted — no flag
    assert(!Bench.flagsAsChanged(sets, "flippy", A))
    assert(!Bench.flagsAsChanged(sets, "flippy", B))
    // the anti-REGRESSION half: a third shape differs from EVERY
    // accepted variant and must flag (this is the direction the
    // window exists to preserve — quieting flips must not quiet
    // genuine drift)
    assert(Bench.flagsAsChanged(sets, "flippy", C))
    // shuffle-volume jitter inside the ±50% ratio band is not a new
    // shape; beyond it (same jobs/stages) it is
    assert(!Bench.flagsAsChanged(sets, "flippy", "13:13:70"))
    assert(Bench.flagsAsChanged(sets, "flippy", "13:13:200"))
  }

  test("accepted-set ledger: window, sf isolation, and no-history cases") {
    val shapes = (1 to 10).map(i => Map("q" -> s"$i:$i:10"))
    val root = ledger("sf0.1", shapes)
    val sets = Bench.acceptedSigSets(root, "sf0.1")
    // only the LAST 8 entries are accepted: the two oldest shapes
    // have aged out and regressing to one of them flags again
    assert(sets("q").toSet == (3 to 10).map(i => s"$i:$i:10").toSet)
    assert(Bench.flagsAsChanged(sets, "q", "1:1:10"))
    assert(!Bench.flagsAsChanged(sets, "q", "10:10:10"))
    // entries at another sf contribute nothing
    assert(Bench.acceptedSigSets(root, "sf0.001").isEmpty)
    // a query with no history never flags (first appearance is
    // recorded, not reported)
    assert(!Bench.flagsAsChanged(sets, "brand_new", "5:5:10"))
  }
}
