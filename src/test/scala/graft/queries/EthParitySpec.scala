package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.sources.{EthSources, Sinks}

/** Golden end-to-end tests for the six reference pipelines on hand-built
  * fixtures with hand-computed expected values (SURVEY.md §5.2.2). The
  * fixtures deliberately contain every malformed-row species the
  * reference's good_line variants drop: wrong arity, unparseable
  * numerics, missing 0x prefix, empty miner, header lines. */
class EthParitySpec extends SparkSpec {
  // epoch seconds: 2015-08-07 and 2016-01-01 (UTC)
  private val ts1 = "1438905600"
  private val ts2 = "1451606400"

  /** 15-field transactions.csv line; only idx 6,7,8,9,11 matter. */
  private def tx(to: String, value: String, gas: String, gasPrice: String,
      ts: String): String =
    Seq("h", "0", "bh", "1", "0", "0xfrom", to, value, gas, gasPrice,
      "0xin", ts, "", "", "0").mkString(",")

  private def blk(number: String, hexLen: Int, miner: String,
      size: String): String = {
    val hex = "0x" + "a" * (hexLen - 2)
    Seq(number, "bh", "ph", "n", hex, hex, hex, hex, hex, miner, "1", "2",
      size, "0xex", "8000000", "7900000", ts1, "10", "0").mkString(",")
  }

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("ethparity")
    Files.write(d.resolve("transactions.csv"), Seq(
      "hash,nonce,block_hash,block_number,transaction_index,from_address,to_address,value,gas,gas_price,input,block_timestamp,max_fee_per_gas,max_priority_fee_per_gas,transaction_type",
      tx("0xaaa", "100.0", "10", "5", ts1),
      tx("0xaaa", "50.0", "20", "15", ts1),
      tx("0xbbb", "200.0", "30", "25", ts2),
      tx("ccc", "400.0", "40", "35", ts2),
      "only,five,fields,in,this-line",
      tx("0xaaa", "abc", "50", "45", ts2),   // bad value
      tx("0xbbb", "25.0", "60", "55", "xyz") // bad timestamp
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("contracts.csv"), Seq(
      Seq("0xaaa", "0xcode", "sig", "true", "false", "1").mkString(","),
      Seq("0xbbb", "0xcode", "sig", "false", "false", "2").mkString(","),
      Seq("ddd", "0xcode", "sig", "false", "true", "3").mkString(","),
      "a,b,c,d,e"
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("blocks.csv"), Seq(
      blk("1", 6, "m1", "100"),
      blk("2", 10, "m1", "50"),
      blk("3", 6, "m2", "120"),
      blk("4", 6, "", "10"),       // empty miner: kept by topMiners, dropped by overhead
      blk("5", 6, "m3", "x"),      // bad size: dropped everywhere
      "short,line"
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("scams.json"),
      ("""{"result": {"123": {"id": 123, "addresses": ["0xaaa", "0xbbb"], """ +
       """"status": "Active", "category": "Phishing"}, """ +
       """"456": {"id": 456, "addresses": ["ccc"], "status": "Offline", """ +
       """"category": "Scamming"}}, "success": true}""")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("contractsTop10.csv"), Seq(
      ",Addresses,Value",
      "0,0xaaa,150.0"
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    d
  }
  private def in = dir.toString

  private def rows2[T](df: org.apache.spark.sql.DataFrame): Map[String, T] =
    df.collect().map(r => r.get(0).toString -> r.get(1).asInstanceOf[T]).toMap

  test("job A: monthly tx count drops malformed rows") {
    val t = EthSources.transactions(spark, s"$in/transactions.csv",
      needValue = true, needTimestamp = true)
    assert(rows2[Long](EthParity.monthlyTxCount(t)) ===
      Map("08-2015" -> 2L, "01-2016" -> 2L))
  }

  test("job A: monthly avg value") {
    val t = EthSources.transactions(spark, s"$in/transactions.csv",
      needValue = true, needTimestamp = true)
    val avg = rows2[Double](EthParity.monthlyAvgValue(t))
    assert(avg("08-2015") === 75.0 && avg("01-2016") === 300.0)
  }

  test("job B: top-10 contracts (0x-filters, keeps bad-ts row, inner join)") {
    val t = EthSources.transactions(spark, s"$in/transactions.csv",
      needValue = true, needToPrefix = true)
    val c = EthSources.contracts(spark, s"$in/contracts.csv", needAddrPrefix = true)
    val got = EthParity.top10Contracts(t, c).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === Seq(("0xbbb", 225.0), ("0xaaa", 150.0)))
  }

  test("job C: top miners keeps empty-miner rows, drops bad size") {
    val got = EthParity.top10Miners(
      EthSources.blocks(spark, s"$in/blocks.csv")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === Seq(("m1", 150.0), ("m2", 120.0), ("", 10.0)))
  }

  test("job D: scams — dynamic-key JSON map explode + join + three aggs") {
    val t = EthSources.transactions(spark, s"$in/transactions.csv",
      needValue = true, needTimestamp = true)
    val sc = EthSources.scamAddresses(spark, s"$in/scams.json")
    val joined = EthParity.scamJoined(t, sc)
    val id = EthParity.lucrativeScamId(joined).collect().head
    assert((id.getLong(0), id.getDouble(1)) === ((456L, 400.0)))
    val cat = EthParity.lucrativeScamCategory(joined).collect().head
    assert((cat.getString(0), cat.getDouble(1)) === (("Scamming", 400.0)))
    val byMonth = EthParity.scamValueByMonth(joined).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(byMonth === Map(
      ("08-2015", "Phishing") -> 150.0,
      ("01-2016", "Phishing") -> 200.0,
      ("01-2016", "Scamming") -> 400.0))
  }

  test("job E: gas guzzlers — avg price, contract-join avg used, top-10 rejoin") {
    val t = EthSources.transactions(spark, s"$in/transactions.csv",
      needGasPrice = true, needTimestamp = true)
    val c = EthSources.contracts(spark, s"$in/contracts.csv")
    val joined = EthParity.contractTx(t, c)
    assert(rows2[String](EthParity.avgGasPrice(t)).map { case (k, v) => k -> v.toDouble } ===
      Map("08/2015" -> 10.0, "01/2016" -> 35.0))
    val used = EthParity.avgGasUsed(joined).collect()
      .map(r => (r.getString(0), r.getString(1).toDouble)).toSeq
    assert(used === Seq(("01/2016", 40.0), ("08/2015", 15.0))) // month-sorted
    val top = EthSources.contractsTop10(spark, s"$in/contractsTop10.csv")
    assert(rows2[Double](EthParity.top10ContractGas(joined, top)) ===
      Map("08/2015" -> 15.0, "01/2016" -> 50.0))
  }

  test("job F: data overhead counts hex chars past 0x, 4 bits each") {
    val b = EthSources.blocks(spark, s"$in/blocks.csv",
      needNumber = true, needMiner = true)
    val got = EthParity.dataOverhead(b).collect().head
    // rows 1,3: 5 cols × (6-2) × 4 = 80 each; row 2: 5 × 8 × 4 = 160
    assert((got.getInt(0), got.getLong(1)) === ((1, 320L)))
  }

  test("golden JSON sink reproduces the [[k, v], ...] shape") {
    val t = EthSources.transactions(spark, s"$in/transactions.csv",
      needValue = true, needTimestamp = true)
    val js = Sinks.goldenJson(EthParity.monthlyTxCount(t).orderBy("month"))
    assert(js === """[["01-2016", 2], ["08-2015", 2]]""")
  }
}
