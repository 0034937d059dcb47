package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.sources.{EthSources, Sinks}

/** The reference's six analysis jobs re-expressed as declarative
  * DataFrame plans (SURVEY.md §3, §7.1). Each function takes validated
  * frames from [[EthSources]] and returns the result frame in the
  * golden-output column order; the run* entry points wire
  * source-path → query → golden-JSON sink like the original drivers.
  *
  * Plans vs the reference (SURVEY §4.2): column pruning and predicate
  * placement are Catalyst's; multi-output jobs persist the shared
  * subplan once (the reference recomputed it per action); aggregated
  * averages are one groupBy (sum,count live in avg's buffer) instead of
  * reduceByKey-join-divide; top-k plans TakeOrderedAndProject.
  */
object EthParity {
  /** Epoch-seconds double → UTC month bucket; gmtime truncates whole
    * seconds (etherTransactionsAnalysis.py:47). */
  private def monthOf(c: Column, fmt: String): Column =
    date_format(timestamp_seconds(c.cast(LongType)), fmt)

  // ---------------------------------------------------------- job A
  /** Monthly tx count (count_.txt) + monthly average value (avg_.txt)
    * from one shared aggregation — etherTransactionsAnalysis.py:45-54
    * computed sum and count as two lineages re-joined on month. */
  def monthlyTxStats(tx: DataFrame): DataFrame =
    tx.groupBy(monthOf(col("block_timestamp"), "MM-yyyy").as("month"))
      .agg(count(lit(1)).as("n_tx"),
        (sum(col("value")) / count(lit(1))).as("avg_value"))

  def monthlyTxCount(tx: DataFrame): DataFrame =
    monthlyTxStats(tx).select("month", "n_tx")

  def monthlyAvgValue(tx: DataFrame): DataFrame =
    monthlyTxStats(tx).select("month", "avg_value")

  // ---------------------------------------------------------- job B
  /** Top-10 contracts by ether received — etherTop10Contracts.py:62-68.
    * Inner join against the projected contract address list (not a
    * semi-join: duplicate contract rows must multiply, exactly like the
    * reference's (addr,1) join), then sum + top-10. */
  def top10Contracts(tx: DataFrame, contracts: DataFrame): DataFrame =
    tx.join(contracts, tx("to_address") === contracts("address"))
      .groupBy(col("to_address"))
      .agg(sum(col("value")).as("total_value"))
      .orderBy(col("total_value").desc, col("to_address").asc)
      .limit(10)

  // ---------------------------------------------------------- job C
  /** Top-10 miners by total block size — etherTopMiners.py:44-46. */
  def top10Miners(blocks: DataFrame): DataFrame =
    blocks.groupBy(col("miner"))
      .agg(sum(col("size")).as("total_size"))
      .orderBy(col("total_size").desc, col("miner").asc)
      .limit(10)

  // ---------------------------------------------------------- job D
  /** Scam-address ⋈ transactions, shared by three outputs
    * (etherscams.py:55-59). The scam side is tiny → broadcast; the
    * joined frame is persisted because three actions consume it (the
    * reference recomputed the join per action, SURVEY §3.2). */
  def scamJoined(tx: DataFrame, scamAddrs: DataFrame): DataFrame =
    tx.join(broadcast(scamAddrs), tx("to_address") === scamAddrs("address"))
      .select(col("id"), col("category"), col("value"), col("block_timestamp"))

  def lucrativeScamId(joined: DataFrame): DataFrame =
    joined.groupBy(col("id")).agg(sum(col("value")).as("total_value"))
      .orderBy(col("total_value").desc, col("id").asc).limit(1)

  def lucrativeScamCategory(joined: DataFrame): DataFrame =
    joined.groupBy(col("category")).agg(sum(col("value")).as("total_value"))
      .orderBy(col("total_value").desc, col("category").asc).limit(1)

  def scamValueByMonth(joined: DataFrame): DataFrame =
    joined.groupBy(monthOf(col("block_timestamp"), "MM-yyyy").as("month"),
      col("category"))
      .agg(sum(col("value")).as("total_value"))

  // ---------------------------------------------------------- job E
  /** Average gas price per month, value stringified like the
    * reference's str(sum/count) (ethergasguzzlers.py:61-63). */
  def avgGasPrice(tx: DataFrame): DataFrame =
    tx.groupBy(monthOf(col("block_timestamp"), "MM/yyyy").as("month"))
      .agg(avg(col("gas_price")).cast(StringType).as("avg_gas_price"))

  /** Contract transactions only (tx ⋈ contracts) — the joinRDD shared
    * by the avg-gas-used and top-contract pipelines
    * (ethergasguzzlers.py:66-69). */
  def contractTx(tx: DataFrame, contracts: DataFrame): DataFrame =
    tx.join(contracts, tx("to_address") === contracts("address"))

  /** Avg gas used per month over contract txs, month-sorted
    * (ethergasguzzlers.py:70-72). */
  def avgGasUsed(contractTx: DataFrame): DataFrame =
    contractTx
      .groupBy(monthOf(col("block_timestamp"), "MM/yyyy").as("month"))
      .agg(avg(col("gas")).cast(StringType).as("avg_gas_used"))
      .orderBy(col("month").asc)

  /** Avg gas used per month restricted to the re-ingested top-10
    * contract list (ethergasguzzlers.py:75-79); the list is tiny →
    * broadcast semi-join (payload-free dim). */
  def top10ContractGas(contractTx: DataFrame, top10: DataFrame): DataFrame =
    contractTx
      .join(broadcast(top10), contractTx("to_address") === top10("address"), "left_semi")
      .groupBy(monthOf(col("block_timestamp"), "MM/yyyy").as("month"))
      .agg(avg(col("gas")).as("avg_gas_used"))

  // ---------------------------------------------------------- job F
  /** Redundant-hex-column overhead in bits — etheroverhead.py:48-49:
    * Σ over rows of (Σ_{5 hex cols}(len-2)) * 4, keyed by literal 1. */
  def dataOverhead(blocks: DataFrame): DataFrame = {
    val hexCols = Seq("sha3_uncles", "logs_bloom", "transactions_root",
      "state_root", "receipts_root")
    val bits = hexCols.map(c => length(col(c)) - 2).reduce(_ + _) * 4
    blocks.agg(lit(1).as("key"), sum(bits.cast(LongType)).as("overhead_bits"))
      .select(col("key"), col("overhead_bits"))
  }

  // ---------------------------------------------------------- runners
  // ------------------------------------------ oracle-gated CSV pipeline
  /** End-to-end exercise of the reference's text-scan path at testdata
    * volume: derive a transactions.csv deterministically from `orders`
    * (1 in 1000 rows written malformed), run it through the validated
    * EthSources reader + the monthly aggregation, and return decimal-
    * exact sums — the DuckDB oracle recomputes the same result from
    * the original parquet, so the whole generate→write→scan→good_line→
    * aggregate cycle is hash-checked. */
  def csvPipelineOverTestdata(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    // per-(JVM, session) scratch dir: concurrent sessions must not
    // overwrite the CSV another session's scan is mid-read on
    val out = graft.Fs.scratchDir(s, "graft_eth_csv", d)
    val o = Tables.orders(s, d)
    val line = concat_ws(",",
      lit("h"), lit("0"), lit("bh"), lit("1"), lit("0"), lit("0xfrom"),
      concat(lit("0xc"), (col("o_custkey") % 500).cast(StringType)),
      col("o_totalprice").cast(StringType),
      lit("21000"), lit("50"), lit("0xin"),
      unix_timestamp(col("o_orderdate")).cast(StringType),
      lit(""), lit(""), lit("0"))
    o.select(when(col("o_orderkey") % 1000 === 0, lit("malformed,line"))
        .otherwise(line).as("value"))
      .write.mode("overwrite").text(out)
    val tx = EthSources.transactions(s, out,
      needValue = true, needTimestamp = true)
    tx.groupBy(monthOf(col("block_timestamp"), "MM-yyyy").as("month"))
      .agg(count(lit(1)).as("n_tx"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
  }

  /** CLI drivers mirroring the six spark-submit jobs: read from inDir
    * (transactions.csv / contracts.csv / blocks.csv / scams.json /
    * contractsTop10.csv), write golden-shape JSON into outDir. */
  def runTransactionsAnalysis(s: SparkSession, inDir: String, outDir: String): Unit = {
    val tx = EthSources.transactions(s, s"$inDir/transactions.csv",
      needValue = true, needTimestamp = true)
    val stats = monthlyTxStats(tx)
      .persist(StorageLevel.MEMORY_AND_DISK)
    Sinks.writeGoldenJson(stats.select("month", "n_tx"), s"$outDir/count_.txt")
    Sinks.writeGoldenJson(stats.select("month", "avg_value"), s"$outDir/avg_.txt")
    stats.unpersist()
  }

  def runTop10Contracts(s: SparkSession, inDir: String, outDir: String): Unit = {
    val tx = EthSources.transactions(s, s"$inDir/transactions.csv",
      needValue = true, needToPrefix = true)
    val c = EthSources.contracts(s, s"$inDir/contracts.csv", needAddrPrefix = true)
    Sinks.writeGoldenJson(top10Contracts(tx, c), s"$outDir/contractTop10.txt")
  }

  def runTopMiners(s: SparkSession, inDir: String, outDir: String): Unit =
    Sinks.writeGoldenJson(
      top10Miners(EthSources.blocks(s, s"$inDir/blocks.csv")),
      s"$outDir/minerTop.txt")

  def runScams(s: SparkSession, inDir: String, outDir: String): Unit = {
    val tx = EthSources.transactions(s, s"$inDir/transactions.csv",
      needValue = true, needTimestamp = true)
    val scams = EthSources.scamAddresses(s, s"$inDir/scams.json")
    val joined = scamJoined(tx, scams).persist(StorageLevel.MEMORY_AND_DISK)
    Sinks.writeGoldenJson(lucrativeScamId(joined), s"$outDir/lucrativeID.txt")
    Sinks.writeGoldenJson(lucrativeScamCategory(joined), s"$outDir/lucrativeCategory.txt")
    Sinks.writeGoldenJson(scamValueByMonth(joined), s"$outDir/changeWithTime.txt")
    joined.unpersist()
  }

  def runGasGuzzlers(s: SparkSession, inDir: String, outDir: String): Unit = {
    // tx feeds both the gas-price agg and the contract join → persist
    // (the reference re-scanned the CSV per lineage, SURVEY §4.2)
    val tx = EthSources.transactions(s, s"$inDir/transactions.csv",
      needGasPrice = true, needTimestamp = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c = EthSources.contracts(s, s"$inDir/contracts.csv")
    val top10 = EthSources.contractsTop10(s, s"$inDir/contractsTop10.csv")
    val joined = contractTx(tx, c).persist(StorageLevel.MEMORY_AND_DISK)
    Sinks.writeGoldenJson(avgGasPrice(tx).limit(100), s"$outDir/avg_gasprice.txt")
    Sinks.writeGoldenJson(avgGasUsed(joined).limit(100), s"$outDir/avg_gasused.txt")
    Sinks.writeGoldenJson(top10ContractGas(joined, top10), s"$outDir/contractWithGas.txt")
    joined.unpersist()
    tx.unpersist()
  }

  def runDataOverhead(s: SparkSession, inDir: String, outDir: String): Unit =
    Sinks.writeGoldenJson(
      dataOverhead(EthSources.blocks(s, s"$inDir/blocks.csv",
        needNumber = true, needMiner = true)),
      s"$outDir/dataoverhead.txt")

  val jobs: Seq[(String, (SparkSession, String, String) => Unit)] = Seq(
    "transactionsAnalysis" -> runTransactionsAnalysis _,
    "top10Contracts"       -> runTop10Contracts _,
    "topMiners"            -> runTopMiners _,
    "scams"                -> runScams _,
    "gasGuzzlers"          -> runGasGuzzlers _,
    "dataOverhead"         -> runDataOverhead _)

  /** spark-submit-style dispatcher: <job|all> <inDir> <outDir>. */
  def main(args: Array[String]): Unit = {
    val Array(job, inDir, outDir) = args
    // 16 MB scan splits: a single few-hundred-MB CSV still fans out
    // across all cores instead of 128 MB ÷ file = 3 map tasks
    val spark = graft.GraftSession.builder()
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = if (job == "all") jobs else jobs.filter(_._1 == job)
    require(selected.nonEmpty, s"unknown job $job; have ${jobs.map(_._1).mkString(",")}")
    selected.foreach { case (name, run) =>
      val t0 = System.nanoTime()
      run(spark, inDir, outDir)
      println(f"[ethparity] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
