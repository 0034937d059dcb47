package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.EthSources

/** Step-timing diagnostic for the EthParity pipelines. */
object EthDiag {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val spark = graft.GraftSession.builder()
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    t("raw text count") {
      spark.read.text(s"$in/transactions.csv").count()
    }
    t("tx validated count") {
      EthSources.transactions(spark, s"$in/transactions.csv",
        needGasPrice = true, needTimestamp = true).count()
    }
    t("tx month agg") {
      EthParity.avgGasPrice(EthSources.transactions(spark, s"$in/transactions.csv",
        needGasPrice = true, needTimestamp = true)).count()
    }
    val tx = EthSources.transactions(spark, s"$in/transactions.csv",
      needGasPrice = true, needTimestamp = true)
    val c = EthSources.contracts(spark, s"$in/contracts.csv")
    t("contract join count") {
      EthParity.contractTx(tx, c).count()
    }
    t("join+agg no persist") {
      EthParity.avgGasUsed(EthParity.contractTx(tx, c)).count()
    }
    val joined = EthParity.contractTx(tx, c)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist materialize") { joined.count() }
    t("agg over persisted") { EthParity.avgGasUsed(joined).count() }
    t("scam join count") {
      EthParity.scamJoined(
        EthSources.transactions(spark, s"$in/transactions.csv",
          needValue = true, needTimestamp = true),
        EthSources.scamAddresses(spark, s"$in/scams.json")).count()
    }
    joined.unpersist()
    // exact runScams sequence, step by step
    val tx2 = EthSources.transactions(spark, s"$in/transactions.csv",
      needValue = true, needTimestamp = true)
    t("scamAddresses build") {
      EthSources.scamAddresses(spark, s"$in/scams.json").count()
    }
    val sj = EthParity.scamJoined(tx2,
      EthSources.scamAddresses(spark, s"$in/scams.json"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("scam lucrativeId (materializes persist)") {
      graft.sources.Sinks.goldenJson(EthParity.lucrativeScamId(sj))
    }
    t("scam lucrativeCategory") {
      graft.sources.Sinks.goldenJson(EthParity.lucrativeScamCategory(sj))
    }
    t("scam byMonth") {
      graft.sources.Sinks.goldenJson(EthParity.scamValueByMonth(sj))
    }
    sj.unpersist()
    spark.stop()
  }
}
