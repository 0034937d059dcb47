package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed surface (SURVEY §1.4): case-class views of the test tables for
  * callers who want compile-time row types. Query logic should stay in
  * untyped Column expressions (Catalyst optimizes those; typed lambdas
  * are opaque), but typed Datasets give safe boundaries for
  * mapPartitions kernels and user code.
  */
object Model {
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
    l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_tax: Double, l_returnflag: String,
    l_linestatus: String, l_shipdate: Timestamp)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Long,
    c_acctbal: Double, c_mktsegment: String)
  case class Document(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._; Tables.orders(s, d).as[Order]
  }
  def lineitem(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._; Tables.lineitem(s, d).as[Lineitem]
  }
  def customer(s: SparkSession, d: String): Dataset[Customer] = {
    import s.implicits._; Tables.customer(s, d).as[Customer]
  }
  def documents(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._; Tables.documents(s, d).as[Document]
  }
  def embeddings(s: SparkSession, d: String): Dataset[Embedding] = {
    import s.implicits._; Tables.embeddings(s, d).as[Embedding]
  }
}
