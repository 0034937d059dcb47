package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Result sinks. The reference dumps every result as a JSON array of
  * [key, value] pairs via driver-side json.dumps + boto3 put
  * (e.g. etherTransactionsAnalysis.py:56-66); [[goldenJson]] reproduces
  * that exact byte shape from a DataFrame. All reference outputs are
  * post-aggregation small (top-k or per-month), so the collect is a
  * bounded driver merge, not a scalability hazard — anything large goes
  * through [[csv]]/parquet writers instead.
  */
object Sinks {
  private def jsonScalar(v: Any): String = v match {
    case null               => "null"
    case s: String          => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case d: java.lang.Double =>
      // Python json.dumps uses repr (shortest round-trip) — so does
      // Java's Double.toString except for the integral-value ".0"
      // suffix and exponent formatting; normalize the common case.
      val dv = d.doubleValue
      if (dv.isWhole && math.abs(dv) < 1e16) dv.toLong.toString else dv.toString
    case x                  => x.toString
  }

  /** Rows → `[[k, v], ...]` (or n-element inner arrays for wider rows),
    * the reference's golden output shape. */
  def goldenJson(df: DataFrame): String =
    df.collect()
      .map(r => (0 until r.length).map(i => jsonScalar(r.get(i)))
        .mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")

  def writeGoldenJson(df: DataFrame, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, goldenJson(df).getBytes(StandardCharsets.UTF_8))
  }

  /** Header CSV sink (graphs.ipynb cell 16 / S5). */
  def csv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
