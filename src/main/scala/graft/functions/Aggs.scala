package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregations (SURVEY.md §2.8 declared UDAF surface:
  * `Aggregator[IN, BUF, OUT]`, e.g. exact median). */
object Aggs {
  /** Exact median: buffers the group's values, sorts once in finish,
    * averages the two middles on even counts (= DuckDB/ANSI
    * median(double)). Buffering the whole group is inherent to EXACT
    * medians — at 100 TB use approx_percentile (t-digest) or
    * percentile_approx instead; this exists to exercise the typed
    * Aggregator surface with an oracle-checkable result. */
  class MedianAgg extends Aggregator[Double, ArrayBuffer[Double], Double] {
    override def zero: ArrayBuffer[Double] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = {
      b += a; b
    }
    override def merge(x: ArrayBuffer[Double], y: ArrayBuffer[Double]): ArrayBuffer[Double] = {
      x ++= y; x
    }
    override def finish(b: ArrayBuffer[Double]): Double = {
      if (b.isEmpty) return Double.NaN
      val arr = b.toArray
      java.util.Arrays.sort(arr)
      val n = arr.length
      if (n % 2 == 1) arr(n / 2)
      else {
        val lo = arr(n / 2 - 1); val hi = arr(n / 2)
        lo + (hi - lo) * 0.5 // quantile_cont interpolation form
      }
    }
    override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
      Encoders.kryo[ArrayBuffer[Double]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
