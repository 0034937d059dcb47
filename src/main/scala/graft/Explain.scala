package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of every registered
  * query (or the ones named in args) so scan pruning / PushedFilters /
  * join strategy / TakeOrderedAndProject / WholeStageCodegen spans can
  * be reviewed without running the data. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", shufflePartitions = 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n======== $name ========")
      try println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
