package graft

import org.apache.spark.sql.SparkSession

/** Preconfigured session builder for graft applications: UTC session
  * timezone (the reference's gmtime semantics), shuffle width = cores
  * unless overridden (the 200 default is wrong on a laptop and on a
  * 1000-core cluster alike), scan splits sized so single large files
  * still fan out, AQE left on (default) for runtime re-planning, and
  * graft's native functions injected. Cluster submits override any of
  * these via --conf; this is the local/default shape. */
object GraftSession {
  def builder(master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    // extensions only apply when this call created the session; cover
    // the attach-to-existing case too (idempotent)
    functions.VectorExpressions.register(s)
    functions.StringExpressions.register(s)
    s
  }
}
