package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction must preserve content exactly and deliver the layout it
  * promises; the clustered variant must additionally leave per-file
  * key ranges globally non-overlapping (the property that makes
  * min/max file stats prune like an index afterwards). */
class CompactionSpec extends SparkSpec {
  test("gate: content preserved, file count reduced to the sized target") {
    val row = Compaction.compactSmallFiles(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0), "compaction changed the table's content")
    assert(row(0).getBoolean(1), "compaction missed its file-count target")
    assert(row(0).getLong(2) > 0)
  }

  test("clustered compaction leaves non-overlapping per-file key ranges") {
    val base = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    try {
      val in = s"$base/in"
      val out = s"$base/out"
      graft.Tables.orders(spark, sfDir).repartition(16)
        .write.mode("overwrite").parquet(in)
      val target = math.max(1L,
        Compaction.dataFiles(spark, in).map(_._2).sum / 4)
      Compaction.compact(spark, in, out, target, Seq("o_orderkey"))
      // per-file min/max of the sort key, ordered by min: any overlap
      // means range partitioning failed and stats-based pruning is lost
      val ranges = spark.read.parquet(out)
        .groupBy(input_file_name().as("f"))
        .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
        .orderBy("lo")
        .collect()
      assert(ranges.length > 1, "clustered compaction produced one file")
      ranges.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"file ranges overlap: [${a.getLong(1)},${a.getLong(2)}] vs " +
            s"[${b.getLong(1)},${b.getLong(2)}]")
      }
      // content count parity for the clustered path too
      assert(spark.read.parquet(out).count() ===
        graft.Tables.orders(spark, sfDir).count())
    } finally graft.Fs.deleteRecursively(base)
  }
}
