package graft.operators

import graft.SparkSpec

/** Plan pin for [P4]: reading a struct column through `props.k` /
  * `props.etype` must push the SUBFIELD projection and the nested
  * filter into the parquet scan — ReadSchema carries exactly the two
  * referenced subfields, never the decoy `pad`/`val` fields. This is
  * the columnar-pruning story's last corner: at 100 TB a struct column
  * whose unreferenced subfields still reach the scan reads the whole
  * blob. */
class NestedPruningSpec extends SparkSpec {
  test("ReadSchema contains only the referenced struct subfields") {
    val q = CoreOps.p4NestedPruning(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    val readSchemas = plan.split('\n').filter(_.contains("ReadSchema"))
    assert(readSchemas.nonEmpty, "no parquet scan in the plan")
    readSchemas.foreach { line =>
      assert(line.contains("struct<props:struct<k:int,etype:string>>"),
        s"subfield pruning missing: $line")
      assert(!line.contains("pad") && !line.contains("val:"),
        s"decoy subfields leaked into the scan: $line")
    }
    // the nested filter reached the scan as a pushed filter too
    assert(plan.contains("GreaterThanOrEqual(props.k,50)"),
      "nested-field filter not pushed to the parquet reader")
  }

  test("pruned read returns the same aggregate as the JSON source") {
    import org.apache.spark.sql.functions._
    val got = CoreOps.p4NestedPruning(spark, sfDir)
      .orderBy("etype").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = graft.Tables.events(spark, sfDir)
      .select(col("event_type").as("etype"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") >= 50)
      .groupBy("etype")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      .orderBy("etype").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(exp))
  }
}
