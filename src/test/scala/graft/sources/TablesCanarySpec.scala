package graft.sources

import graft.SparkSpec

/** Testdata-drift canary: the driver regenerates /root/testdata between
  * rounds and has already changed a physical type mid-round (r08: events
  * `ts` flipped TIMESTAMP(NANOS) → TIMESTAMP(US), which cascaded into 44
  * DATATYPE_MISMATCH failures across unrelated suites). This spec loads
  * every table through its `Tables` accessor and forces analysis + one row,
  * so the NEXT drift fails exactly one test naming the broken table.
  */
class TablesCanarySpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001") match {
    // Canary must stay cheap even if the env points the suite at a big SF.
    case d if d.endsWith("sf0.1") => d.stripSuffix("sf0.1") + "sf0.001"
    case d => d
  }

  private val accessors: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "region"     -> (() => Tables.load(ss, sfDir, "region")),
    "nation"     -> (() => Tables.nation(ss, sfDir)),
    "customer"   -> (() => Tables.customer(ss, sfDir)),
    "supplier"   -> (() => Tables.load(ss, sfDir, "supplier")),
    "part"       -> (() => Tables.part(ss, sfDir)),
    "orders"     -> (() => Tables.orders(ss, sfDir)),
    "lineitem"   -> (() => Tables.lineitem(ss, sfDir)),
    "events"     -> (() => Tables.events(ss, sfDir)),
    "documents"  -> (() => Tables.documents(ss, sfDir)),
    "embeddings" -> (() => Tables.embeddings(ss, sfDir))
  )

  for ((name, open) <- accessors) {
    test(s"canary: table '$name' loads, analyzes, and yields a row") {
      val df =
        try open()
        catch { case t: Throwable => fail(s"table '$name' failed to LOAD/ANALYZE at $sfDir: $t") }
      val rows =
        try df.limit(1).collect()
        catch { case t: Throwable => fail(s"table '$name' failed to EXECUTE at $sfDir: $t") }
      assert(rows.nonEmpty, s"table '$name' at $sfDir returned zero rows")
    }
  }

  test("canary: events ts normalizes to TimestampType under either physical type") {
    import org.apache.spark.sql.types.TimestampType
    assert(Tables.events(ss, sfDir).schema("ts").dataType == TimestampType)
  }
}
