package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lake schema evolution — the add-a-column lifecycle every long-lived
  * table goes through: old files keep their narrow schema, new files
  * carry the added column, and `mergeSchema` reads serve the union
  * with NULL backfill for pre-evolution rows. (Type-changing evolution
  * is intentionally NOT supported by parquet merging — asserted here —
  * which is why the engine's schema changes are additive-only, the
  * same discipline Delta enforces.) */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("additive evolution: merged read unions schemas, NULL-backfills old rows") {
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9)).toDF("id", "payload", "quality")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted === Array("id", "payload", "quality"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.schema.fieldIndex("quality")))
    assert(byId(3L).getDouble(merged.schema.fieldIndex("quality")) === 0.9)

    // without mergeSchema the footer picked is file-order dependent —
    // reading with an EXPLICIT schema is the stable contract (what
    // Tables.scala's fixed-schema loaders do).
    val explicit = spark.read.schema(merged.schema).parquet(dir)
    assert(explicit.count() === 3)
  }

  test("type-changing evolution is rejected, not silently coerced") {
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, 10)).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, "not an int")).toDF("id", "v").write.mode("append").parquet(dir)
    val ex = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("merge") ||
      ex.getMessage.toLowerCase.contains("incompatible"))
  }
}
