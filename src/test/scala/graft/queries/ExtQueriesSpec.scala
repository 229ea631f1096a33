package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExtQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("withNearDups ids stay disjoint past 10k docs (round-1 offset collided there)") {
    // 12k docs — more than the 10,000 offset round 1 used; with that
    // offset, perturbed id 10000+x collided with original doc 10000+x.
    val n = 12000
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("alpha beta gamma delta epsilon zeta"),
          col("id").cast("string")).as("text"))
    val out = ExtQueries.withNearDups(docs)
    assert(out.count() == 2L * n)
    assert(out.select("doc_id").distinct().count() == 2L * n)
    // originals and perturbed copies occupy provably disjoint id ranges
    val (loMax, hiMin) = (
      out.filter(col("doc_id") < ExtQueries.NearDupOffset).agg(max("doc_id")).as[Long].head(),
      out.filter(col("doc_id") >= ExtQueries.NearDupOffset).agg(min("doc_id")).as[Long].head())
    assert(loMax < ExtQueries.NearDupOffset && hiMin >= ExtQueries.NearDupOffset)
  }

  test("near-dup pairing joins originals to their own perturbed copy only") {
    val docs = Seq((7L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val both = ExtQueries.withNearDups(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(both.keySet == Set(7L, 7L + ExtQueries.NearDupOffset))
    // perturbed copy drops the last 3 tokens
    assert(both(7L + ExtQueries.NearDupOffset) == "one two three four five")
  }
}
