package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The predicate-shaped DML tier ([[Snapshot.Lake.deleteWhere]] /
  * [[Snapshot.Lake.updateWhere]] / [[Snapshot.Lake.merge]]) — the
  * engine half of SQL `DELETE FROM` / `UPDATE` / `MERGE INTO`
  * (reference lifecycle: init-db.sql:43-44's retention delete,
  * timescale_to_deltalake.py:37's nightly upsert). All three are
  * merge-on-read: matching rows DV-mask, nothing rewrites. */
class DmlSpec extends SparkSpec with graft.LowStatePartitions {
  import spark.implicits._

  private def freshLake() = Snapshot.Lake(spark,
    Files.createTempDirectory("graft-dml-").toString,
    statsCols = Seq("k"), checkpointInterval = 4)

  private def kv(lo: Long, hi: Long) =
    (lo until hi).map(k => (k, s"row$k")).toDF("k", "v")

  test("deleteWhere: predicate DV-mask, no rewrite, exact-once CDF, no-op version on zero matches") {
    val lake = freshLake()
    lake.append(kv(0, 100).coalesce(2))   // v0
    lake.append(kv(100, 200).coalesce(2)) // v1
    val filesBefore = lake.liveFiles(lake.latestVersion).map(_.path)
    val v2 = lake.deleteWhere(col("k") % 10 === 3 && col("k") < 150)
    assert(v2 === 2)
    assert(lake.read().count() === 200 - 15)
    assert(lake.read().filter(col("k") % 10 === 3).agg(min("k")).head()
      .getLong(0) === 153L)
    // merge-on-read: the live file set is UNCHANGED (masks, no rewrite)
    assert(lake.liveFiles(2).map(_.path) === filesBefore)
    // CDF: exactly the 15 deleted rows, delete-tagged
    val cdc = lake.changes(1, 2)
    assert(cdc.filter(col("_op") === "delete").count() === 15)
    assert(cdc.filter(col("_op") === "insert").count() === 0)
    // a second identical delete: rows already masked are NOT
    // re-announced — zero-match publishes an explicit no-op version
    val v3 = lake.deleteWhere(col("k") % 10 === 3 && col("k") < 150)
    assert(v3 === 3)
    assert(lake.changes(2, 3).count() === 0,
      "already-masked rows must not re-emit CDF deletes")
    assert(lake.read().count() === 185)
    // candidate pruning is an optimization only: the zone tier admits
    // a superset of the matching files and the result is identical
    val v4 = lake.deleteWhere(col("k") === 199L,
      Seq(org.apache.spark.sql.sources.EqualTo("k", 199L)))
    assert(lake.readAsOf(v4).count() === 184)
  }

  test("updateWhere: SET evaluates against the pre-update row; masked copies + appended updates in one commit") {
    val lake = freshLake()
    lake.append(kv(0, 50).coalesce(1)) // v0
    val filesBefore = lake.liveFiles(0).map(_.path)
    // swap-shaped SET proves pre-update semantics: k' = k + 1000 AND
    // v' references the ORIGINAL k, not the updated one
    val v1 = lake.updateWhere(col("k") < 10,
      Seq("k" -> (col("k") + 1000L), "v" -> concat(lit("was"), col("k"))))
    assert(v1 === 1)
    assert(lake.read().count() === 50, "update must not change row count")
    assert(lake.read().filter(col("k") >= 1000).count() === 10)
    assert(lake.read().filter(col("v") === "was3").head().getLong(0)
      === 1003L)
    // original files still live (masked), update rows appended
    val after = lake.liveFiles(1).map(_.path)
    assert(filesBefore.forall(after.contains),
      "MOR update must not rewrite the original file")
    assert(after.size > filesBefore.size, "updated copies appended")
    // CDF across the update: 10 delete + 10 insert pairs
    val cdc = lake.changes(0, 1)
    assert(cdc.filter(col("_op") === "delete").count() === 10)
    assert(cdc.filter(col("_op") === "insert")
      .filter(col("k") >= 1000).count() === 10)
    // zero-match update is an explicit no-op version
    val v2 = lake.updateWhere(col("k") === -1L, Seq("v" -> lit("x")))
    assert(v2 === 2 && lake.read().count() === 50)
    // a masked row never resurrects: update the same band again —
    // only the 10 LIVE copies move
    val v3 = lake.updateWhere(col("k") >= 1000,
      Seq("v" -> lit("twice")))
    assert(lake.readAsOf(v3).filter(col("v") === "twice").count() === 10)
    assert(lake.readAsOf(v3).count() === 50)
  }

  test("updateWhere refuses identity/generated SET; generated columns re-derive from updated dependees") {
    val root = Files.createTempDirectory("graft-dml-gen-").toString
    val lake = Snapshot.Lake(spark, root, statsCols = Seq("k"),
      identityCols = Seq(("id", 100L, 1L)),
      generatedCols = Seq(("dbl", "k * 2")))
    lake.append(Seq(1L, 2L, 3L).toDF("k")) // v0: ids + dbl derived
    intercept[IllegalArgumentException](
      lake.updateWhere(col("k") === 1L, Seq("id" -> lit(999L))))
    intercept[IllegalArgumentException](
      lake.updateWhere(col("k") === 1L, Seq("dbl" -> lit(999L))))
    // a SET key no column owns fails loudly (a typo would otherwise
    // mask + re-append every matched row bit-identical)
    intercept[IllegalArgumentException](
      lake.updateWhere(col("k") === 1L, Seq("kk" -> lit(0L))))
    // merge mirrors updateWhere: explicit SET on a generated column
    // refuses (it would be silently re-derived over otherwise)
    val me = intercept[IllegalArgumentException](
      lake.merge(Seq((1L, 9L)).toDF("k", "x"),
        col("k") === col("__src_k"),
        matched = Seq(Snapshot.MergeClause(None,
          Some(Seq("dbl" -> col("__src_x"))))),
        notMatched = Nil))
    assert(me.getMessage.contains("generated"))
    val idsBefore = lake.read().select("k", "id").as[(Long, Long)]
      .collect().toMap
    lake.updateWhere(col("k") === 2L, Seq("k" -> lit(20L))) // v1
    val r = lake.read().orderBy("k").select("k", "dbl", "id")
      .as[(Long, Long, Long)].collect()
    assert(r.map(_._1).toSeq === Seq(1L, 3L, 20L))
    assert(r.forall { case (k, dbl, _) => dbl == k * 2 },
      "generated column must RE-DERIVE from the updated dependee")
    assert(r.find(_._1 == 20L).get._3 === idsBefore(2L),
      "the updated copy carries its identity value unchanged")
  }

  test("merge: full clause algebra — conditional update, delete, insert; first clause wins; cardinality refuses") {
    val lake = freshLake()
    lake.append(kv(0, 20).coalesce(1)) // v0
    // source: keys 15..24 (15-19 matched, 20-24 not), amount drives
    // the clause conditions
    val src = (15L until 25L).map(k => (k, k * 10)).toDF("k", "amt")
    val on = col("k") === col("__src_k")
    val v1 = lake.merge(src, on,
      matched = Seq(
        // k=15: delete; others: update v from the SOURCE row
        Snapshot.MergeClause(Some(col("__src_k") === 15L), None),
        Snapshot.MergeClause(None,
          Some(Seq("v" -> concat(lit("amt"), col("__src_amt")))))),
      notMatched = Seq(
        // k>=23 filtered out by the insert condition
        Snapshot.MergeClause(Some(col("__src_k") < 23L),
          Some(Seq("k" -> col("__src_k"),
            "v" -> concat(lit("new"), col("__src_k")))))))
    assert(v1 === 1)
    val r = lake.read().as[(Long, String)].collect().toMap
    assert(!r.contains(15L), "matched DELETE clause")
    assert(r(16L) === "amt160" && r(19L) === "amt190",
      "matched UPDATE from source values")
    assert(r(20L) === "new20" && r(22L) === "new22",
      "NOT MATCHED INSERT")
    assert(!r.contains(23L) && !r.contains(24L),
      "insert clause condition filters")
    assert(r(5L) === "row5", "unmatched target rows untouched")
    assert(r.size === 20 - 1 + 3) // initial 20, one delete, three inserts
    // CDF: update pairs + deletes + inserts
    val cdc = lake.changes(0, 1)
    assert(cdc.filter(col("_op") === "delete").count() === 5) // 1 del + 4 upd
    assert(cdc.filter(col("_op") === "insert").count() === 7) // 4 upd + 3 ins
    // duplicate source keys against matched clauses → cardinality error
    val dup = Seq((16L, 1L), (16L, 2L)).toDF("k", "amt")
    val e = intercept[IllegalArgumentException](lake.merge(dup, on,
      matched = Seq(Snapshot.MergeClause(None,
        Some(Seq("v" -> lit("x"))))),
      notMatched = Nil))
    assert(e.getMessage.contains("cardinality"))
  }

  test("merge prunes by the ON equality key: untouched files never scan, and the no-clause-match row stays") {
    val lake = freshLake()
    (0 until 4).foreach(i =>
      lake.append(kv(i * 100L, i * 100L + 100L).coalesce(1))) // v0-v3
    // source touches only the 100-199 file
    val src = Seq((150L, "upd")).toDF("k", "nv")
    val logBefore = lake.liveFiles(3).map(_.path)
    val v = lake.merge(src, col("k") === col("__src_k"),
      matched = Seq(Snapshot.MergeClause(
        Some(col("__src_nv") === "upd"),
        Some(Seq("v" -> col("__src_nv"))))),
      notMatched = Nil)
    assert(lake.read().filter(col("k") === 150L).select("v").head()
      .getString(0) === "upd")
    assert(lake.read().count() === 400)
    // exactly one file gained a DV pointer — the zone probe must keep
    // the other three untouched
    val dvd = lake.liveState(v).filter(_._2.isDefined).map(_._1.path)
    assert(dvd.size === 1 && logBefore.contains(dvd.head))
    // matched row whose clause condition FAILS stays put
    val v2 = lake.merge(Seq((250L, "no")).toDF("k", "nv"),
      col("k") === col("__src_k"),
      matched = Seq(Snapshot.MergeClause(
        Some(col("__src_nv") === "upd"),
        Some(Seq("v" -> col("__src_nv"))))),
      notMatched = Nil)
    assert(lake.readAsOf(v2).filter(col("k") === 250L).select("v")
      .head().getString(0) === "row250")
  }

  test("merge refuses NOT MATCHED INSERT into identity tables; upsert-shaped merge matches upsertMor") {
    val root = Files.createTempDirectory("graft-dml-mid-").toString
    val idLake = Snapshot.Lake(spark, root,
      identityCols = Seq(("id", 1L, 1L)))
    idLake.append(Seq(1L, 2L).toDF("k"))
    val e = intercept[IllegalArgumentException](
      idLake.merge(Seq((1L, 9L)).toDF("k", "x"),
        col("k") === col("__src_k"),
        matched = Nil,
        notMatched = Seq(Snapshot.MergeClause(None,
          Some(Seq("k" -> col("__src_k")))))))
    assert(e.getMessage.contains("identity"))
    // update-only merges on identity tables carry ids through
    idLake.merge(Seq((2L, 20L)).toDF("k", "nk"),
      col("k") === col("__src_k"),
      matched = Seq(Snapshot.MergeClause(None,
        Some(Seq("k" -> col("__src_nk"))))),
      notMatched = Nil)
    val rows = idLake.read().select("k", "id").as[(Long, Long)]
      .collect().toMap
    assert(rows.keySet === Set(1L, 20L))
    assert(rows.values.toSeq.distinct.size === 2)
  }
}
