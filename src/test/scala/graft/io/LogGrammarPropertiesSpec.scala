package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based round-trip of the commit-log grammar — ∀ random
  * manifests (fixed seeds, AnalyticsPropertiesSpec's pattern): a
  * [[Snapshot.FileStat]] rendered by `addLine` and re-read through the
  * REAL file path (`readCommits` over an on-disk `.commit`) must
  * reproduce every tier exactly — rows, long zones, base64 string
  * zones (arbitrary unicode incl. tabs/colons/newlines in VALUES),
  * Bloom words, escaped partition fragments, null counts — plus `rm`,
  * `dv`, `constraint`, `txn`, `ts` lines and a `meta` schema carrying
  * column-mapping metadata. The grammar is the lake's durability
  * contract: any segment that fails to round-trip is silent data loss
  * at read time, which is why this is property-tested rather than
  * example-tested. */
class LogGrammarPropertiesSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private val colName: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  // Values that stress the value-side escaping: tabs, colons, '=',
  // newlines, '%', unicode incl. supplementary plane. (PATHS and
  // column names stay grammar-safe by construction on the write side;
  // VALUES must survive arbitrary content.)
  private val nastyString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOfN(6, Gen.oneOf[String]("\t", ":", "=", "%", "\n", "a",
      "é", new String(Character.toChars(0x1F600))))
      .map(_.mkString),
    Gen.const(""))

  private val fileStat: Gen[Snapshot.FileStat] = for {
    dir <- Gen.chooseNum(0, 9)
    name <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    rows <- Gen.chooseNum(0L, 1000000L)
    nzone <- Gen.chooseNum(0, 3)
    zcols <- Gen.listOfN(nzone, colName)
    zvals <- Gen.listOfN(nzone, for {
      lo <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      span <- Gen.chooseNum(0L, 1000L)
    } yield (lo, lo + span))
    nbloom <- Gen.chooseNum(0, 2)
    bcols <- Gen.listOfN(nbloom, colName)
    bvals <- Gen.listOfN(nbloom, for {
      k <- Gen.chooseNum(1, 8)
      words <- Gen.listOfN(4, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield (k, words.toArray))
    npart <- Gen.chooseNum(0, 2)
    pcols <- Gen.listOfN(npart, colName)
    praw <- Gen.listOfN(npart, Gen.option(nastyString))
    nstr <- Gen.chooseNum(0, 2)
    scols <- Gen.listOfN(nstr, colName)
    svals <- Gen.listOfN(nstr, Gen.zip(nastyString, nastyString))
    nnull <- Gen.chooseNum(0, 2)
    ncols <- Gen.listOfN(nnull, colName)
    nvals <- Gen.listOfN(nnull, Gen.chooseNum(0L, 1000000L))
  } yield Snapshot.FileStat(
    s"data/c0-$dir/$name.parquet", rows,
    zcols.zip(zvals.map(_._1)).toMap, zcols.zip(zvals.map(_._2)).toMap,
    bcols.zip(bvals).toMap,
    // the manifest records partitionBy's ESCAPED fragment — escape
    // through the same function the writer uses
    pcols.zip(praw.map(v => Snapshot.escapedPartValue(v.orNull))).toMap,
    scols.zip(svals.map(_._1)).toMap, scols.zip(svals.map(_._2)).toMap,
    ncols.zip(nvals).toMap)

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("add-line round-trip: every manifest tier survives render → file → parse") {
    (1 to 40).foreach { seed =>
      val f = sample(fileStat, seed.toLong)
      val root = Files.createTempDirectory("log-prop-").toString
      val logPath = new Path(root, "_log")
      val fs = fsOf(root)
      fs.mkdirs(logPath)
      val record = Seq("v\t0", Snapshot.addLine(f)).mkString("\n")
      val out = fs.create(new Path(logPath, "00000000.commit"))
      out.write(record.getBytes("UTF-8")); out.close()
      val parsed = Snapshot.readCommits(fs, logPath)
      assert(parsed.size === 1)
      val g = parsed.head.added.head
      assert(g.path === f.path, s"seed $seed path")
      assert(g.rows === f.rows, s"seed $seed rows")
      assert(g.lo === f.lo && g.hi === f.hi, s"seed $seed zones")
      assert(g.parts === f.parts, s"seed $seed parts")
      assert(g.slo === f.slo && g.shi === f.shi, s"seed $seed szones")
      assert(g.nulls === f.nulls, s"seed $seed nullcnts")
      assert(g.bloom.keySet === f.bloom.keySet, s"seed $seed bloom cols")
      f.bloom.foreach { case (c, (k, words)) =>
        val (gk, gw) = g.bloom(c)
        assert(gk === k && gw.toSeq === words.toSeq, s"seed $seed bloom $c")
      }
    }
  }

  test("full record round-trip: rm/dv/constraint/txn/ts/meta lines, mapping metadata included") {
    (1 to 15).foreach { seed =>
      val f = sample(fileStat, 1000L + seed)
      val root = Files.createTempDirectory("log-prop2-").toString
      val logPath = new Path(root, "_log")
      val fs = fsOf(root)
      fs.mkdirs(logPath)
      // a schema whose fields carry column-mapping physical names —
      // the round-17 metadata must survive the meta-line base64 hop
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("label", StringType, nullable = true,
          new MetadataBuilder()
            .putString(Snapshot.PhysKey, "v__p3").build())))
      val record = Seq(
        "v\t7",
        Snapshot.metaLine(schema),
        Snapshot.addLine(f),
        "rm\tdata/c0-old/x.parquet",
        s"dv\t${f.path}\tdv/d7/part.parquet",
        "constraint\tk_pos\tk >= 0",
        "unconstraint\tstale_check",
        Snapshot.featureLine("reader", "column-mapping"),
        Snapshot.featureLine("writer", "in-commit-timestamps"),
        "txn\twriter-a\t42",
        "idhw\tid\t4090",
        "idhw\tid\t1010", // duplicate column folds MONOTONE (max wins)
        // property values are arbitrary strings — tabs/newlines ride
        // the base64 hop like meta does
        Snapshot.propLine("owner.team", "data\teng\nline2"),
        Snapshot.unpropLine("stale\tkey"),
        "ts\t1755300000000").mkString("\n")
      val out = fs.create(new Path(logPath, "00000007.commit"))
      out.write(record.getBytes("UTF-8")); out.close()
      val c = Snapshot.readCommits(fs, logPath).head
      assert(c.version === 7)
      assert(c.removed === Seq("data/c0-old/x.parquet"))
      assert(c.dvs === Seq((f.path, "dv/d7/part.parquet")))
      assert(c.constraints === Seq(("k_pos", "k >= 0")))
      assert(c.unconstraints === Seq("stale_check"))
      assert(c.features === Seq(("reader", "column-mapping"),
        ("writer", "in-commit-timestamps")),
        "feature stamps must round-trip the line grammar")
      assert(c.txn === Some(("writer-a", 42L)))
      assert(c.idHw === Map("id" -> 4090L),
        "idhw lines fold per-column monotone max within a commit")
      assert(c.props === Seq(("owner.team", "data\teng\nline2")),
        "property values must survive the base64 hop verbatim")
      assert(c.unprops === Seq("stale\tkey"))
      assert(c.ts === Some(1755300000000L))
      val m = c.meta.get
      assert(m.fieldNames.toSeq === Seq("k", "label"))
      assert(Snapshot.physicalName(m("label")) === "v__p3",
        "column-mapping physical name must survive the meta round-trip")
      assert(Snapshot.physicalName(m("k")) === "k")
    }
  }

  test("malformed segments fail loudly, never silently mis-parse") {
    val root = Files.createTempDirectory("log-prop3-").toString
    val logPath = new Path(root, "_log")
    val fs = fsOf(root)
    fs.mkdirs(logPath)
    def write(v: Int, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(logPath, f"$v%08d.commit"), true)
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    }
    // nullcnt without '=' → the corrupt-log path (round-17 guard)
    write(0, Seq("v\t0", "add\tdata/c0-a/x.parquet\t10\tnullcnt:broken"))
    val e1 = intercept[RuntimeException](Snapshot.readCommits(fs, logPath))
    assert(e1.getMessage.contains("corrupt log line"))
    // unknown line kind → same loud path
    write(0, Seq("v\t0", "wat\tsomething"))
    val e2 = intercept[RuntimeException](Snapshot.readCommits(fs, logPath))
    assert(e2.getMessage.contains("corrupt log line"))
    // feature line with an unknown KIND is corrupt (names are not —
    // unknown names are the gate's business, at read/write time)
    write(0, Seq("v\t0", "feature\tarbiter\tcolumn-mapping"))
    val e2b = intercept[RuntimeException](Snapshot.readCommits(fs, logPath))
    assert(e2b.getMessage.contains("feature kind"))
    // version line disagreeing with the file name is refused
    write(0, Seq("v\t3"))
    val e3 = intercept[IllegalArgumentException](
      Snapshot.readCommits(fs, logPath))
    assert(e3.getMessage.contains("claims version"))
  }
}
