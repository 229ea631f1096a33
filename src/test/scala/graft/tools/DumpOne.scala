package graft.tools

/** Dump ONE (or a few) registry queries + their oracle SQL to a dir,
  * for fast single-query `tools/check_oracle.py` iteration — the
  * full `graft.Verify` dump costs ~3 min over the whole registry.
  * Usage: Test/runMain graft.tools.DumpOne <sfDir> <outDir> <name>...
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args: @unchecked
    val s = graft.GraftSession.local("graft-dump-one")
    // minimal JSON writer (no deps): name -> sql with escaped quotes
    val json = names.flatMap { n =>
      graft.SparkEntry.oracleSql.get(n).map { q =>
        val esc = q.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t")
        s""""$n": "$esc""""
      }
    }.mkString("{", ",", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    names.foreach { n =>
      graft.SparkEntry.queries(n)(s, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      System.err.println(s"[dump-one] wrote $outDir/$n")
    }
    s.stop()
  }
}
