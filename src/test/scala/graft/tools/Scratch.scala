package graft.tools

/** Dev scratchpad for ad-hoc query timing (test scope — kept out of
  * the shipped tree). `sbt -batch "Test/runMain graft.tools.Scratch
  * <query names>"` — min-of-2 JIT-warm noop-sink probes at sf0.01 and
  * sf0.1 (the SCALE.md 1×→10× discipline); `dump <name>` prints the
  * result rows instead.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Unit): Double = Seq(time(body), time(body)).min
    def pr(msg: String): Unit = System.err.println(s"[probe] $msg")

    if (args.headOption.contains("dump")) {
      for (name <- args.drop(1);
          (label, d) <- Seq("sf0.001" -> "/root/testdata/sf0.001",
            "sf0.01" -> "/root/testdata/sf0.01")) {
        val df = graft.SparkEntry.queries(name)(s, d)
        pr(s"$name@$label schema=${df.schema.simpleString}")
        df.collect().sortBy(_.toString).foreach(r => pr(s"$name@$label $r"))
      }
    } else {
      for (name <- args.toSeq;
          (label, d) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
            "sf0.1" -> "/root/testdata/sf0.1")) {
        val t = minOf2(graft.SparkEntry.queries(name)(s, d)
          .write.mode("overwrite").format("noop").save())
        pr(f"$name@$label  min=$t%.2fs")
      }
    }
    s.stop()
  }
}
