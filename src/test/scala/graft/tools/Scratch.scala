package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad for ad-hoc query timing — transient. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Unit): Double = Seq(time(body), time(body)).min
    def pr(msg: String): Unit = System.err.println(s"[probe] $msg")

    for (name <- args.toSeq;
        (label, d) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
          "sf0.1" -> "/root/testdata/sf0.1")) {
      val t = minOf2(graft.SparkEntry.queries(name)(s, d)
        .write.mode("overwrite").format("noop").save())
      pr(f"$name@$label  min=$t%.2fs")
    }
    s.stop()
  }
}
