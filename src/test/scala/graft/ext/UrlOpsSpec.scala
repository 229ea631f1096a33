package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url").select(UrlOps.normalize(col("url"))).head().getString(0)

  test("normalize: scheme/case/port/www/query/fragment/trailing-slash all collapse") {
    assert(norm("https://www.Site3.COM:443/p/9/") == "site3.com/p/9")
    assert(norm("HTTP://site3.com:80/p/9?utm_source=x#frag") == "site3.com/p/9")
    assert(norm("https://site3.com/p/9") == "site3.com/p/9")
    // path case is PRESERVED; host case is not
    assert(norm("http://SITE3.com/P/Nine") == "site3.com/P/Nine")
    // non-default port survives (a different origin)
    assert(norm("https://site3.com:8443/p/9") == "site3.com:8443/p/9")
    // bare host, no path
    assert(norm("https://www.site3.com/") == "site3.com")
  }

  test("registeredDomain: two-part public suffixes keep three labels") {
    val hosts = Seq("sub.site3.co.uk", "www.site3.co.uk", "site3.co.uk",
      "a.b.site3.com", "site3.com", "localhost").toDF("h")
    val out = hosts.select(col("h"), UrlOps.registeredDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("sub.site3.co.uk") == "site3.co.uk")
    assert(out("www.site3.co.uk") == "site3.co.uk")
    assert(out("site3.co.uk") == "site3.co.uk")
    assert(out("a.b.site3.com") == "site3.com")
    assert(out("site3.com") == "site3.com")
    assert(out("localhost") == "localhost")
  }

  test("perDomainCap keeps exactly k lowest-ordered docs per domain") {
    val docs = (0L until 100L).map(i => (i, s"site${i % 3}.com")).toDF("doc_id", "domain")
    val out = UrlOps.perDomainCap(docs, Seq(col("doc_id")), k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == 15)
    val byDomain = out.groupBy(_._2)
    assert(byDomain.keySet == Set("site0.com", "site1.com", "site2.com"))
    // lowest doc_ids win: domain site0.com holds 0,3,6,9,12
    assert(byDomain("site0.com").map(_._1).sorted.toSeq == Seq(0L, 3L, 6L, 9L, 12L))
  }
}
