package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every normalization rule fires, and only on its trigger") {
    import spark.implicits._
    val cases = Seq(
      // case + default port + trailing slash + tracking param + fragment
      ("HTTPS://Example.COM:443/a/b/?utm_source=x&ref=1#frag",
        "https://example.com/a/b?ref=1"),
      // empty path → root; http default port
      ("http://example.com:80", "http://example.com/"),
      // NON-default port survives
      ("http://example.com:8080/x", "http://example.com:8080/x"),
      // all params tracking → no '?'
      ("https://example.com/?utm_source=a&utm_campaign=b&gclid=1&fbclid=2",
        "https://example.com/"),
      // param order is non-semantic: sorted
      ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
      // root slash is kept, not trimmed to empty
      ("https://example.com/", "https://example.com/"),
      // 'utm' without the underscore is NOT a tracking param (guards
      // the oracle's LIKE escape staying in sync with startsWith)
      ("https://example.com/x?utmx=1", "https://example.com/x?utmx=1"),
      // a port is only default FOR ITS SCHEME: http:443 / https:80 keep it
      ("http://example.com:443/x", "http://example.com:443/x"),
      ("https://example.com:80/x", "https://example.com:80/x"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalizeUrl($"url")).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }

  test("canonicalization is idempotent and noise-free over randomized URLs") {
    import spark.implicits._
    // deterministic pseudo-random URL zoo: every combination of case,
    // port, params (order/tracking), fragment, trailing slash
    val rnd = new scala.util.Random(42)
    val urls = (1 to 300).map { i =>
      val scheme = Seq("http", "HTTP", "https", "HTTPS")(rnd.nextInt(4))
      val host = Seq("example.com", "Example.COM", "a.b.example.org")(rnd.nextInt(3))
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/", s"/p$i", s"/a/b$i/")(rnd.nextInt(4))
      val params = rnd.shuffle(Seq(s"ref=$i", "utm_source=x", "z=1", "a=2")
        .take(rnd.nextInt(5)))
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      val frag = Seq("", "#frag")(rnd.nextInt(2))
      s"$scheme://$host$port$path$q$frag"
    }
    val out = urls.toDF("url")
      .select(UrlOps.canonicalizeUrl($"url").as("c1"))
      .select($"c1", UrlOps.canonicalizeUrl($"c1").as("c2"))
      .collect()
    out.foreach { r =>
      val (c1, c2) = (r.getString(0), r.getString(1))
      assert(c1 == c2, s"not idempotent: $c1 -> $c2")
      assert(!c1.contains("#") && !c1.contains("utm_"), s"noise survived: $c1")
      assert(c1.startsWith("http://") || c1.startsWith("https://"))
    }
    // drift guard: the SQL-UDF surface computes the identical result
    graft.functions.GraftFunctions.registerSqlUdfs(spark)
    val viaSql = urls.toDF("url")
      .selectExpr("graft_canonicalize_url(url)").collect().map(_.getString(0))
    assert(viaSql.toSeq == out.map(_.getString(0)).toSeq,
      "SQL UDF must equal the Scala column composition on every input")
  }

  test("q_domain_blocklist: label-boundary suffix semantics, exhaustive accounting") {
    val out = UrlOps.qDomainBlocklist(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    // recompute the ground truth from the synthesis convention
    def hostRule(d: Long): Option[String] = {
      val host = s"h${d % 7}.site${d % 3}.org"
      UrlOps.blockedDomains.filter(r => host == r || host.endsWith("." + r)).sorted.headOption
    }
    val expect = docs.groupBy(d => hostRule(d).getOrElse("_kept"))
      .map { case (b, ds) => b -> ds.length.toLong }
    assert(out == expect, s"got $out expected $expect")
    // both match modes fired: subdomain-suffix (site0.org) and exact
    // host (h3.site1.org), and something survived
    assert(out.contains("site0.org") && out.contains("h3.site1.org") &&
      out.getOrElse("_kept", 0L) > 0L)
    // label-boundary law on the expression itself: notsite0.org must
    // NOT match the site0.org rule
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tricky = Seq((1L, "srcx")).toDF("doc_id", "source")
      .select(explode(transform(
        sequence(lit(0), size(split(lit("a.notsite0.org"), "\\.")) - 1),
        i => array_join(slice(split(lit("a.notsite0.org"), "\\."), i + 1,
          size(split(lit("a.notsite0.org"), "\\."))), "."))).as("sfx"))
      .collect().map(_.getString(0)).toSet
    assert(!tricky.contains("site0.org"),
      "suffix explosion must respect label boundaries")
  }

  test("suffix explosion equals the endsWith reference on 300 randomized hosts (seeded)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(2026)
    val labels = Seq("a", "b", "site0", "notsite0", "x0", "org", "net", "h3", "site1")
    def host() = (1 to (1 + rnd.nextInt(4)))
      .map(_ => labels(rnd.nextInt(labels.length))).mkString(".")
    val hosts = (1 to 300).map(i => (i.toLong, host()))
    // 'org' is a TLD-level rule — the aggressive stressor
    val rules = Seq("site0.org", "h3.site1.org", "b.net", "org")
    def ref(h: String): Option[String] =
      rules.filter(r => h == r || h.endsWith("." + r)).sorted.headOption
    val df = hosts.toDF("id", "host")
    val lab = split(col("host"), "\\.")
    val sfx = transform(sequence(lit(0), size(lab) - 1),
      i => array_join(slice(lab, i + 1, size(lab)), "."))
    val got = df.select(col("id"), explode(sfx).as("sfx"))
      .join(broadcast(rules.toDF("rule")), col("sfx") === col("rule"))
      .groupBy("id").agg(min("rule").as("rule"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hosts.foreach { case (id, h) =>
      assert(got.get(id) == ref(h), s"host $h: got ${got.get(id)} expected ${ref(h)}")
    }
  }

  test("q_host_cap plans the two-phase WindowGroupLimit (the skew guard is real, not assumed)") {
    val plan = UrlOps.qHostCap(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rk <= cap must plan as two-phase WindowGroupLimit")
  }

  test("q_host_cap keeps exactly the cap smallest doc_ids per host") {
    val out = UrlOps.qHostCap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val expect = docs.groupBy(d => s"h${d % 7}.site${d % 3}.org").toSeq
      .flatMap { case (h, ds) =>
        ds.sorted.take(3).zipWithIndex.map { case (d, i) => (h, d, i + 1L) }
      }.toSet
    assert(out.toSet == expect)
    assert(out.groupBy(_._1).forall(_._2.length <= 3))
  }

  test("q_robots_filter: longest match wins, allow beats disallow on ties — vs a plain-Scala model") {
    val out = UrlOps.qRobotsFilter(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getString(2)), r.getString(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent model: string-prefix match, (length, allow) max
    val expect = docs.map { case (d, src) =>
      val host = s"h${d % 7}.site${d % 3}.org"
      val path = s"/$src/p${d % 50}"
      val hits = UrlOps.robotsRules
        .filter { case (h, pfx, _) => h == host && path.startsWith(pfx) }
      val win = hits.sortBy { case (_, pfx, allow) => (pfx.length, allow) }.lastOption
      (d, win.map(_._2),
        if (win.forall(_._3)) "allow" else "block")
    }.sortBy(_._1)
    assert(out.toSeq == expect.toSeq)
    // non-vacuity: a longer ALLOW must have overridden a disallow
    val overridden = docs.exists { case (d, src) =>
      d % 7 == 1 && d % 3 == 1 && src.startsWith("src1")
    }
    assert(overridden, "fixture must exercise the allow-override class")
    assert(out.exists(_._3 == "block") && out.exists(_._3 == "allow"))
  }

  test("q_url_canon: variants collapse losslessly onto min-doc_id keepers") {
    val out = UrlOps.qUrlCanon(spark, dir).collect()
    val docs = graft.core.Tables.load(spark, dir, "documents").count()
    assert(out.map(_.getLong(2)).sum == docs, "every doc lands in exactly one group")
    assert(out.exists(_.getLong(2) > 1), "the synthesis must actually collide variants")
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getString(0).startsWith("https://example.com/")))
    // no canonical URL retains noise the rules must strip
    out.foreach { r =>
      val u = r.getString(0)
      assert(!u.contains(":443") && !u.contains("#") && !u.contains("utm_"),
        s"noise survived canonicalization: $u")
    }
  }
}
