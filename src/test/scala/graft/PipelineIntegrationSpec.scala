package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** End-to-end composition check: the reference's DAG chain (d2 frontier →
  * d1 sync diff → d4/d5 normalize + passage split → Logstash/ES bulk
  * hand-off) runs as ONE lazy Spark plan from the operator library, each
  * stage consuming the previous stage's DataFrame. What the reference
  * spreads over Airflow tasks and two ES indices is a single composable
  * pipeline here — the "a user of the reference could switch" claim,
  * executed.
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("frontier → sync diff → normalize → passages → bulk NDJSON composes end-to-end") {
    val docs = Tables.documents(spark, sfDir)

    // d2: URL frontier over synthesized urls (same shape as qCrawlFrontier)
    val ext = element_at(
      array(Seq(".html", "", ".pdf", ".php", ".aspx", "", ".gif", ".jpg", ".png", ".svg").map(lit): _*),
      (col("doc_id") % 10 + 1).cast("int"))
    val urls = docs.select(
      col("doc_id"),
      concat(lit("https://"), col("source"), lit(".example.eu/docs/"),
        (col("doc_id") % 37).cast("string"), ext).as("url"))
    val frontier = SyncOps.crawlFrontier(urls, Seq("/docs/5"), Seq("/docs/1"))
    val nFrontier = frontier.count()
    assert(nFrontier > 0, "frontier keeps crawlable urls")

    // d1: diff the crawled set against a synthetic index snapshot
    val crawled = frontier.select(col("id"),
      (col("id") % 1000).cast("timestamp").as("modified"))
    val indexed = crawled.filter(col("id") % 3 =!= 0)
      .select(col("id"), col("modified"), lit(0).as("error_cnt"))
    val diff = SyncOps.syncDiff(crawled, indexed)
    val byStatus = diff.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("new", 0L) > 0, "docs absent from the index are new")
    assert(byStatus.getOrElse("unchanged", 0L) > 0)
    assert(byStatus.values.sum === nFrontier, "diff partitions the frontier exactly")

    // d4/d5: normalize only the docs that need (re)indexing, then split
    val toIndex = diff.filter(col("status").isin("new", "modified"))
      .join(docs.withColumnRenamed("doc_id", "id"), Seq("id"))
    val normalized = NormOps.fillDescription(
      NormOps.addReadingTime(toIndex, "text", blacklisted = lit(false))
        .withColumn("missing_desc", lit(null).cast("string")),
      "missing_desc", "text")
    val passages = NormOps.textPassages(
      normalized.withColumnRenamed("id", "doc_id"), "text", splitLength = 60, overlap = 15)
    assert(passages.count() >= toIndex.count(), "every indexable doc yields passages")
    assert(passages.filter(col("passage").isNull || col("passage") === "").count() === 0L)

    // Logstash hand-off: bulk NDJSON pairs written one file per partition
    val bulkDocs = passages.select(
      concat(col("doc_id"), lit("_"), col("passage_id")).as("pid"),
      to_json(struct(col("doc_id"), col("passage_id"), col("n_words"))).as("doc_json"))
    val bulk = SearchOps.esBulkFormat(bulkDocs, "passages", "pid", updateOnly = lit(false))
    val out = java.nio.file.Files.createTempDirectory("pipeline").toString
    graft.sources.EsBulkSink.write(bulk, out)
    val lines = spark.read.text(out).count()
    assert(lines === passages.count() * 2,
      "bulk output carries exactly one action + one source line per passage")
  }

  test("canonicalize → frontier → config-driven normalize → cluster composes end-to-end") {
    // The round-5 composition surface, chained: url_canonical feeds the
    // frontier (spelling variants collapse BEFORE dedup), the surviving
    // docs run the config-driven commonNormalizer, and near-dup pairs
    // resolve to clusters — all from library operators, one lazy plan per
    // stage.
    val docs = Tables.documents(spark, sfDir)

    // two spellings of every url; canonicalization must collapse them
    val base = docs.select(col("doc_id"),
      concat(lit("https://example.eu/docs/"), (col("doc_id") % 37).cast("string")).as("url"))
    val variant = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(lit("HTTPS://EXAMPLE.EU:443/docs/"), (col("doc_id") % 37).cast("string"), lit("/")).as("url"))
    val canon = SyncOps.canonicalizeUrls(base.unionByName(variant), "url")
      .select(col("doc_id"), col("url_canonical").as("url"))
    val frontier = SyncOps.crawlFrontier(canon, Nil, Nil)
    assert(frontier.count() === 37,
      "canonicalized variants collapse to one frontier entry per distinct path")

    // config-driven normalization of the frontier docs
    val toNorm = frontier.join(docs.withColumnRenamed("doc_id", "id"), Seq("id"))
      .withColumn("type_raw", when(col("id") % 9 === 0, lit("Plone Site")).otherwise(lit("Article")))
      .withColumn("title", concat(lit("Title "), col("id")))
    val normalized = NormOps.commonNormalizer(toNorm, NormOps.NormConfig(
      typeCol = "type_raw",
      dropTypes = Seq("Plone Site"),
      joinText = Some(NormOps.JoinTextConfig("text", "title", Nil)),
      normMissing = Seq("rights" -> "CC-BY-4.0"),
      countScalarCols = Seq("lang")))
    val n = normalized.count()
    assert(n > 0 && n < 37, "normalizer admission must drop the Plone Site docs")
    assert(normalized.filter(col("rights") =!= "CC-BY-4.0").count() === 0L)
    assert(normalized.filter(col("fulltext").isNull).count() === 0L)

    // pair graph → clusters: planted exact dups resolve to one canonical doc
    val planted = DedupOps.plantedCorpus(spark, sfDir)
    val pairs = DedupOps.dedupExact(planted, "doc_id", "text")
      .filter(col("is_dup"))
      .select(col("keep_id").as("src"), col("doc_id").as("dst"))
    val comps = GraphOps.connectedComponents(pairs)
    val perCluster = comps.groupBy("comp").count()
    assert(perCluster.filter(col("count") < 2).count() === 0L,
      "every cluster in the pair graph has at least two members")
  }

  test("training-data pipeline: gates → dedup → bucket → pack end-to-end") {
    // The whole LLM-data path over the planted-duplicate corpus: quality
    // gates drop junk, exact dedup + components keep one copy per cluster,
    // perplexity terciles stratify, and the survivors pack into
    // fixed-token-budget sequences. Each stage is one of the verified
    // operators; this pins that their schemas actually compose.
    val corpus = DedupOps.plantedCorpus(spark, sfDir)

    // 1. quality gates (thresholds loosened to the synthetic corpus' shape
    //    — the point is composition, the gate rules have their own specs)
    val gated = TextAnalysis.gopherQuality(corpus, "text", minWords = 5)
      .filter(col("gopher_keep"))
    val clean = TextAnalysis.repetitionQuality(gated, "text")
      .filter(col("repetition_keep"))
    assert(clean.count() > 0)

    // 2. exact dedup → components → canonical corpus
    val marked = DedupOps.dedupExact(clean, "doc_id", "text")
    val pairs = marked.filter(col("is_dup"))
      .select(col("keep_id").as("src"), col("doc_id").as("dst"))
    val comps = GraphOps.connectedComponents(pairs)
    val deduped = GraphOps.keepCanonical(clean, comps, "doc_id")
    val nClean = clean.count(); val nDeduped = deduped.count()
    assert(nDeduped < nClean, "planted exact copies must collapse")
    // no two surviving docs share a content hash
    assert(DedupOps.dedupExact(deduped, "doc_id", "text")
      .filter(col("is_dup")).count() === 0L)

    // 3. perplexity stratification partitions the deduped corpus
    val buckets = TextAnalysis.perplexityBucket(deduped, "text")
    assert(buckets.count() === nDeduped)

    // 4. head+middle survivors pack within token budgets
    val sampled = deduped.join(
      buckets.filter(col("ppl_bucket") =!= "tail").select("doc_id"), Seq("doc_id"))
    val packed = TextAnalysis.sequencePack(sampled, "text",
      maxTokens = 512, nShards = 4)
    assert(packed.count() === sampled.count())
    assert(packed.select("shard", "pack_id").distinct().count() > 1)
  }

  test("crawl loop: sitemap tree → canonicalize → bloom → robots → schedule") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // 1. discover pages from a sitemap index (one leaf fetched, one dangling)
    val indexes = Seq(("siteA",
      "<sitemapindex><sitemap><loc>https://a.eu/sm1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.eu/gone.xml</loc></sitemap></sitemapindex>"))
      .toDF("site", "idx")
    val leaves = Seq(("https://a.eu/sm1.xml",
      "<urlset>" + (1 to 12).map(i =>
        s"<url><loc>HTTPS://A.eu:443/p/$i/</loc></url>").mkString + "</urlset>"))
      .toDF("leaf_url", "leaf_xml")
    val pages = operators.SyncOps.sitemapTree(indexes, "idx", leaves, "leaf_url", "leaf_xml")
    // 2. canonicalize (case, default port, trailing slash)
    val canon = operators.SyncOps.canonicalizeUrls(pages, "url")
      .select(col("url_canonical").as("url"))
    // 3. bloom-route around the seen set (pages 1-6 already crawled)
    val seen = (1 to 6).map(i => s"https://a.eu/p/$i").toDF("url")
    val unseen = operators.SyncOps.frontierBloom(canon, seen, expectedSeen = 100)
    // 4. robots verdicts (disallow /p/7)
    val robots = Seq(("a.eu", "User-agent: *\nDisallow: /p/7")).toDF("host", "content")
    val rules = operators.SyncOps.parseRobotsTxt(robots, "host", "content")
    val withHost = unseen.withColumn("host",
      regexp_extract(col("url"), "^https://([^/]*)", 1))
    val allowed = operators.SyncOps.robotsCanFetch(rules, withHost, "host", "url", "anybot")
      .filter(col("allowed")).drop("allowed")
    // 5. politeness schedule: 2 fetch slots per wave per host
    val sched = operators.SyncOps.frontierSchedule(
      allowed.withColumn("priority", lit(1.0)),
      "host", "priority", slotsPerWave = 2, maxPerHost = 100L)
    val out = sched.collect().map(r => r.getAs[String]("url") -> r.getAs[Long]("wave")).toMap
    // pages 8-12 survive (1-6 seen, 7 robots-blocked): 5 urls in waves of 2
    assert(out.keySet == (8 to 12).map(i => s"https://a.eu/p/$i").toSet)
    assert(out.values.max == 2L && out.values.count(_ == 0L) == 2,
      "five fetches pack into waves of two per host")
  }
}
