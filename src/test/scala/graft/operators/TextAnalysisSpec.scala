package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies planted real-language sentences") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog is in the house", "en"),
      (2L, "der hund ist nicht mit der katze und das haus ist alt", "de"),
      (3L, "le chat est dans la maison et les chiens pour le jardin", "fr"),
      (4L, "el perro y los gatos es en la casa para una fiesta", "es"),
      (5L, "il gatto che dorme e il cane di casa non mangia alla sera", "it"))
      .toDF("doc_id", "text", "expected")
    val got = TextAnalysis.langId(df, "text")
      .select("expected", "pred_lang").collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("quality score is bounded and rewards diverse long text") {
    val df = Seq(
      (1L, ("the quick brown fox jumps over a lazy dog and " * 20).trim), // long+diverse-ish
      (2L, "spam spam spam spam spam"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(df, "text")
      .orderBy("doc_id").select("quality").collect().map(_.getDouble(0))
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1), s"diverse long text ${got(0)} should beat spam ${got(1)}")
  }

  test("token counts: whitespace vs regex tokenization of punctuated text") {
    val df = Seq((1L, "Hello, world! It's 42.")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCount(df, "text").collect()(0)
    assert(r.getAs[Long]("ws_tokens") === 4L)
    // Hello , world ! It ' s 42 .  -> 9 regex tokens
    assert(r.getAs[Long]("re_tokens") === 9L)
    assert(r.getAs[Long]("bpe_est") === math.ceil(22 / 4.0).toLong)
  }

  test("winnowing: shared long substring implies shared fingerprint; disjoint docs don't collide") {
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789"
    val df = Seq(
      (1L, s"prefixone $shared suffixone"),
      (2L, s"prefixtwo $shared suffixtwo"),
      (3L, "completely unrelated text with other characters entirely here"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.docFingerprints(df, "text")
      .orderBy("doc_id").select("fingerprints").collect()
      .map(_.getSeq[Int](0).toSet)
    // Winnowing guarantee (k=7, w=4): any shared substring of length >= k+w-1=10
    // yields at least one shared fingerprint.
    assert(fps(0).intersect(fps(1)).nonEmpty, "shared substring must share a fingerprint")
    assert(fps(0).intersect(fps(2)).isEmpty, "disjoint docs should not collide")
  }

  test("gopherQuality gates: prose passes, each junk mode fails its rule") {
    val spark2 = spark
    import spark2.implicits._
    val prose = ("the data pipeline processes documents and " * 12).trim // 84 words, stopwords, clean
    val docs = Seq(
      (1L, prose),
      (2L, "short text that is too brief"),                          // < minWords
      (3L, (("# " * 40) + prose).trim),                              // symbol ratio > 0.1
      (4L, ("1 2 3 4 5 6 7 8 9 0 " * 10 + "the of a b").trim),      // alpha_frac < 0.8
      (5L, ("aa bb cc dd " * 25).trim)                               // no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, "text", minWords = 50)
      .select("doc_id", "gopher_keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L), "clean prose must pass every gate")
    assert(!got(2L), "word-count gate")
    assert(!got(3L), "symbol-ratio gate")
    assert(!got(4L), "alpha-fraction gate")
    assert(!got(5L), "stopword gate")
  }

  test("contamination flags exactly the docs overlapping the benchmark phrases") {
    val docs = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta"), // the benchmark doc itself
      (2L, "prefix words then alpha beta gamma quoted inside other text"), // quotes 3 words
      (3L, "completely different content with no overlap at all"))
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha beta gamma delta")).toDF("phrase")
    val got = TextAnalysis.contamination(docs, bench, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got(0) === ((1L, 2L, true)), "benchmark doc shares both 3-grams")
    assert(got(1) === ((2L, 1L, true)), "a quoted 3-gram is enough to flag")
    assert(got(2) === ((3L, 0L, false)), "clean doc stays clean with an explicit zero")
  }

  test("sequencePack: in-budget start offsets, oversized spill, stable") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.createDataFrame(
      (0L until 40L).map(i => (i, Seq.fill(if (i == 7) 50 else 6)("w").mkString(" ")))
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .sequencePack(docs, "text", maxTokens = 20, nShards = 4)
    // THE invariant: every doc starts at an in-budget offset of its pack
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val offsets = out
      .withColumn("start", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("off_in_pack", col("start") - col("pack_id") * 20)
      .select("off_in_pack").collect().map(_.getLong(0))
    assert(offsets.forall(o => o >= 0 && o < 20))
    // every doc is packed exactly once
    assert(out.count() == 40 && out.select("doc_id").distinct().count() == 40)
    // deterministic under repartitioning
    val a = out.orderBy("doc_id").collect().toSeq
    val b = graft.operators.TextAnalysis
      .sequencePack(docs.repartition(13), "text", maxTokens = 20, nShards = 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("mixtureSample quotas survive binary-double weights (10 x 0.7 = 7)") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(40).selectExpr(
      "id as doc_id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END as src")
    val out = graft.operators.TextAnalysis.mixtureSample(
      docs, "src", "doc_id", Map("a" -> 0.7), totalBudget = 10)
    // 10 x 0.7 is 6.999...9 in doubles — the quota must still be 7
    assert(out.count() == 7)
    assert(out.select("quota").distinct().head.getLong(0) == 7)
    // the unweighted stratum contributes nothing
    assert(out.filter(col("src") === "b").count() == 0)
  }

  test("perplexityBucket: rare-word docs score tail, common-word docs head") {
    import org.apache.spark.sql.functions._
    // 9 docs of common filler + 3 increasingly rare-worded docs
    val docs = spark.createDataFrame(
      (1L to 9L).map(i => (i, "the the the and and of")) ++ Seq(
        (10L, "the and of zyx"),
        (11L, "qqq zyx www uuu"),
        (12L, "ppp ooo nnn mmm kkk jjj"))
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.perplexityBucket(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // identical common docs share the lowest score → head tercile
    assert((1L to 9L).forall(out(_) == "head"))
    // the all-singleton docs land in the tail
    assert(out(11L) == "tail" && out(12L) == "tail")
    assert(out(10L) != "head") // mixed doc leaves the head
    // buckets partition the corpus
    assert(out.values.toSet.subsetOf(Set("head", "middle", "tail")))
  }

  test("dsirSelect ranks target-like docs above off-target docs") {
    import org.apache.spark.sql.functions._
    // target = docs about 'spark cluster shuffle'; raw mixes in cooking
    // docs. A held-out doc written in the target vocabulary must outscore
    // a held-out cooking doc, and selection keeps the top quarter.
    val docs = spark.createDataFrame(
      (1L to 8L).map(i => (i, "spark cluster shuffle partition executor task", true)) ++
      (9L to 16L).map(i => (i, "flour butter sugar oven whisk dough recipe", false)) ++
      Seq((100L, "spark shuffle partition plan", false),    // target-like holdout
          (101L, "butter dough oven tray", false),          // off-target holdout
          (102L, "loner", false))                           // featureless doc
    ).toDF("doc_id", "text", "is_t")
    val out = graft.operators.TextAnalysis
      .dsirSelect(docs, "text", "doc_id", isTarget = col("is_t"),
        buckets = 32, keepFraction = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(100L)._1 > out(101L)._1,
      s"target-like holdout must outscore off-target: ${out(100L)} vs ${out(101L)}")
    assert(out(100L)._2 && !out(101L)._2)
    // every target doc scores above every cooking doc
    assert((1L to 8L).map(out(_)._1).min > (9L to 16L).map(out(_)._1).max)
    // a doc with no bigrams keeps its row at the empty-evidence score 0.0
    assert(out.contains(102L) && out(102L)._1 == 0.0)
  }

  test("lineDedup: boilerplate lines vanish corpus-wide, threshold boundary holds") {
    import org.apache.spark.sql.functions._
    // banner in all 10 docs (>= minDocs=5: removed), near-miss in exactly
    // 4 (kept), unique body lines kept in order; doc 9 is ALL boilerplate
    // and must keep its row, emptied
    val docs = spark.createDataFrame((0L to 9L).map { i =>
      val banner = "ACCEPT COOKIES"
      val nearMiss = if (i < 4) "\nrare but repeated" else ""
      // the blank paragraph break repeats in every doc but is SHORTER
      // than minLineChars — structure must survive the corpus-wide pass
      val body = if (i == 9L) "" else s"\nbody line $i\n\nsecond body $i"
      (i, banner + nearMiss + body)
    }).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.lineDedup(docs, "text", minDocs = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_deduped")).toMap
    assert(out(0L) == "rare but repeated\nbody line 0\n\nsecond body 0")
    assert(out(5L) == "body line 5\n\nsecond body 5") // order + blank kept
    assert(out(9L) == "") // fully-boilerplate doc keeps an emptied row
    assert(out.size == 10)
    assert(!out.values.exists(_.contains("ACCEPT COOKIES")))
  }

  test("perplexityBucket: broadcast-hot fast path matches the all-tail result") {
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(
      (1L to 9L).map(i => (i, "the the the and and of")) ++ Seq(
        (10L, "the and of zyx"),
        (11L, "qqq zyx www uuu"),
        (12L, "ppp ooo nnn mmm kkk jjj"))
    ).toDF("doc_id", "text")
    def run(hot: Int) = graft.operators.TextAnalysis
      .perplexityBucket(docs, "text", hotWords = hot)
      .orderBy("doc_id").collect().toSeq
    // hotWords=2 splits tokens across BOTH branches ("the"/"and" resolve
    // from the broadcast, the rest shuffle); the scores and buckets must
    // be identical to the everything-hot and everything-tail extremes
    assert(run(2) == run(1 << 16))
    assert(run(0) == run(1 << 16))
  }

  test("fixText repairs the classic mojibake and sanitizes invisibles") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val cases = Seq(
      // the cp1252 read of UTF-8 "It’s — “quoted”…" (close-quote family
      // excluded: its second byte is unprintable in cp1252)
      (1L, "Itâ€™s â€” â€œquoted â€¦", "It’s — “quoted …"),
      (2L, "CafÃ© niÃ±o GÃ¶teborg franÃ§ais", "Café niño Göteborg français"),
      (3L, "Â«quoteÂ» at 5Â°C", "«quote» at 5°C"),
      (4L, "nb\u00a0sp and\u0007ctl\u200bzw", "nb sp andctlzw"),
      (5L, "a  b   c", "a b c"),
      (6L, "already clean text.", "already clean text."))
    val got = graft.operators.TextAnalysis
      .textFix(cases.map(c => (c._1, c._2)).toDF("doc_id", "text"), "text")
      .select("doc_id", "text_fixed", "changed")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    cases.foreach { case (id, in, want) =>
      assert(got(id)._1 == want, s"doc $id: '${got(id)._1}' != '$want'")
      assert(got(id)._2 == (in != want), s"doc $id changed flag")
    }
    // idempotence: a fixed text survives a second pass unchanged
    val once = cases.map(c => (c._1, got(c._1)._1)).toDF("doc_id", "text")
    val twice = graft.operators.TextAnalysis.textFix(once, "text")
      .filter(col("changed")).count()
    assert(twice == 0L, "fixText must be idempotent")
  }

  test("qualityClassifier: planted weights separate good from bad docs") {
    import org.apache.spark.sql.functions.{col, lit, pmod, conv, substring, md5}
    // a model that loves the word "science" and hates "spam": put every
    // feature bucket at 0 except the two words' buckets
    val spark2 = spark
    import spark2.implicits._
    def bucketOf(g: String): Long = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(g).substring(0, 8), 16)
      h % 64
    }
    val good = bucketOf("science")
    val bad = bucketOf("spam")
    assume(good != bad, "fixture words must land in distinct buckets")
    val weights = (0L until 64L).map { b =>
      (b, if (b == good) 4.0 else if (b == bad) -4.0 else 0.0)
    }.toDF("bucket", "weight")
    val docs = Seq(
      (1L, "science science science"),
      (2L, "spam spam spam spam"),
      (3L, "neutral words only here")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassifier(docs, "text", "doc_id", weights, buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("quality_prob"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L)._1 > 0.8 && out(1L)._2, "science doc scores high and keeps")
    assert(out(2L)._1 < 0.2 && !out(2L)._2, "spam doc scores low and drops")
    // neutral doc: all features weight 0 (unless a bigram collides with the
    // two planted buckets) → z near 0 → prob near 0.5
    assert(math.abs(out(3L)._1 - 0.5) < 0.2)
  }

  test("qualityClassifier plan: weight table broadcasts; one doc-key aggregate") {
    val p = graft.SparkEntry.queries("quality_classifier")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "the 64-row model must broadcast")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin", "Window"))
      assert(!p.contains(bad), s"plan contains $bad")
  }

  test("domainFilter: threshold boundaries and blocklist") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      // host "half": 4 docs, exactly 2 bad → frac 0.5 == max → KEPT
      (1L, "half", true), (2L, "half", true), (3L, "half", false), (4L, "half", false),
      // host "most": 3 of 4 bad → 0.75 > 0.5 → dropped
      (5L, "most", true), (6L, "most", true), (7L, "most", true), (8L, "most", false),
      // host "tiny": 1 doc < minDocs 2 → dropped
      (9L, "tiny", false),
      // host "evil": clean but blocklisted
      (10L, "evil", false), (11L, "evil", false)
    ).toDF("doc_id", "host", "bad")
    val out = TextAnalysis.domainFilter(docs, "host", col("bad"),
      blocklist = Some(Seq("evil").toDF("host")), minDocs = 2L, maxBadFraction = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 4L),
      "exactly-at-threshold host keeps; over-threshold, tiny, and blocklisted drop")
  }

  test("bpePairs: weighted pair counts over distinct words, known answer") {
    val spark2 = spark
    import spark2.implicits._
    // "ab ab abc" → words: ab(x2), abc(x1) → pairs: a_b: 2+1=3, b_c: 1
    val docs = Seq((1L, "ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairs(docs, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("a_b" -> 3L, "b_c" -> 1L),
      "pair counts weighted by word frequency, ordered count desc then pair")
  }

  test("corpusStats: one row per lang with exact token/byte mass") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "en", "one two", "s1"),
      (2L, "en", "héllo", "s2"),   // 6 bytes, 5 chars
      (3L, "de", "ein", "s1")).toDF("doc_id", "lang", "text", "source")
    val out = TextAnalysis.corpusStats(docs, "lang", "text", "source")
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("tokens"), r.getAs[Long]("bytes"),
         r.getAs[Long]("sources"))).toMap
    assert(out("en") == (2L, 3L, 13L, 2L), "2 docs, 2+1 tokens, 7+6 bytes, 2 sources")
    assert(out("de") == (1L, 1L, 3L, 1L))
  }

  test("qualityClassifier: sparse model table divides by the FULL feature count") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    def bucketOf(g: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(g).substring(0, 8), 16) % 64
    val hot = bucketOf("science")
    // model stores ONLY the one hot bucket — every other gram must still
    // count in the denominator
    val sparse = Seq((hot, 6.4)).toDF("bucket", "weight")
    val docs = Seq((1L, "science a b c d e f g")).toDF("doc_id", "text")
    // grams: 8 unigrams + 7 bigrams = 15 features; z = 6.4/15 (unless a
    // bigram collides into the hot bucket, which would only raise z)
    val out = TextAnalysis.qualityClassifier(docs, "text", "doc_id", sparse, buckets = 64)
      .collect().head.getAs[Double]("quality_prob")
    val zUpper = 1.0 / (1.0 + math.exp(-(2 * 6.4 / 15)))
    assert(out > 0.5 && out <= zUpper + 1e-6,
      s"sparse model must average over all 15 features, got prob $out")
  }

  test("anchorText: totals cover ALL inbound links, not just the surfaced anchors") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val links = Seq(
      (1L, "t", "home"), (2L, "t", "home"), (3L, "t", "home"),
      (4L, "t", "click"), (5L, "t", "click"),
      (6L, "t", "here"),
      (7L, "t", "")) // blank anchor: a link, not an anchor text
      .toDF("src", "url", "anchor")
    val r = TextAnalysis.anchorText(links, "url", "anchor", "src", maxTexts = 2)
      .collect().head
    assert(r.getAs[Long]("inbound_links") == 7L, "all links count, blank included")
    assert(r.getAs[Long]("n_sources") == 7L)
    assert(r.getAs[String]("top_anchors") == "home|click", "cap only limits surfaced strings")
  }
}
