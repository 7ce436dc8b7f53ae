package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanHtml strips tags like the reference regex and trims") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "  <br/>spaced  "),
      (3L, "<a href=\"x\">link</a> tail"),
      (4L, "<only><tags/>")).toDF("doc_id", "html")
    val got = NormOps.cleanHtmlDocs(df, "html").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 4 collapses to empty and is removed (remove_empty semantics)
    assert(got.toSeq === Seq((1L, "hello world"), (2L, "spaced"), (3L, "link tail")))
  }

  test("readingTime matches words/228 and the blacklist yields -1") {
    val df = Seq((1L, "one two three", false), (2L, "one two three", true))
      .toDF("doc_id", "text", "black")
    val got = NormOps.addReadingTime(df, "text", col("black"))
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_words") === 3L)
    assert(math.abs(got(0).getAs[Double]("reading_time") - 0.0132) <= 1e-9)
    assert(got(1).getAs[Double]("reading_time") === -1.0)
  }

  test("textPassages produces overlapping fixed windows covering every word") {
    val text = (1 to 130).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = NormOps.textPassages(df, "text", splitLength = 60, overlap = 15)
      .orderBy("passage_id").collect()
    // stride 45: starts at 0, 45, 90 -> 3 passages; last has 130-90=40 words
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("n_words")).toSeq === Seq(60L, 60L, 40L))
    assert(rows(1).getAs[String]("passage").startsWith("w46 "))
    // overlap: passage 0 ends at w60, passage 1 starts at w46
    assert(rows(0).getAs[String]("passage").endsWith(" w60"))
  }

  test("sentencePassages respects sentence boundaries within the word budget") {
    val text = "One two three four. Five six seven! Eight nine ten eleven twelve? Thirteen."
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = NormOps.sentencePassages(df, "text", splitLength = 8)
      .orderBy("passage_id").collect()
    // greedy packing: [4w + 3w = 7w], [5w + 1w = 6w]
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("passage") === "One two three four. Five six seven!")
    assert(rows(0).getAs[Int]("n_words") === 7)
    assert(rows(1).getAs[String]("passage") === "Eight nine ten eleven twelve? Thirteen.")
    // no passage exceeds the budget; no sentence is split across passages
    assert(rows.forall(_.getAs[Int]("n_words") <= 8))
  }

  test("sentencePassages keeps an oversized single sentence whole") {
    val long = (1 to 20).map(i => s"w$i").mkString(" ") + "."
    val df = Seq((1L, s"Short one. $long Tail two.")).toDF("doc_id", "text")
    val rows = NormOps.sentencePassages(df, "text", splitLength = 8)
      .orderBy("passage_id").collect()
    assert(rows.length === 3)
    assert(rows(1).getAs[Int]("n_words") === 20) // not split mid-sentence
  }

  test("flattenStructs turns nested structs into dotted-key columns") {
    val json = """{"a": {"b": {"c": 1}, "d": "x"}, "e": 2}"""
    val df = Seq(json).toDF("j")
      .select(from_json(col("j"), schema_of_json(json)).as("root"))
      .select("root.*")
    val flat = NormOps.flattenStructs(df)
    assert(flat.columns.toSeq === Seq("a.b.c", "a.d", "e"))
    val r = flat.collect()(0)
    assert(r.getLong(0) === 1L && r.getString(1) === "x" && r.getLong(2) === 2L)
  }

  test("wordCount uses Unicode word semantics like the reference's Python \\w") {
    val df = Seq((1L, "héllo wörld déjà"), (2L, "plain ascii")).toDF("doc_id", "text")
    val got = df.orderBy("doc_id")
      .select(graft.functions.TextFns.wordCount(col("text")))
      .collect().map(_.getLong(0))
    // ASCII-only \w would split each accented word at the accent (3 → 6)
    assert(got.toSeq === Seq(3L, 2L), "accented words must count as single words")
  }

  test("zsTrim strips exactly DuckDB's trim() set: Zs spaces, not tab/CR/NEL") {
    val cases = Seq(
      "\u00A0x\u00A0" -> "x",          // NBSP stripped
      "\u3000x\u3000" -> "x",          // ideographic space stripped
      "\u2007x\u202Fx\u205F" -> "x\u202Fx", // figure/narrow/math spaces at edges
      "  x  " -> "x",
      "\tx\t" -> "\tx\t",              // tab NOT in the set (DuckDB keeps it)
      "\rx\u0085" -> "\rx\u0085",      // CR/NEL NOT in the set
      "" -> "")
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val got = df.orderBy("id")
      .select(graft.functions.TextFns.zsTrim(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2),
      "zsTrim must match DuckDB trim() byte-for-byte")
  }

  test("wordCount pins the No/So boundary where Java's (?U)\\w diverges") {
    // Category-No digits (½ ² ①) are words — Java's (?U)\w excludes them
    // but Python's \w and the DuckDB twin class include them; circled
    // letters (Ⓐ, So) are NOT words — Java's (?U)\w includes them, the
    // twin class and RE2 exclude them. The explicit class must take the
    // twin's side on both edges.
    val df = Seq(
      (1L, "½"),             // ½  → 1 word
      (2L, "x²"),            // x² → 1 word (² glues to the letter)
      (3L, "① ②"),      // ① ② → 2 words
      (4L, "Ⓐ"),             // Ⓐ  → 0 words (So excluded)
      (5L, "a Ⓐ b")          // Ⓐ between words → 2
    ).toDF("doc_id", "text")
    val got = df.orderBy("doc_id")
      .select(graft.functions.TextFns.wordCount(col("text")))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L, 1L, 2L, 0L, 2L))
  }

  test("normCoverage applies the six coverage-tail rules in reference order") {
    val docs = Seq(
      // geo labels with a null entry; File+visible inherits parent state
      (1L, Seq[String]("Europe", null), Seq("2020-2030"), null.asInstanceOf[String],
        "tok_de", "File", Seq("x.ICountry"), "File", "visible", "archived", null.asInstanceOf[String]),
      // all-null geo → spatial AND places stay null; archived w/o expires stamps
      (2L, Seq[String](null, null), Seq.empty[String], null.asInstanceOf[String],
        null.asInstanceOf[String], "Article", Seq("x.ICountry", "y.IOther"), "Doc", "archived",
        "published", ""),
      (3L, Seq[String]("Asia"), Seq("2021"), "fr", "tok_fr", "Article",
        Seq("y.IOther"), "Doc", "published", "published", "2031-01-01"))
      .toDF("doc_id", "geo_labels", "temporal_labels", "language", "language_token",
        "type_raw", "object_provides", "obj_provides_type", "workflow_state",
        "parent_review_state", "expires")
    val got = NormOps.normCoverage(docs, allowedProvides = Seq("x.ICountry"),
      archivedExpires = "2026-08-10")
      .orderBy("doc_id")
      .select("spatial", "places", "time_coverage", "types", "language",
        "workflow_state", "expires")
      .collect()
    // doc 1: null geo label filtered; File+visible → parent "archived";
    //        the inherited archived state + null expires → stamped (sequential rules)
    assert(got(0).getSeq[String](0) === Seq("Europe"))
    assert(got(0).getSeq[String](1) === Seq("Europe"), "places mirrors spatial")
    assert(got(0).getSeq[String](3) === Seq("File", "x.ICountry"))
    assert(got(0).getString(4) === "tok_de", "language falls back to the token")
    assert(got(0).getString(5) === "archived" && got(0).getString(6) === "2026-08-10")
    // doc 2: empty-after-filter geo → spatial/places null; empty temporal → null;
    //        both language fields null → "en"; archived + empty-string expires → stamped
    assert(got(1).isNullAt(0) && got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(1).getString(4) === "en")
    assert(got(1).getString(6) === "2026-08-10")
    // doc 3: nothing to fix — values pass through
    assert(got(2).getString(4) === "fr" && got(2).getString(5) === "published" &&
      got(2).getString(6) === "2031-01-01")
  }

  test("joinTextFields assembles fulltext with dot/redundancy/empty guards") {
    val docs = Seq(
      // html prop cleaned+dotted+appended; duplicate-text prop skipped
      (1L, "base text", "My Title", "<p>extra info</p>", "extra info"),
      // null title → "no title"; empty props skipped entirely
      (2L, "base text", null.asInstanceOf[String], "", null.asInstanceOf[String]),
      // prop already ends with '.' → no second dot
      (3L, "base text", "", "Already dotted.", "fresh bit"))
      .toDF("doc_id", "text", "title", "p1", "p2")
    val got = NormOps.joinTextFields(docs, "text", "title", Seq("p1", "p2"))
      .orderBy("doc_id").select("fulltext").collect().map(_.getString(0))
    assert(got(0) === "base text\n\nMy Title.\n\nextra info.\n\n",
      s"redundant p2 must be skipped, got: ${got(0)}")
    assert(got(1) === "base text\n\nno title.\n\n")
    assert(got(2) === "base text\n\nno title.\n\nAlready dotted.\n\nfresh bit.\n\n")
  }

  test("contentTypeRules: last rule wins, Webpage pruned, attrs append, admission") {
    val docs = Seq(
      (1L, "/data/maps/3/", "Article", Seq("x")), // exact rule AFTER glob rule wins
      (2L, "//data/other", "News", Seq("DATA")), // glob match + case-insensitive attr map
      (3L, "/nowhere", "Dataset", Seq("x"))) // fallback, single Webpage survives
      .toDF("doc_id", "loc", "type_raw", "attrs")
    val got = NormOps.contentTypeRules(docs,
      rules = Seq("/data/*" -> Seq("Webpage", "Data"), "/data/maps/3" -> Seq("Map")),
      fallback = "Webpage",
      attrMapping = Map("data" -> Seq("Dataset")),
      whitelist = Seq("Article"), blacklist = Seq("News"))
      .orderBy("doc_id")
      .select("object_provides", "admitted").collect()
    assert(got(0).getSeq[String](0) === Seq("Map") && got(0).getBoolean(1),
      "the later exact rule must overwrite the earlier glob match")
    assert(got(1).getSeq[String](0) === Seq("Data", "Dataset") && !got(1).getBoolean(1),
      "Webpage pruned, attr mapping appended case-insensitively, blacklisted type rejected")
    assert(got(2).getSeq[String](0) === Seq("Webpage") && got(2).getBoolean(1),
      "fallback Webpage survives when it is the only type")
  }

  test("boilerplateFilter keeps prose and drops nav/cookie/footer lines") {
    val spark2 = spark
    import spark2.implicits._
    val prose = "This paragraph carries the actual content of the page and is long enough."
    val short = "Short but ends like a sentence."
    val html =
      s"""<html><head><title>T</title></head><body>
         |<nav><a href="/">Home</a> <a href="/x">About</a></nav>
         |<div class="cookie">We use cookies</div>
         |<p>$prose</p>
         |<p>$short</p>
         |<p>Mixed line with one <a href="/y">link</a> inside a full sentence of prose text.</p>
         |<footer>Copyright holder</footer>
         |</body></html>""".stripMargin.replace("\n", "")
    val out = NormOps.boilerplateFilter(
      Seq((1L, html)).toDF("doc_id", "html"), "html")
      .select("text_main").as[String].collect().head
    val lines = out.split("\n").toSeq
    assert(lines.contains(prose), "long prose line must survive")
    assert(lines.contains(short), "short line with terminal punctuation must survive")
    assert(lines.exists(_.startsWith("Mixed line")), "low link-density prose must survive")
    assert(!out.contains("Home"), "all-link nav must drop")
    assert(!out.contains("cookies"), "short unpunctuated cookie banner must drop")
    assert(!out.contains("Copyright"), "footer line must drop")
    assert(!out.contains("T\n") && !lines.contains("T"), "bare title must drop")
  }

  test("boilerplateFilter counts link text split across <br> inside an anchor") {
    val spark2 = spark
    import spark2.implicits._
    // A multi-line nav link: both fragments are pure anchor text and must
    // drop even though the <br> splits the sentinel span across lines.
    val html = "<a href=\"/\">Read the full article about this topic here.<br>" +
      "Second line of the same link ends too.</a>" +
      "<p>Genuine prose outside any anchor long enough to clear the gate.</p>"
    val out = NormOps.boilerplateFilter(Seq((1L, html)).toDF("doc_id", "html"), "html")
      .select("text_main").as[String].collect().head
    assert(out === "Genuine prose outside any anchor long enough to clear the gate.",
      s"split-span link text must not survive, got: $out")
  }

  test("commonNormalizer applies normProp renames in declaration order") {
    val spark2 = spark
    import spark2.implicits._
    // a -> b then b -> c: with ordered application c receives a's value
    // via b; unordered (hash-map) application could give c the ORIGINAL b.
    val docs = Seq(("doc", "va", "vb")).toDF("type_raw", "a", "b")
    val out = NormOps.commonNormalizer(docs, NormOps.NormConfig(
      normProp = Seq("a" -> Seq("b"), "b" -> Seq("c"))))
    val r = out.collect().head
    assert(!out.columns.contains("a") && !out.columns.contains("b"))
    assert(r.getAs[String]("c") === "va", "chained renames follow declaration order")
  }

  test("commonNormalizer re-applies normObj after normMissing (the reference's second pass)") {
    val spark2 = spark
    import spark2.implicits._
    // normalizers.py:583 runs apply_norm_obj AGAIN after apply_norm_missing:
    // a value FILLED by normMissing ("en", constant or field: ref) must not
    // escape the global map the way a single step-8 pass would let it.
    val docs = Seq(
      ("doc", "de", "fr"),                  // present: mapped by the first pass
      ("doc", null: String, "fr")).toDF("type_raw", "lang", "src_lang")
    val out = NormOps.commonNormalizer(docs, NormOps.NormConfig(
      normObj = Map("en" -> "English", "de" -> "German", "fr" -> "French"),
      normObjCols = Some(Seq("lang", "src_lang")),
      normMissing = Seq("lang" -> "en", "ref_lang" -> "field:src_lang")))
    val got = out.select("lang", "ref_lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("German", "French"), ("English", "French")),
      s"normMissing-filled values must pass through normObj again, got $got")
  }

  test("commonNormalizer second normObj pass follows normProp renames of normObjCols") {
    val spark2 = spark
    import spark2.implicits._
    // normObjCols names the PRE-rename column "lang"; normProp moves it to
    // "language", then normMissing fills the NULL with "en". The reference's
    // second apply_norm_obj walks the doc's CURRENT keys (normalizers.py:583),
    // so the filled value in the RENAMED column must still hit the map.
    val docs = Seq(
      ("doc", "de"),
      ("doc", null: String)).toDF("type_raw", "lang")
    val out = NormOps.commonNormalizer(docs, NormOps.NormConfig(
      normObj = Map("en" -> "English", "de" -> "German"),
      normObjCols = Some(Seq("lang")),
      normProp = Seq("lang" -> Seq("language")),
      normMissing = Seq("language" -> "en")))
    assert(!out.columns.contains("lang"), "normProp removes the source key")
    val got = out.select("language").collect().map(_.getString(0)).toSet
    assert(got === Set("German", "English"),
      s"second normObj pass must target the post-rename column, got $got")
  }

  test("boilerplateFilter drops a line whose text is mostly links") {
    val spark2 = spark
    import spark2.implicits._
    val html = "<p>tiny <a>mostly all of this line is anchor text here</a></p>" +
      "<p>This real sentence stays because its words sit outside any anchor element.</p>"
    val out = NormOps.boilerplateFilter(
      Seq((1L, html)).toDF("doc_id", "html"), "html")
      .select("text_main").as[String].collect().head
    assert(out === "This real sentence stays because its words sit outside any anchor element.")
  }

  test("commonNormalizer runs a site_sdi-shaped config end-to-end") {
    // The sdi mapping (normalizers/sites/site_sdi.py header):
    //   metadataIdentifier -> about, original_id, id
    //   isPublishedToAll   -> hasWorkflowState
    //   resourceTitleObject.default -> title, label
    //   th_regions         -> spatial, places
    //   mainLanguage       -> language
    //   resourceAbstractObject.default -> description
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      ("md1", "Air quality", Seq("Europe", "Europe", "Asia"), "eng", "", "dataset", "  Abstract text. "),
      ("md2", "Internal svc", Seq("Europe"), "fre", "published", "service", "x"),
      ("md3", "Water", Seq.empty[String], null.asInstanceOf[String], "published", "dataset", null.asInstanceOf[String])
    ).toDF("metadataIdentifier", "resourceTitleObject", "th_regions",
      "mainLanguage", "isPublishedToAll", "resourceType", "resourceAbstractObject")
    val out = NormOps.commonNormalizer(docs, NormOps.NormConfig(
      typeCol = "resourceType",
      typeBlacklist = Seq("service"),
      workflowStateCol = Some("isPublishedToAll"),
      normObj = Map("eng" -> "en", "fre" -> "fr"),
      normObjCols = Some(Seq("mainLanguage")),
      normProp = Seq(
        "metadataIdentifier" -> Seq("about", "original_id", "id"),
        "resourceTitleObject" -> Seq("title", "label"),
        "th_regions" -> Seq("spatial", "places"),
        "mainLanguage" -> Seq("language")),
      normMissing = Seq("description" -> "field:resourceAbstractObject", "language" -> "en"),
      countListCols = Seq("spatial")))
    val rows = out.orderBy("id").collect()
    assert(rows.length === 2, "blacklisted resourceType 'service' must drop")
    assert(!out.columns.contains("metadataIdentifier"), "normProp removes the source key")
    val r1 = rows.head
    assert(r1.getAs[String]("about") === "md1")
    assert(r1.getAs[String]("original_id") === "md1")
    assert(r1.getAs[String]("title") === "Air quality")
    assert(r1.getAs[String]("label") === "Air quality")
    assert(r1.getAs[Seq[String]]("spatial") === Seq("Europe", "Asia"), "remove_duplicates dedups")
    assert(r1.getAs[Seq[String]]("places") === Seq("Europe", "Asia"))
    assert(r1.getAs[String]("language") === "en", "normObj maps eng -> en before the rename")
    assert(r1.getAs[String]("workflow_state") === "missing", "falsy isPublishedToAll -> missing")
    assert(r1.getAs[String]("description") === "Abstract text.", "field: ref fills from trimmed abstract")
    assert(r1.getAs[Long]("items_count_spatial") === 2L)
    val r3 = rows(1)
    assert(r3.getAs[String]("language") === "en", "missing mainLanguage falls to the constant default")
    assert(r3.getAs[Seq[String]]("spatial") === null, "empty list -> NULL via remove_empty")
    assert(r3.getAs[String]("workflow_state") === "published")
  }

  test("commonNormalizer resolves content types from config rules") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      ("d1", "Article", "/articles/a1", Seq("data")),
      ("d2", "Article", "/other/x", Seq.empty[String])
    ).toDF("id", "portal_type", "url", "subjects")
    val out = NormOps.commonNormalizer(docs, NormOps.NormConfig(
      typeCol = "portal_type",
      contentType = Some(NormOps.ContentTypeConfig(
        locCol = "url", attrsCol = "subjects",
        rules = Seq("/articles/*" -> Seq("Article", "Webpage")),
        fallback = "Webpage",
        attrMapping = Map("Data" -> Seq("Dataset"))))))
    val rows = out.orderBy("id").collect()
    assert(rows.head.getAs[Seq[String]]("object_provides") === Seq("Article", "Dataset"),
      "rule match + Webpage pruning + case-insensitive attr append")
    assert(rows(1).getAs[Seq[String]]("object_provides") === Seq("Webpage"), "fallback type")
    assert(!out.columns.contains("loc") && !out.columns.contains("attrs"),
      "adapter columns must not leak")
  }

  test("commonNormalizer admission matches check_blacklist_whitelist truth table") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq("A", "B", "C").toDF("type_raw")
    def kept(cfg: NormOps.NormConfig): Set[String] =
      NormOps.commonNormalizer(docs, cfg).collect().map(_.getString(0)).toSet
    // whitelist only: only whitelisted pass
    assert(kept(NormOps.NormConfig(typeWhitelist = Seq("A"))) === Set("A"))
    // blacklist only: non-blacklisted pass
    assert(kept(NormOps.NormConfig(typeBlacklist = Seq("B"))) === Set("A", "C"))
    // both: whitelisted OR non-blacklisted (reference's two independent tests)
    assert(kept(NormOps.NormConfig(typeWhitelist = Seq("B"), typeBlacklist = Seq("B", "C"))) === Set("A", "B"))
    // neither: everything passes
    assert(kept(NormOps.NormConfig()) === Set("A", "B", "C"))
  }

  test("applyBlackMap drops blacklisted list values and nulls blacklisted scalars") {
    val docs = Seq(
      (1L, Seq("keep", "drop", "keep2"), "zh"),
      (2L, Seq("drop", "drop"), "en"))
      .toDF("doc_id", "tags", "lang")
    val got = NormOps.applyBlackMap(docs,
      listBlack = Map("tags" -> Seq("drop")),
      scalarBlack = Map("lang" -> Seq("zh")))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1) === Seq("keep", "keep2"))
    assert(got(0).isNullAt(2), "blacklisted scalar becomes NULL")
    assert(got(1).getSeq[String](1) === Seq.empty)
    assert(got(1).getString(2) === "en")
  }

  test("taxonomy: malformed terms drop; duplicate tokens keep the LAST term") {
    import org.apache.spark.sql.functions._
    val xml = spark.range(1).select(lit(
      """<vdex>
        |<term><termIdentifier>climate</termIdentifier>
        |  <caption><langstring language="en">Old label</langstring></caption></term>
        |<term><termIdentifier>nolang</termIdentifier>
        |  <caption><langstring language="de">Klima</langstring></caption></term>
        |<term><caption><langstring language="en">No token</langstring></caption></term>
        |<term><termIdentifier>climate</termIdentifier>
        |  <caption><langstring language="en">New label</langstring></caption></term>
        |</vdex>""".stripMargin).as("xml"))
    val terms = NormOps.taxonomyTerms(xml, "xml")
    // the de-only and token-less terms never make it out
    assert(terms.select("token").collect().map(_.getString(0)).toSeq ==
      Seq("climate", "climate"))
    val vocab = spark.createDataFrame(Seq(
      ("climate", "Vocab label"), ("water", "Water"))).toDF("token", "label")
    val merged = NormOps.mergeTaxonomy(vocab, terms)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // dict-update order: the LAST xml term wins over both the earlier xml
    // term and the vocabulary; vocab-only tokens survive
    assert(merged == Map("climate" -> "New label", "water" -> "Water"))
  }

  test("passageClean: header/footer only strip when identical across pages") {
    def clean(text: String): String =
      NormOps.passageClean(
        spark.range(1).select(lit(text).as("t")), "t",
        cleanHeaderFooter = true)
        .head.getString(1)

    // identical header+footer on both pages strip; body survives
    assert(clean("H\na\nF\fH\nb\nF") == "a\fb")
    // differing footer stays; identical header still strips
    assert(clean("H\na\nF1\fH\nb\nF2") == "a\nF1\fb\nF2")
    // single page: nothing is a running header
    assert(clean("H\na\nF") == "H\na\nF")
    // pages that are ONLY the shared line never go negative-length
    assert(clean("H\fH") == "\f")
    // whitespace + empty-line cleans still apply
    assert(clean("  x  \n\n\n\n\ny") == "x\n\ny")
  }

  test("nlpPreprocess: extract-else-fallback, auto-discovery, pdf append") {
    // rn 0: html extracts → fallback fields ignored
    // rn 1: empty html → title + whitelist + auto-discovered struct props
    // rn 2: empty html, whitelist prop TEXT EQUAL to the auto prop's →
    //       redundancy guard keeps only the first copy
    // rn 3: empty html, null title → "no title"; pdf sidecar appended
    val docs = spark.range(4).selectExpr(
      "cast(id as int) as rn",
      """CASE WHEN id = 0
           THEN '<p>a prose line long enough to clear the thirty char bar</p>'
           ELSE '' END as web_html""",
      "CASE WHEN id = 3 THEN cast(null as string) ELSE concat('T', id) END as title",
      """CASE WHEN id = 2 THEN 'Shared text'
            WHEN id = 1 THEN 'White prop' ELSE '' END as wl""",
      """named_struct('content-type', 'text/html',
                      'data', CASE WHEN id = 2 THEN '<b>Shared text</b>'
                                   ELSE concat('<b>Auto ', id, '</b>') END) as auto_html""",
      "named_struct('content-type', 'text/plain', 'data', 'SECRET') as blocked",
      "named_struct('content-type', 'application/pdf', 'data', 'BINARY') as not_text",
      "CASE WHEN id = 3 THEN 'pdf body' ELSE '' END as pdf_text")
    val out = NormOps.nlpPreprocess(docs,
        txtProps = Seq("wl", "missing_prop"), txtPropsBlack = Seq("blocked"))
      .orderBy("rn").select("nlp_text").collect().map(_.getString(0))

    assert(out(0) ==
      "a prose line long enough to clear the thirty char bar\n\n")
    assert(out(1) == "\n\nT1.\n\nWhite prop.\n\n\n\nAuto 1.\n\n\n\n")
    // redundancy guard: the auto prop's text already appears via whitelist
    assert(out(2) == "\n\nT2.\n\nShared text.\n\n\n\n")
    // "no title" fallback + pdf append; SECRET/BINARY never appear anywhere
    assert(out(3) == "\n\nno title.\n\n\n\nAuto 3.\n\n\n\npdf body")
    assert(!out.exists(t => t.contains("SECRET") || t.contains("BINARY")))
  }

  test("nlpPreprocess containerSelect=true extracts only the main container") {
    val docs = spark.range(1).selectExpr(
      "0 as rn",
      """concat('<div class="sidebar"><p>A sidebar teaser sentence a line filter would happily keep.</p></div>',
        |       '<div class="article-content"><p>Container prose that the upgraded extractor keeps.</p></div>')
        |  as web_html""".stripMargin,
      "'T' as title", "'' as pdf_text")
    val flat = NormOps.nlpPreprocess(docs).select("nlp_text").head.getString(0)
    assert(flat.contains("sidebar teaser") && flat.contains("Container prose"),
      "the line filter alone keeps both prose blocks")
    val contained = NormOps.nlpPreprocess(docs, containerSelect = true)
      .select("nlp_text").head.getString(0)
    assert(contained == "Container prose that the upgraded extractor keeps.\n\n",
      "container selection drops the sidebar the density filter cannot")
  }
}
