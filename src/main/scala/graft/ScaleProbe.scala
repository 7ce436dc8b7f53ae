package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-growth probe for the dedup/ANN family: replicates the sf0.1 planted
  * corpus K× (K = 1, 2, 4) and times each bucketed plan. Replicas are made
  * mutually disjoint — every word gets a per-replica suffix, embeddings are
  * rotated per replica — so the duplicate structure grows LINEARLY with K
  * (each replica contains its own planted dups; no cross-replica pairs).
  * A sub-quadratic plan shows t(4K)/t(K) ≈ 4 and output rows ≈ K × base;
  * an all-pairs plan would show ≈ 16×.
  *
  * Prints one JSON line per (op, K) with seconds and result rows.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // Optional second arg: comma-separated replication factors (default
    // "1,2,4"; "1,10" = the sf1-equivalent 10× probe).
    val ks = if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
             else Seq(1, 2, 4)
    // Optional third arg: comma-separated op names — probe only these
    // (empty/absent = probe everything).
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    // Optional fourth arg "scalePartitions": set shuffle.partitions = 32×K
    // for each K — the cluster contract made measurable. local[32] pins 32
    // shuffle partitions regardless of data size, so a probe whose
    // partitions saturate (ngram_prefix's gram tables at K=10) shows
    // super-linear wall from partition-local sort/spill volume, not from
    // plan shape; a real cluster sizes partitions with the data. This flag
    // reproduces that sizing so the claim is a measured row, not prose.
    val scalePartitions = args.length > 3 && args(3) == "scalePartitions"
    val spark = GraftSession.get("graft-scale-probe")

    def corpusK(k: Int): DataFrame =
      (0 until k).map { r =>
        DedupOps.plantedCorpus(spark, sfDir).select(
          (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          col("lang"), col("source"),
          // suffix every word: replicas share zero n-grams
          regexp_replace(col("text"), "(\\S+)", s"$$1r$r").as("text"))
      }.reduce(_.unionByName(_))

    def embeddingsK(k: Int): DataFrame =
      (0 until k).map { r =>
        val v = col("v")
        val rot = r % 16 + (if (r > 0) 1 else 0)
        DedupOps.plantedEmbeddings(spark, sfDir).select(
          (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          col("label"),
          // rotate components per replica: iid random vectors decorrelate
          // across replicas while within-replica planted dups stay cos = 1
          (if (rot == 0) v
           else concat(slice(v, rot + 1, 64 - rot), slice(v, 1, rot))).as("v"))
      }.reduce(_.unionByName(_))

    val measured = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double, Long)]
    def probe(op: String, k: Int, df: => DataFrame): Unit = {
      if (only.nonEmpty && !only.contains(op)) return
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      measured += ((op, k, sec, rows))
      println(f"""{"op":"$op","k":$k,"sec":$sec%.2f,"rows":$rows}""")
    }

    // count() prunes derived columns — a narrow per-row pipeline would
    // time as a scan. Hash every output column into a filter so the whole
    // projection is computed, then count the row set. The predicate must
    // be one the optimizer cannot fold away: xxhash64 is non-nullable, so
    // isNotNull would constant-fold to true and the filter (and with it
    // every derived column) would vanish from the plan; comparing the
    // hash against a constant is non-provable and survives. (Odds of the
    // sentinel value actually occurring: 2^-64 per row.)
    def probeForced(op: String, k: Int, df: => DataFrame): Unit = probe(op, k, {
      val d = df
      d.filter(xxhash64(d.columns.map(c => col("`" + c + "`")): _*) =!= lit(42L))
    })

    // warmup at k=1 so codegen/scan setup is not attributed to the first op
    DedupOps.minhashPairs(corpusK(1)).count()

    for (k <- ks) {
      if (scalePartitions) {
        spark.conf.set("spark.sql.shuffle.partitions", (32 * k).toString)
        // AQE's coalescer folds small post-shuffle partitions back to the
        // core count, silently undoing the knob — turn it off so the probe
        // actually runs 32×K sort partitions
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      }
      probe("dedup_minhash", k, DedupOps.minhashPairs(corpusK(k)))
      probe("dedup_simhash", k, DedupOps.simhashPairs(corpusK(k)))
      probe("ngram_prefix", k,
        DedupOps.ngramJaccardPairsPrefix(corpusK(k), 3, 0.4, Seq("lang", "source")))
      probe("embedding_lsh", k, DedupOps.embeddingPairsLsh(embeddingsK(k), 0.95))
      // SemDeDup centroid blocking: training + assignment are linear
      // passes and candidates are cell-bounded — wall must track ~K
      probe("dedup_semantic", k, DedupOps.semanticDedupPairs(embeddingsK(k), 0.95))
      // ANN: the query side stays FIXED while the corpus grows — per-query
      // cost must track corpus size linearly (bucket/cell membership), so
      // total wall should grow ~K, not K².
      val annCorpus = embeddingsK(k)
      val queries = annCorpus.filter(col("vec_id") < 1000 && col("vec_id") % 100 === 0)
      probe("ann_lsh", k, graft.operators.AnnOps.lshTopK(annCorpus, queries, k = 10))
      probe("ann_ivf", k, {
        // the registered two-level path: corpus-sized coarse/fine counts,
        // fixed-candidate-volume probe — per-query cost constant in K
        val ops = graft.operators.AnnOps
        val n = annCorpus.count()
        val idx = ops.ivf2Train(annCorpus, n, ops.IvfCellTarget)
        ops.ivf2ProbeTopK(annCorpus, queries, k = 10, idx,
          ops.ivf2Cprobe(ops.ivf2Ncoarse(n)), ops.ivf2NprobeF(ops.IvfCellTarget))
      })
      // the one join-shaped crawler op: child assembly = equi-join + agg;
      // per-replica id offsets keep children within their replica, so both
      // sides and the output grow exactly ~K — a super-linear wall means
      // the join degenerated (broadcast of the corpus side / cartesian)
      probe("sdi_children", k, graft.operators.SyncOps.sdiChildren(
        corpusK(k).select(
          concat(lit("md-"), col("doc_id")).as("metadataIdentifier"),
          concat(lit("2021-01-0"), col("doc_id") % 9 + 1).as("changeDate"),
          lit(null).cast("string").as("linkProtocol"),
          when(col("doc_id") % 3 === 0, array(
            concat(lit("md-"), col("doc_id") + 1),
            concat(lit("md-"), col("doc_id") + 2)))
            .otherwise(array().cast("array<string>"))
            .as("agg_associated_isComposedOf"))))

      // ---- round-8 operators (forced: their outputs are derived per-row
      // columns that a bare count() would prune away)

      // word-count corpus LM + broadcast-hot join + 1-row percentile cuts:
      // the word-key join and both aggs must all track corpus size ~K
      probeForced("perplexity_bucket", k,
        graft.operators.TextAnalysis.perplexityBucket(corpusK(k), "text"))
      // shard-local windows: nShards bounds every sort partition, so the
      // pack assignment must stay ~K at any replication
      probeForced("sequence_pack", k,
        graft.operators.TextAnalysis.sequencePack(corpusK(k), "text"))
      // per-stratum bottom-k with a K-scaled budget → output rows ~K and
      // the stratum windows stay bounded by the per-stratum slice
      probeForced("mixture_sample", k,
        graft.operators.TextAnalysis.mixtureSample(corpusK(k), "lang", "doc_id",
          weights = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.05),
          totalBudget = 20000L * k))
      // line stats per-row + gram-count partial aggs, no gram-key window
      probeForced("quality_repetition", k,
        graft.operators.TextAnalysis.repetitionQuality(corpusK(k), "text"))
      // hashed-bigram stats + broadcast ratio + percentile cutoff — the
      // perplexity shape; wall must track the exploded gram volume ~K
      probeForced("dsir_select", k,
        graft.operators.TextAnalysis.dsirSelect(corpusK(k), "text", "doc_id",
          isTarget = col("lang") === "en"))
      // line explode → bounded hot-line table → anti join → doc re-collect
      probeForced("line_dedup", k,
        graft.operators.TextAnalysis.lineDedup(
          corpusK(k).withColumn("text",
            concat_ws("\n", lit("Accept cookies banner line"), col("text"),
              concat(lit("Unique tail "), col("doc_id")))), "text"))
      // the full sdi site pipeline over synthesized records — a pure
      // narrow projection chain; super-linear growth would mean a plan
      // regression (the pipeline has no joins at all)
      probeForced("site_sdi", k, graft.operators.SiteNormalizers.normalizeSdi(
        graft.operators.SiteNormalizers.sdiSyntheticDocs(corpusK(k)),
        obligations = Map("http://rod/1" -> "Reporting obligation 1"),
        currentYear = 2016, archivedExpires = "2026-08-10",
        themeTaxonomy = Map("Water" -> "water")))

      // the RICHEST site pipeline (the full fise field mapping, the most
      // expensive site query in the suite): like site_sdi it is a pure
      // narrow projection chain with zero joins, so its cost must be
      // row-bound (scan + codegen), not column-bound — wall tracks ~K at
      // worst, and near-flat while fixed plan overhead dominates
      probeForced("site_sdi_fise", k,
        graft.operators.SiteNormalizers.normalizeSdiFise(
          graft.operators.SiteNormalizers.sdiFiseSyntheticDocs(corpusK(k)),
          obligations = Map("http://rod/1" -> "Reporting obligation 1"),
          currentYear = 2016, archivedExpires = "2026-08-10"))
      // label propagation over bounded star clusters (+ sparse chain
      // links): iteration count is set by cluster DIAMETER, which is
      // data-independent here, so total wall = iters × (one edges⋈labels
      // join + one min-agg) and must track edges ~K — super-linear growth
      // would mean the per-iteration join degenerated
      probe("dedup_cluster", k,
        graft.operators.GraphOps.dedupClusterQuery(
          corpusK(k).select(col("doc_id"))))

      // ---- round-10 operators

      // 3 power iterations over a 2-out-regular graph: per-iteration cost is
      // one edges⋈ranks join + one dst-keyed agg — wall must track edges ~K
      probe("crawl_rank", k, {
        val ids = corpusK(k).select(col("doc_id"))
        val st = ids.agg(count(lit(1)).as("n"), min("doc_id").as("mn"))
        val withS = ids.crossJoin(broadcast(st))
        def dst(a: Int, b: Int) =
          col("mn") + ((col("doc_id") - col("mn")) * a + b) % col("n")
        val edges = withS.select(col("doc_id").as("src"), dst(31, 7).as("dst"))
          .unionByName(withS.select(col("doc_id").as("src"), dst(17, 3).as("dst")))
          .filter(col("src") =!= col("dst"))
        graft.operators.GraphOps.pageRank(edges, iters = 3)
      })
      // compiled ES search: one broadcast stats agg + one scoring scan +
      // top-k — the 25-row output is fixed, the two scans grow ~K.
      // Query terms carry replica-0's word suffix (corpusK appends "r<r>"
      // to every word) so the match clause actually scores rows.
      probe("es_query", k, graft.operators.EsQuery.search(
        corpusK(k).withColumn("n_chars", length(col("text"))),
        graft.operators.EsQuery.demoSearchBody
          .replace("data merge", "datar0 merger0")))
      // per-row repair chain (literal replaces + 3 regexes): scan-bound
      probeForced("text_fix", k, graft.operators.TextAnalysis.textFix(
        corpusK(k), "text"))
      // trafilatura-class extraction: container-selection kernel + chrome
      // pruning + line filter, all per-row — must scale at scan speed
      probeForced("main_text_blocks", k, graft.operators.NormOps.mainContentExtract(
        corpusK(k).withColumn("html", concat(
          lit("<html><head><title>T</title></head><body><header><nav>"),
          lit("<a href=\"/\">Home</a> <a href=\"/x\">X</a></nav></header>"),
          lit("<div class=\"sidebar\"><p>A sidebar teaser sentence long enough for any line filter.</p></div>"),
          lit("<div class=\"article-content\"><p>"), col("text"),
          lit("</p></div><footer><p>Footer legal line kept out by the pruner.</p></footer></body></html>"))),
        "html"))
      // anchored-regex extract + per-row explode, zero shuffle: wall must
      // track the synthesized page volume ~K
      probeForced("link_extract", k, graft.operators.SyncOps.linkExtract(
        corpusK(k)
          .withColumn("html", concat(
            lit("<p>intro</p><a href=\"/a/"), col("doc_id"),
            lit(".html\">Rel <b>link</b></a>"),
            lit("<a href=\"https://ex.eu/b.html\">Abs link</a>"),
            lit("<a href=\"#frag\">skip</a><a href=\"sub/c.html\">Dir link</a>")))
          .withColumn("page_url",
            concat(lit("https://"), col("source"), lit(".x.eu/dir/page.html"))),
        "html", "page_url"))
      // bloom build over seen (~K/3 rows) + broadcast probe + anti-join of
      // the maybe-seen sliver; sized to the replicated seen count
      probe("frontier_bloom", k, {
        def url = concat(lit("https://"), col("source"), lit(".x.eu/"),
          col("doc_id"), lit(".html")).as("url")
        val c = corpusK(k)
        graft.operators.SyncOps.frontierBloom(
          c.select(col("doc_id"), url),
          c.filter(col("doc_id") % 3 === 0).select(url),
          expectedSeen = 3000L * k)
      })
      // robots: per-host rule tables stay constant-size; growth is the url
      // side of the verdict join (hosts = sources x 97 buckets)
      probeForced("robots_fetch", k, {
        val c = corpusK(k)
        def host = concat(col("source"), lit("-"), col("doc_id") % 97)
        val robots = c.select(host.as("host")).distinct()
          .withColumn("content", lit(
            "User-agent: graftbot\nDisallow: /private/\nAllow: /docs/\n" +
            "Disallow: /team\n\nUser-agent: *\nDisallow: /"))
        val urls = c.select(col("doc_id"), host.as("host"),
          concat(lit("https://h.eu/"),
            when(col("doc_id") % 3 === 0, lit("private/")).otherwise(lit("docs/")),
            col("doc_id")).as("url"))
        val rules = graft.operators.SyncOps.parseRobotsTxt(robots, "host", "content")
        graft.operators.SyncOps.robotsCanFetch(rules, urls, "host", "url", "graftbot/1.0")
      })
      // WARC: build one archive per (source, bucket) from the corpus text,
      // parse every record back — file count and record count both grow K x
      probeForced("warc_parse", k, {
        val c = corpusK(k)
        val http = concat(lit("HTTP/1.1 200 OK\r\n\r\n"), col("text"))
        val rec = concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://h.eu/"),
          col("doc_id"),
          lit("\r\nContent-Length: "), octet_length(http), lit("\r\n\r\n"), http,
          lit("\r\n\r\n"))
        val files = c.select(col("source"), (col("doc_id") % 64).as("b"),
            col("doc_id"), rec.as("r"))
          .groupBy("source", "b")
          .agg(concat_ws("", collect_list(col("r"))).as("w"))
        import org.apache.spark.sql.graftbridge.GraftSqlBridge
        files.select(explode(GraftSqlBridge.column(graft.functions.WarcParse(
          GraftSqlBridge.expression(col("w").cast("binary"))))).as("rec"))
          .select(col("rec.target_uri"), col("rec.content_length"), col("rec.offset"))
      })
      // BPE pair counting: replica word-suffixes make the distinct-word
      // table grow K x (the worst case — real corpora dedup far harder)
      probeForced("bpe_pairs", k,
        graft.operators.TextAnalysis.bpePairs(corpusK(k), "text", topK = 200))
      // host aggregation + stats join-back; hosts grow with the corpus
      probeForced("domain_filter", k, {
        val c = corpusK(k)
        graft.operators.TextAnalysis.domainFilter(
          c.select(col("doc_id"), col("text"),
            concat(col("source"), lit("-"), col("doc_id") % 997).as("host")),
          "host", isBad = length(col("text")) % 10 < 3,
          minDocs = 1L, maxBadFraction = 0.9)
      })
      // int8 quantization: pure narrow projection — must scale at scan speed
      probeForced("embed_quantize", k,
        graft.operators.AnnOps.quantizeEmbeddings(embeddingsK(k), "v")
          .select(col("vec_id"), col("q_scale"), col("q_codes")))
      // C4 span dedup: sentence explode + one span-key groupBy + anti-join
      // + reassembly; replica suffixes keep spans distinct across replicas
      probeForced("span_dedup", k,
        graft.operators.DedupOps.spanDedup(
          corpusK(k).select(col("doc_id"),
            regexp_replace(col("text"), "\\. ", ".|").as("text")),
          "text", "doc_id", splitRegex = "\\|"))
      // anchor aggregation: per-(target, anchor) counts + capped tops;
      // hub targets (id mod 997) keep the key count growing with the data
      probeForced("anchor_text", k, {
        val c = corpusK(k)
        graft.operators.TextAnalysis.anchorText(
          c.select(col("doc_id").as("src"),
            concat(lit("https://hub.eu/p/"), col("doc_id") % 997).as("t"),
            concat(lit("label "), col("doc_id") % 13).as("a")),
          "t", "a", "src", maxTexts = 3)
      })
      // blocklist gate: broadcast semi-join over the exploded token stream
      probeForced("badwords_filter", k, {
        val c = corpusK(k)
        val bl = c.select(explode(split(trim(lower(col("text"))), " ")).as("w"))
          .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w")).limit(20).select("w")
        graft.operators.TextAnalysis.badwordsFilter(c, "text", "doc_id", bl)
      })
      // hashed linear classifier: gram volume grows K x, the 64-row model
      // broadcast and the doc-key partial agg are the only non-narrow steps
      probeForced("quality_classifier", k, {
        val c = corpusK(k)
        val weights = spark.range(64).select(
          col("id").as("bucket"),
          ((pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(201L)) - 100L) / lit(128.0)).as("weight"))
        graft.operators.TextAnalysis.qualityClassifier(
          c, "text", "doc_id", weights, buckets = 64)
      })
    }

    // Standing record (SCALE.json, like RECALL/SKEW): per-family wall at
    // each K plus the tmax/tmin growth ratio, so sub-linearity trends as
    // a per-round diff instead of a stdout-only claim. GRAFT_SCALE_OUT
    // redirects (e.g. a 1,10 probe record kept beside the default 1,2,4).
    if (measured.nonEmpty) {
      def fnum(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val kLo = measured.map(_._2).min
      val kHi = measured.map(_._2).max
      val fams = measured.map(_._1).distinct.map { op =>
        val byK = measured.filter(_._1 == op).map(t => t._2 -> t._3).toMap
        val ratio = (byK.get(kLo), byK.get(kHi)) match {
          case (Some(a), Some(b)) if a > 0 => b / a
          case _ => -1.0
        }
        val secs = measured.filter(_._1 == op)
          .map(t => s""""k${t._2}":${fnum(t._3)}""").mkString(",")
        s"""{"op":"$op",$secs,"ratio":${fnum(ratio)}}"""
      }
      val worst = measured.map(_._1).distinct.map { op =>
        val byK = measured.filter(_._1 == op).map(t => t._2 -> t._3).toMap
        (byK.get(kLo), byK.get(kHi)) match {
          case (Some(a), Some(b)) if a > 0 => b / a
          case _ => -1.0
        }
      }.max
      val record =
        s"""{"sf":"$sfDir","ks":[${ks.mkString(",")}],""" +
        s""""k_lo":$kLo,"k_hi":$kHi,"max_ratio":${fnum(worst)},""" +
        s""""families":[${fams.mkString(",")}]}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("GRAFT_SCALE_OUT", "SCALE.json")),
        record.getBytes("UTF-8"))
      println(record)
    }
    spark.stop()
  }
}
