package graft.operators

import graft.functions.NumFns.roundHalfUp
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._

/** ES query-DSL → Spark plan COMPILER — the reference's actual query
  * surface, accepted as data.
  *
  * Every consumer of the reference speaks Elasticsearch search bodies:
  * `lib/elastic.py:57` (`search`) and `:122` (`get_docs`) take a `query`
  * dict plus `size`/`_source`, and the DAGs assemble `bool`
  * must/must_not/should/exists trees (d1_sync.py, d0_find_attr.py) and
  * terms facets. graft already implements each semantic as a typed
  * operator (SearchOps); THIS module closes the loop: a user who has an
  * ES request body can run it unchanged — `EsQuery.search(docs, body)`
  * parses the JSON at PLAN TIME (Jackson, driver-side only; same
  * classpath dependency as graft.config.AirflowVariables) and emits the
  * same declarative plans the typed operators build. Nothing is
  * interpreted per row.
  *
  * Supported surface (what the reference's bodies actually contain):
  *  - `match` (OR-semantics multi-term, BM25-scored — Lucene's default
  *    `_score` since ES 5.x), `match_phrase` (slop 0, native
  *    CountTokenRun kernel), `term` / `terms` / `range` / `exists` /
  *    `match_all`
  *  - `bool` with `must` / `filter` / `must_not` / `should` and
  *    `minimum_should_match` (default 1 when the bool has only `should`
  *    clauses, 0 otherwise — the ES default)
  *  - top-level `size`, `_source`, `sort` (field asc/desc or `_score`)
  *  - `aggs`: `terms` buckets (doc_count-desc, key tiebreak, `size`
  *    capped) with `avg`/`sum`/`min`/`max` sub-aggregations — the facet
  *    shape of `lib/elastic.py`'s terms aggregations
  *
  * Scoring model: `match`/`match_phrase` contribute BM25 (identical
  * formula + broadcast-1-row-stats shape as [[SearchOps.matchBm25TopK]];
  * document frequencies are computed over the INPUT corpus before any
  * filtering, as an index-level stat — exactly ES). Exact-match clauses
  * (`term`/`terms`/`range`/`exists`) contribute their `boost` (default
  * 1.0) when matched — ES's constant-score behavior for filter-type
  * queries lifted into query context. `filter` and `must_not` clauses
  * never score. Clause scores sum left-to-right in document order
  * (Jackson preserves it), so an oracle can mirror the float
  * associativity exactly.
  *
  * Scale shape: one optional broadcast of a 1-row stats aggregate (only
  * if the body contains scoring clauses), then a single filter+project
  * pass over the corpus — no shuffle; top-k collapses to
  * TakeOrderedAndProject. Aggs mode is one partial-agg shuffle per
  * terms agg. The compiler itself runs on the driver at plan time; the
  * emitted plan is all codegen'd built-ins + graft's native kernels.
  */
object EsQuery {

  private val mapper = new ObjectMapper()

  /** One BM25-scoring leaf discovered during compilation; `df` columns in
    * the emitted score expression are named positionally (`df_q<i>_t<j>`)
    * and produced by [[statsFor]].
    */
  private sealed trait Need { def field: String }
  private final case class MatchNeed(field: String, terms: Seq[String]) extends Need
  private final case class PhraseNeed(field: String, terms: Seq[String]) extends Need

  private final class Ctx(val scoring: Boolean) {
    val needs = ListBuffer.empty[Need]
    def add(n: Need): Int = { needs += n; needs.size - 1 }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"es_query: $msg")

  private def singleField(n: JsonNode, what: String): (String, JsonNode) = {
    val fields = n.properties().asScala.toSeq
    if (fields.size != 1) fail(s"$what expects exactly one field, got ${fields.size}")
    val e = fields.head
    (e.getKey, e.getValue)
  }

  private def litOf(v: JsonNode): Column =
    if (v.isTextual) lit(v.asText)
    else if (v.isIntegralNumber) lit(v.asLong)
    else if (v.isNumber) lit(v.asDouble)
    else if (v.isBoolean) lit(v.asBoolean)
    else fail(s"unsupported literal $v")

  /** `{"f": "text"}` or `{"f": {"query": "text", "boost": 2}}`. */
  private def queryAndBoost(spec: JsonNode, key: String): (String, Double) =
    if (spec.isObject) {
      val q = Option(spec.get(key)).getOrElse(fail(s"missing '$key' in $spec"))
      (q.asText, Option(spec.get("boost")).map(_.asDouble).getOrElse(1.0))
    } else (spec.asText, 1.0)

  /** BM25 of one tokenized field vs one term/run tf, df given positionally.
    * Mirrors SearchOps.matchBm25TopK term-for-term (k1=1.2, b=0.75 — the
    * Lucene defaults; constants stay unfolded expressions so the DuckDB
    * oracle lands on identical bits).
    */
  private def bm25(tf: Column, dfCol: Column, dl: Column, sumDl: Column): Column = {
    val n = col("es_n_docs").cast("double")
    val avgdl = sumDl.cast("double") / col("es_n_docs")
    val df = dfCol.cast("double")
    val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
    idf * (tf * (lit(1.2) + lit(1.0))) /
      (tf + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dl.cast("double") / avgdl))
  }

  private def phraseTf(toksCol: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    GraftSqlBridge.column(
      graft.functions.CountTokenRun(GraftSqlBridge.expression(toksCol), terms))
  }

  /** Compile one query node → (match predicate, score contribution). */
  private def clause(node: JsonNode, ctx: Ctx): (Column, Column) = {
    val fields = node.properties().asScala.toSeq
    if (fields.size != 1) fail(s"query clause must have exactly one key, got $node")
    val kind = fields.head.getKey
    val spec = fields.head.getValue
    kind match {
      case "match_all" => (lit(true), lit(0.0))

      case "match" =>
        val (f, body) = singleField(spec, "match")
        val (q, boost) = queryAndBoost(body, "query")
        val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty) fail("empty match query")
        val toks = spaceTokens(col(f))
        val dl = size(toks)
        val tfs = terms.map(t => size(filter(toks, x => x === t)))
        val pred = tfs.map(_ > 0).reduce(_ || _)
        val score = if (!ctx.scoring) lit(0.0) else {
          val i = ctx.add(MatchNeed(f, terms))
          terms.indices.map { j =>
            bm25(tfs(j).cast("double"), col(s"es_df_q${i}_t$j"), dl, col(s"es_sum_dl_$f"))
          }.reduce(_ + _) * lit(boost)
        }
        (pred, score)

      case "match_phrase" =>
        val (f, body) = singleField(spec, "match_phrase")
        val (q, boost) = queryAndBoost(body, "query")
        val terms = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty) fail("empty match_phrase query")
        val toks = spaceTokens(col(f))
        val tf = phraseTf(toks, terms)
        val pred = tf > 0
        val score = if (!ctx.scoring) lit(0.0) else {
          val i = ctx.add(PhraseNeed(f, terms))
          bm25(tf.cast("double"), col(s"es_df_q${i}_t0"), size(toks), col(s"es_sum_dl_$f")) * lit(boost)
        }
        (pred, score)

      case "term" =>
        val (f, body) = singleField(spec, "term")
        val (v, boost) =
          if (body.isObject)
            (Option(body.get("value")).getOrElse(fail(s"term needs 'value': $body")),
              Option(body.get("boost")).map(_.asDouble).getOrElse(1.0))
          else (body, 1.0)
        val pred = col(f) === litOf(v)
        (pred, when(pred, lit(boost)).otherwise(lit(0.0)))

      case "terms" =>
        // a sibling "boost" key is valid ES — strip it before the
        // single-field check and apply it as the constant score
        val boost = Option(spec.get("boost")).map(_.asDouble).getOrElse(1.0)
        val spec2 = spec.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]
        spec2.remove("boost")
        val (f, arr) = singleField(spec2, "terms")
        if (!arr.isArray || arr.isEmpty) fail("terms expects a non-empty array")
        val pred = arr.elements().asScala.toSeq.map(v => col(f) === litOf(v)).reduce(_ || _)
        (pred, when(pred, lit(boost)).otherwise(lit(0.0)))

      case "range" =>
        val (f, body) = singleField(spec, "range")
        // "boost" rides inside the bounds object in ES range bodies
        val boost = Option(body.get("boost")).map(_.asDouble).getOrElse(1.0)
        val preds = body.properties().asScala.toSeq.flatMap { e =>
          e.getKey match {
            case "gte" => Some(col(f) >= litOf(e.getValue))
            case "gt"  => Some(col(f) > litOf(e.getValue))
            case "lte" => Some(col(f) <= litOf(e.getValue))
            case "lt"  => Some(col(f) < litOf(e.getValue))
            case "boost" => None
            case other => fail(s"unsupported range bound '$other'")
          }
        }
        if (preds.isEmpty) fail("empty range")
        val pred = preds.reduce(_ && _)
        (pred, when(pred, lit(boost)).otherwise(lit(0.0)))

      case "exists" =>
        val f = Option(spec.get("field")).getOrElse(fail("exists needs 'field'")).asText
        val boost = Option(spec.get("boost")).map(_.asDouble).getOrElse(1.0)
        val pred = col(f).isNotNull
        (pred, when(pred, lit(boost)).otherwise(lit(0.0)))

      case "prefix" =>
        val (f, body) = singleField(spec, "prefix")
        val (v, boost) = if (body.isObject)
          (Option(body.get("value")).getOrElse(fail(s"prefix needs 'value': $body")).asText,
            Option(body.get("boost")).map(_.asDouble).getOrElse(1.0))
        else (body.asText, 1.0)
        val pred = col(f).startsWith(v)
        (pred, when(pred, lit(boost)).otherwise(lit(0.0)))

      case "wildcard" =>
        // ES wildcard: * = any run, ? = one char, anchored both ends;
        // (?s) because ES wildcards span newlines in field values
        val (f, body) = singleField(spec, "wildcard")
        val (v, boost) = if (body.isObject)
          (Option(body.get("value")).getOrElse(fail(s"wildcard needs 'value': $body")).asText,
            Option(body.get("boost")).map(_.asDouble).getOrElse(1.0))
        else (body.asText, 1.0)
        val regex = v.flatMap {
          case '*' => ".*"
          case '?' => "."
          case c if "\\.[]{}()<>+-=!$^|,#&~'\" ".contains(c) => "\\" + c
          case c => c.toString
        }
        val pred = col(f).rlike(s"(?s)^$regex\\z")  // \z: RE2's $ is end-of-text; Java's $ is terminator-lenient
        (pred, when(pred, lit(boost)).otherwise(lit(0.0)))

      case "bool" =>
        val must = clausesOf(spec, "must").map(clause(_, ctx))
        val filt = clausesOf(spec, "filter").map(clause(_, new Ctx(false)))
        val mustNot = clausesOf(spec, "must_not").map(clause(_, new Ctx(false)))
        val should = clausesOf(spec, "should").map(clause(_, ctx))
        // ES minimum_should_match forms: integer, negative integer
        // (total + n), "N%" / "-N%" (percentage of the should count,
        // rounded down / total minus that). Anything else fails loudly —
        // a silent 0 would disable the constraint.
        val msm = Option(spec.get("minimum_should_match")).map { node =>
          val total = should.size
          val raw = node.asText.trim
          val n =
            if (node.isIntegralNumber) node.asInt
            else if (raw.matches("-?[0-9]+")) raw.toInt
            else if (raw.matches("-?[0-9]+%")) {
              val pct = raw.dropRight(1).toInt
              if (pct >= 0) pct * total / 100
              else total + pct * total / 100
            } else fail(s"unsupported minimum_should_match form '$raw'")
          if (n >= 0) n else math.max(total + n, 0)
        }.getOrElse(
          if (must.isEmpty && filt.isEmpty && should.nonEmpty) 1 else 0)
        val preds =
          // must_not under SQL three-valued logic: NOT(NULL) = NULL would
          // FILTER a doc whose field is NULL, but ES keeps docs where the
          // inner clause does not match (missing field => not matched =>
          // kept) — so a NULL inner match counts as a non-match.
          must.map(_._1) ++ filt.map(_._1) ++
            mustNot.map(p => !coalesce(p._1, lit(false))) ++
            (if (msm > 0 && should.nonEmpty)
              Seq(should.map(c => when(c._1, 1).otherwise(0)).reduce(_ + _) >= msm)
            else Nil)
        val pred = if (preds.isEmpty) lit(true) else preds.reduce(_ && _)
        val scores = must.map(_._2) ++ should.map { case (p, s) => when(p, s).otherwise(lit(0.0)) }
        val score = if (scores.isEmpty) lit(0.0) else scores.reduce(_ + _)
        (pred, score)

      case other => fail(s"unsupported query kind '$other'")
    }
  }

  private def clausesOf(spec: JsonNode, key: String): Seq[JsonNode] =
    Option(spec.get(key)).toSeq.flatMap { n =>
      if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    }

  /** The single 1-row index-statistics aggregate all BM25 leaves share:
    * corpus size, one Σ|D| per scored field, one df per (clause, term).
    * Broadcast back onto the corpus — the same shape as
    * [[SearchOps.matchBm25TopK]], regardless of how many scoring clauses
    * the body contains.
    */
  private def statsFor(docs: DataFrame, needs: Seq[Need]): DataFrame = {
    val dlAggs = needs.map(_.field).distinct.map { f =>
      sum(size(spaceTokens(col(f))).cast("long")).as(s"es_sum_dl_$f")
    }
    val dfAggs = needs.zipWithIndex.flatMap {
      case (MatchNeed(f, terms), i) =>
        val toks = spaceTokens(col(f))
        terms.zipWithIndex.map { case (t, j) =>
          sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"es_df_q${i}_t$j")
        }
      case (PhraseNeed(f, terms), i) =>
        Seq(sum(when(phraseTf(spaceTokens(col(f)), terms) > 0, 1L).otherwise(0L))
          .as(s"es_df_q${i}_t0"))
    }
    val aggs = count(lit(1)).as("es_n_docs") +: (dlAggs ++ dfAggs)
    docs.agg(aggs.head, aggs.tail: _*)
  }

  /** Run an ES search body in query mode: returns matching docs with a
    * `score` column (round 6), ES-sorted (`sort` or `_score` desc with
    * `idCol` tiebreak), `size`-limited (default 10), `_source`-projected.
    */
  def search(docs: DataFrame, body: String, idCol: String = "doc_id"): DataFrame = {
    val root = mapper.readTree(body)
    val ctx = new Ctx(true)
    val (pred, rawScore) = Option(root.get("query")) match {
      case Some(q) => clause(q, ctx)
      case None => (lit(true), lit(0.0))
    }
    val withStats =
      if (ctx.needs.isEmpty) docs
      else docs.crossJoin(broadcast(statsFor(docs, ctx.needs.toSeq)))
    // scoring queries mirror matchBm25TopK's contract exactly (drop rows
    // whose ROUNDED score is 0 — the typed operator's filter); pure
    // filter-context queries score 0 by construction and must keep rows
    val scored0 = withStats
      .withColumn("score", roundHalfUp(rawScore, 6))
      .filter(pred)
    val scored =
      if (ctx.needs.nonEmpty) scored0.filter(col("score") > 0) else scored0
    val sorted = Option(root.get("sort")) match {
      case None => scored.orderBy(desc("score"), col(idCol))
      case Some(s) =>
        val keys = (if (s.isArray) s.elements().asScala.toSeq else Seq(s)).map { e =>
          if (e.isTextual && e.asText == "_score") desc("score")
          else if (e.isTextual) col(e.asText)
          else {
            val (f, o) = singleField(e, "sort")
            val name = if (f == "_score") "score" else f
            if (Option(o.get("order")).exists(_.asText == "desc")) desc(name) else col(name)
          }
        }
        scored.orderBy(keys :+ col(idCol): _*)
    }
    val limited = sorted.limit(Option(root.get("size")).map(_.asInt).getOrElse(10))
    Option(root.get("_source")) match {
      case None => limited
      case Some(src) =>
        val cols = src.elements().asScala.map(_.asText).toSeq
        val keep = (idCol +: cols.filterNot(_ == idCol)) :+ "score"
        limited.select(keep.map(col): _*)
    }
  }

  /** Run an ES body in aggregations mode (`size: 0` semantics): the
    * `query` tree is filter context, then each top-level `aggs` entry
    * must be a `terms` bucket agg (doc_count desc, key-asc tiebreak,
    * `size` buckets kept) with optional `avg`/`sum`/`min`/`max`
    * sub-aggs (rounded to 4 like facet_stats). Output rows:
    * (agg, key, doc_count, <sub-agg columns>), unioned by name across
    * aggs.
    */
  def aggregations(docs: DataFrame, body: String): DataFrame = {
    val root = mapper.readTree(body)
    val filtered = Option(root.get("query")) match {
      case Some(q) => docs.filter(clause(q, new Ctx(false))._1)
      case None => docs
    }
    val aggsNode = Option(root.get("aggs")).orElse(Option(root.get("aggregations")))
      .getOrElse(fail("aggregations mode needs 'aggs'"))
    val parts = aggsNode.properties().asScala.toSeq.map { e =>
      val name = e.getKey
      val spec = e.getValue
      val t = Option(spec.get("terms")).getOrElse(fail(s"agg '$name': only terms aggs supported"))
      val f = Option(t.get("field")).getOrElse(fail(s"agg '$name': terms needs 'field'")).asText
      val topN = Option(t.get("size")).map(_.asInt).getOrElse(10)
      val subs: Seq[(String, Column)] =
        Option(spec.get("aggs")).toSeq.flatMap(_.properties().asScala.toSeq).map { s =>
          val (kind, sb) = singleField(s.getValue, s"sub-agg '${s.getKey}'")
          val vf = col(Option(sb.get("field")).getOrElse(fail("sub-agg needs 'field'")).asText)
          val a = kind match {
            case "avg" => avg(vf)
            case "sum" => sum(vf.cast("double"))
            case "min" => min(vf).cast("double")
            case "max" => max(vf).cast("double")
            case other => fail(s"unsupported sub-agg '$other'")
          }
          s.getKey -> roundHalfUp(a, 4).as(s.getKey)
        }
      filtered.groupBy(col(f).cast("string").as("key"))
        .agg(count(lit(1)).as("doc_count"), subs.map(_._2): _*)
        .orderBy(desc("doc_count"), col("key"))
        .limit(topN)
        .select(lit(name).as("agg") +: col("key") +: col("doc_count") +:
          subs.map { case (n, _) => col(n) }: _*)
    }
    if (parts.isEmpty) fail("aggs must contain at least one aggregation")
    parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  // ------------------------------------------------------------ queries()

  /** The representative search body: a bool of every clause family —
    * BM25-scored match in must, range filter, term must_not, scoring
    * term should — with size/_source, over `documents`.
    */
  val demoSearchBody: String =
    """{
      |  "query": {
      |    "bool": {
      |      "must": [{"match": {"text": "data merge"}}],
      |      "filter": [{"range": {"n_chars": {"gte": 120}}}],
      |      "must_not": [{"term": {"lang": "zh"}}],
      |      "should": [{"term": {"source": "src1"}}]
      |    }
      |  },
      |  "size": 25,
      |  "_source": ["doc_id", "lang", "source"]
      |}""".stripMargin

  def qEsQuery(s: SparkSession, d: String): DataFrame =
    search(Tables.documents(s, d), demoSearchBody)

  /** The representative aggs body: exists-filtered terms facet with an
    * avg sub-agg — the `lib/elastic.py` facet shape.
    */
  val demoAggsBody: String =
    """{
      |  "query": {"bool": {"filter": [{"exists": {"field": "n_chars"}}]}},
      |  "aggs": {
      |    "by_lang": {
      |      "terms": {"field": "lang", "size": 10},
      |      "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}
      |    }
      |  }
      |}""".stripMargin

  def qEsAgg(s: SparkSession, d: String): DataFrame =
    aggregations(Tables.documents(s, d), demoAggsBody)
}
