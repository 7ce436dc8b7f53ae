package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

import graft.operators.NormOps.{ContentTypeConfig, NormConfig}
import graft.operators.SyncOps.PloneSiteConfig

/** Config-as-data: the reference drives every site through ONE
  * `variables.json` document (2,000+ lines of runtime config) loaded by
  * lib/airflow_variables.py:14-80 / lib/variables.py:5-36 — site configs
  * (`config_<site>`), shared normalizer maps (`default_normalizers`,
  * `sdi_normalizers`), app-level site registries (`app_*.Sites`), the
  * `obligations` and `theme_taxonomy` lookups, and the NLP service
  * parameters. graft's site pipelines take the same knobs as Scala
  * parameters; this loader parses the SAME JSON SHAPE into those
  * parameter types, so onboarding a site or tweaking a blacklist is a
  * data change, not a recompile, and a config lifted from the reference
  * is faithful BY CONSTRUCTION.
  *
  * Jackson (shipped with Spark) preserves JSON object field order —
  * load-bearing: the reference iterates insertion-ordered Python dicts
  * and `normProp` renames / `normMissing` `field:` refs are
  * order-sensitive (see [[graft.operators.NormOps.NormConfig]]).
  *
  * Everything here is plan-time driver-side work on a KB-scale document;
  * nothing touches the data path.
  */
object AirflowVariables {

  /** A site config's `normalize` section (e.g. config_bise.normalize):
    * admission lists + the path→content-type location rules.
    */
  final case class NormalizeSection(
      whitelist: Seq[String],
      blacklist: Seq[String],
      locationRules: Seq[(String, Seq[String])],
      locationRulesFallback: Option[String])

  /** One `<name>_normalizers` variable (default_normalizers,
    * sdi_normalizers): the shared common_normalizer maps. `normMissing`
    * keeps only JSON-scalar defaults, stringified (the reference's rare
    * list default `[]` means "fill with an empty list", which graft's
    * removeEmpty already normalizes to NULL — dropping the entry is the
    * relational equivalent).
    */
  final case class NormalizersVariable(
      normObj: Map[String, String],
      normProp: Seq[(String, Seq[String])],
      normMissing: Seq[(String, String)],
      blackMap: Map[String, Seq[String]],
      whiteMap: Map[String, Seq[String]],
      proplist: Seq[String])

  /** One `config_<site>` variable — the knobs graft's operators consume.
    * Transport-only keys (concurrency, scrape_with_js, avoid_cache_*,
    * headless chrome, ES query bodies) are intentionally not surfaced;
    * SURVEY §6 scopes transport out.
    */
  final case class SiteConfig(
      siteType: String, // "plone_rest_api" | "sitemap" | "singlepage" | "sdi"
      url: String,
      apiPart: String,
      normalizersVariable: String,
      normalize: Option[NormalizeSection],
      stripSelectors: Seq[String], // trafilatura.remove_by_selector
      typesBlacklist: Seq[String],
      portalTypes: Seq[String],
      fixItemsUrl: Option[(String, String)], // (with_api, without_api)
      attrMapping: Seq[(String, Seq[String])], // attribute_to_content_type_mapping.mapping
      attrMappingName: Option[String], // …_mapping.name (the subjects column)
      ignoreRobotsTxt: Boolean,
      deleteThreshold: Option[Double], // config_sdi "threshold" (d2 guard, %)
      nlpTxtProps: Seq[String], // nlp_preprocessing.text.whitelist
      nlpTxtPropsBlack: Seq[String]) // nlp_preprocessing.text.blacklist

  /** The `nlp_services.split` parameters [[graft.operators.NormOps]]'
    * textPassages consumes (nlp_services_default in variables.json).
    */
  final case class PassageSplitConfig(
      splitLength: Int,
      splitOverlap: Int,
      respectSentenceBoundary: Boolean,
      fulltextField: String,
      destFieldName: String)

  /** One field of a hand-authored `elastic_mapping_*` variable (see
    * [[Variables.elasticMapping]]); renders back to index DDL via
    * [[graft.sources.EsIndexDdl.mappingPropertiesFromConfig]].
    */
  final case class EsMappingField(
      name: String,
      fieldType: String,
      analyzer: Option[String],
      copyTo: Seq[String],
      /** The "fields" sub-object rendered verbatim (compact JSON) — a
        * hand-authored ignore_above/extra sub-field must survive into the
        * DDL byte-faithfully, not collapse to a hardcoded default.
        */
      fieldsJson: Option[String],
      fielddata: Boolean,
      /** Every other per-field setting (index, format, …) passed through
        * verbatim as (key, compact-JSON-value).
        */
      extra: Seq[(String, String)]) {
    /** True iff the fields sub-object has a TOP-LEVEL "keyword" property —
      * re-parsed from the verbatim JSON rather than substring-tested, so a
      * sub-field that merely mentions the token (e.g.
      * `{"raw":{"type":"keyword"}}`) does not false-positive.
      */
    def hasKeywordSub: Boolean = fieldsJson.exists { j =>
      try new ObjectMapper().readTree(j).has("keyword")
      catch { case _: Exception => false }
    }
  }

  def parse(json: String): Variables =
    new Variables(new ObjectMapper().readTree(json))

  /** The parsed document. Accessors mirror what get_all_variables /
    * load_variables_from_disk resolve: per-app Sites registry with its
    * error-retry thresholds, per-site configs, shared normalizer maps,
    * and the global obligations/theme_taxonomy lookups.
    */
  final class Variables(root: JsonNode) {

    private def node(name: String): JsonNode = {
      val n = root.get(name)
      require(n != null, s"variables document has no '$name' key")
      n
    }

    /** A REQUIRED sub-key — fails with the offending path instead of the
      * bare NPE Jackson iteration would throw on a malformed document.
      */
    private def req(n: JsonNode, name: String, where: String): JsonNode = {
      val v = n.get(name)
      require(v != null && !v.isNull, s"$where has no '$name' key")
      v
    }

    private def opt(n: JsonNode, name: String): Option[JsonNode] =
      Option(n.get(name)).filter(!_.isNull)

    private def strSeq(n: JsonNode): Seq[String] =
      n.elements().asScala.map(_.asText).toSeq

    /** A value that is a bare string OR a list of strings (normProp
      * targets, location-rule ct lists).
      */
    private def strOrSeq(n: JsonNode): Seq[String] =
      if (n.isArray) strSeq(n) else Seq(n.asText)

    private def fieldSeq(n: JsonNode): Seq[(String, JsonNode)] =
      n.fields().asScala.map(e => e.getKey -> e.getValue).toSeq

    // ------------------------------------------------------------- apps

    /** `app_<name>.Sites` in document order: site id → config variable
      * name (airflow_variables.py:63-69 iterates this to load configs).
      */
    def sites(app: String): Seq[(String, String)] =
      fieldSeq(req(node(s"app_$app"), "Sites", s"app_$app")).map { case (k, v) => k -> v.asText }

    /** error_retry thresholds with the reference's defaults
      * (airflow_variables.py:20-25: 3 / 10).
      */
    def allowedErrorsForDoc(app: String): Int =
      opt(node(s"app_$app"), "allowed_errors_for_doc").map(_.asInt).getOrElse(3)
    def skipDocCnt(app: String): Int =
      opt(node(s"app_$app"), "skip_doc_cnt").map(_.asInt).getOrElse(10)

    /** The readingTime −1 type blacklist (app conf
      * reading_time_blacklist_op → NormConfig.readingTimeBlacklistTypes).
      */
    def readingTimeBlacklistOp(app: String): Seq[String] =
      opt(node(s"app_$app"), "reading_time_blacklist_op").map(strSeq).getOrElse(Nil)

    // ------------------------------------------------------ site configs

    def siteConfig(name: String): SiteConfig = {
      val c = node(name)
      val normalize = opt(c, "normalize").map { n =>
        NormalizeSection(
          whitelist = opt(n, "whitelist").map(strSeq).getOrElse(Nil),
          blacklist = opt(n, "blacklist").map(strSeq).getOrElse(Nil),
          locationRules = opt(n, "location_rules").map(_.elements().asScala.map { r =>
            req(r, "path", s"a location_rules entry of $name").asText ->
              strOrSeq(req(r, "ct", s"a location_rules entry of $name"))
          }.toSeq).getOrElse(Nil),
          locationRulesFallback = opt(n, "location_rules_fallback").map(_.asText))
      }
      val attr = opt(c, "attribute_to_content_type_mapping")
      val nlpText = opt(c, "nlp_preprocessing").flatMap(opt(_, "text"))
      SiteConfig(
        siteType = opt(c, "type").map(_.asText).getOrElse(""),
        url = opt(c, "url").map(_.asText).getOrElse(""),
        apiPart = opt(c, "url_api_part").map(_.asText).getOrElse(""),
        normalizersVariable = opt(c, "normalizers_variable")
          .map(_.asText).getOrElse("default_normalizers"), // :66 default
        normalize = normalize,
        stripSelectors = opt(c, "trafilatura")
          .flatMap(opt(_, "remove_by_selector")).map(strSeq).getOrElse(Nil),
        typesBlacklist = opt(c, "types_blacklist").map(strSeq).getOrElse(Nil),
        portalTypes = opt(c, "portal_types").map(strSeq).getOrElse(Nil),
        fixItemsUrl = opt(c, "fix_items_url").map(f =>
          req(f, "with_api", s"$name.fix_items_url").asText ->
            req(f, "without_api", s"$name.fix_items_url").asText),
        attrMapping = attr.flatMap(opt(_, "mapping")).map(m =>
          fieldSeq(m).map { case (k, v) => k -> strOrSeq(v) }).getOrElse(Nil),
        attrMappingName = attr.flatMap(opt(_, "name")).map(_.asText),
        ignoreRobotsTxt = opt(c, "ignore_robots_txt").exists(_.asBoolean),
        deleteThreshold = opt(c, "threshold").map(_.asDouble),
        nlpTxtProps = nlpText.flatMap(opt(_, "whitelist")).map(strSeq).getOrElse(Nil),
        nlpTxtPropsBlack = nlpText.flatMap(opt(_, "blacklist")).map(strSeq).getOrElse(Nil))
    }

    // ------------------------------------------------- normalizer variables

    /** `aliases` translates the reference's JSON FIELD names to graft's
      * COLUMN names where they deliberately differ (`@type` → `type_raw`,
      * `objectProvides` → `object_provides`) — applied to normProp
      * sources AND targets, and to proplist entries, so a lifted config
      * lands on the columns graft's operators actually produce.
      */
    def normalizers(name: String,
        aliases: Map[String, String] = Map.empty): NormalizersVariable = {
      val n = node(name)
      def al(s: String): String = aliases.getOrElse(s, s)
      NormalizersVariable(
        normObj = opt(n, "normObj").map(m =>
          fieldSeq(m).map { case (k, v) => k -> v.asText }.toMap).getOrElse(Map.empty),
        normProp = opt(n, "normProp").map(m =>
          fieldSeq(m).map { case (k, v) => al(k) -> strOrSeq(v).map(al) }).getOrElse(Nil),
        normMissing = opt(n, "normMissing").map(m =>
          // a JSON null default means "no default" (dropping it matches
          // the non-scalar [] contract) — isValueNode alone would admit
          // NullNode and fill docs with the literal string "null"
          fieldSeq(m).collect {
            case (k, v) if v.isValueNode && !v.isNull => al(k) -> v.asText
          }).getOrElse(Nil),
        blackMap = opt(n, "blackMap").map(m =>
          fieldSeq(m).map { case (k, v) => al(k) -> strOrSeq(v) }.toMap).getOrElse(Map.empty),
        whiteMap = opt(n, "whiteMap").map(m =>
          fieldSeq(m).map { case (k, v) => al(k) -> strOrSeq(v) }.toMap).getOrElse(Map.empty),
        proplist = opt(n, "proplist").map(strSeq(_).map(al)).getOrElse(Nil))
    }

    /** The reference-JSON → graft column-name deltas (the only two). */
    val graftAliases: Map[String, String] =
      Map("@type" -> "type_raw", "objectProvides" -> "object_provides")

    // --------------------------------------------------- global lookups

    /** rod-obligation link → label ([[graft.operators.SiteNormalizers]]
      * preNormalizeSdi's `obligations` parameter; get_all_variables:49-53).
      */
    def obligations: Map[String, String] =
      Option(root.get("obligations")).map(m =>
        fieldSeq(m).map { case (k, v) => k -> req(v, "label", s"obligations[$k]").asText }.toMap)
        .getOrElse(Map.empty)

    /** theme token → label (normalizeSdi's `themeTaxonomy`;
      * get_all_variables:56-60 — missing variable → empty map).
      */
    def themeTaxonomy: Map[String, String] =
      Option(root.get("theme_taxonomy")).map(m =>
        fieldSeq(m).map { case (k, v) => k -> req(v, "label", s"theme_taxonomy[$k]").asText }.toMap)
        .getOrElse(Map.empty)

    /** One field of an `elastic_mapping_*` variable — the hand-authored
      * per-field index mapping (elastic_mapping_default in
      * variables.json): ES type, optional analyzer, `copy_to` fan-in
      * targets, whether a `.keyword` sub-field exists, fielddata.
      */
    def elasticMapping(name: String): Seq[EsMappingField] = {
      val known = Set("type", "analyzer", "copy_to", "fields", "fielddata")
      // "//" keys are the document format's comment convention — never
      // fields (the same convention normalizers() reads around)
      fieldSeq(node(name)).filterNot(_._1 == "//").map { case (field, n) =>
        EsMappingField(
          name = field,
          fieldType = opt(n, "type").map(_.asText).getOrElse("text"),
          analyzer = opt(n, "analyzer").map(_.asText),
          copyTo = opt(n, "copy_to").map(strSeq).getOrElse(Nil),
          fieldsJson = opt(n, "fields").map(_.toString),
          fielddata = opt(n, "fielddata").exists(_.asBoolean),
          extra = fieldSeq(n).collect {
            case (k, v) if !known.contains(k) && k != "//" => k -> v.toString
          })
      }
    }

    /** The passage-splitter parameters (nlp_services_default.split). */
    def passageSplit(nlpVariable: String): PassageSplitConfig = {
      val s = node(nlpVariable).get("split")
      require(s != null, s"'$nlpVariable' has no 'split' section")
      PassageSplitConfig(
        splitLength = opt(s, "split_length").map(_.asInt).getOrElse(500),
        splitOverlap = opt(s, "split_overlap").map(_.asInt).getOrElse(0),
        respectSentenceBoundary =
          opt(s, "split_respect_sentence_boundary").exists(_.asBoolean),
        fulltextField = opt(s, "fulltext_field").map(_.asText).getOrElse("fulltext"),
        destFieldName = opt(s, "dest_field_name").map(_.asText).getOrElse("nlp_250"))
    }

    // ----------------------------------------------------------- builders

    /** A ready [[NormConfig]] for one site: the site's `normalize`
      * admission lists + its normalizers variable's shared maps + the
      * app-level readingTime blacklist — exactly the dict
      * common_normalizer receives. Site wrappers that need extra knobs
      * (joinText columns, workflowStateCol, normObjCols) `.copy(...)`
      * them on: those are code-level column choices, not config data.
      */
    def normConfigFor(configName: String, app: Option[String] = None): NormConfig = {
      val sc = siteConfig(configName)
      val nv = normalizers(sc.normalizersVariable, graftAliases)
      NormConfig(
        typeWhitelist = sc.normalize.map(_.whitelist).getOrElse(Nil),
        typeBlacklist = sc.normalize.map(_.blacklist).getOrElse(Nil),
        readingTimeBlacklistTypes = app.map(readingTimeBlacklistOp).getOrElse(Nil),
        blackMap = nv.blackMap,
        whiteMap = nv.whiteMap,
        normObj = nv.normObj,
        normProp = nv.normProp,
        normMissing = nv.normMissing)
    }

    /** A ready [[ContentTypeConfig]] for one site's location rules +
      * attr mapping. `locCol`/`attrsCol` are the caller's column names
      * (the reference reads doc fields; graft reads columns).
      */
    def contentTypeConfigFor(configName: String, locCol: String,
        attrsCol: String): ContentTypeConfig = {
      val sc = siteConfig(configName)
      ContentTypeConfig(
        locCol = locCol,
        attrsCol = attrsCol,
        rules = sc.normalize.map(_.locationRules).getOrElse(Nil),
        fallback = sc.normalize.flatMap(_.locationRulesFallback).getOrElse("Webpage"),
        attrMapping = sc.attrMapping.toMap)
    }

    /** A ready [[PloneSiteConfig]] for one plone_rest_api site
      * (crawl_plone_restapi.py's config reads).
      */
    def ploneConfigFor(configName: String): PloneSiteConfig = {
      val sc = siteConfig(configName)
      PloneSiteConfig(
        apiPart = sc.apiPart,
        fixItemsUrl = sc.fixItemsUrl,
        portalTypes = sc.portalTypes,
        typesBlacklist = sc.typesBlacklist)
    }
  }
}
