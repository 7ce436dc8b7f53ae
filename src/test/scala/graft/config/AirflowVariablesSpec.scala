package graft.config

import graft.SparkSpec
import graft.operators.SiteNormalizers
import graft.operators.SyncOps.PloneSiteConfig

/** The config-as-data loader against a variables.json-SHAPED fixture —
  * the exact key structure of the reference document (dags/variables.json
  * + lib/airflow_variables.py): app registry, site configs, shared
  * normalizer variables, obligations/theme_taxonomy, nlp services. The
  * load-bearing assertions compare loaded values against the hand-built
  * Scala constants, so a config lifted from the reference is faithful by
  * construction, and one end-to-end run proves the loaded bise config
  * produces output identical to the hand-built pipeline.
  */
class AirflowVariablesSpec extends SparkSpec {

  // a faithful subset of the reference document's shape: same key names,
  // same nesting, same value styles (incl. the "//" comment key, scalar
  // vs list normProp targets, numeric normMissing defaults, a list
  // default, and the name/mapping attr section)
  private val fixture = """
  {
    "app_global_search": {
      "Sites": {
        "bise": "config_bise",
        "climate": "config_climate",
        "eea_en": "config_eea_en",
        "noise": "config_noise",
        "sdi": "config_sdi_prod"
      },
      "allowed_errors_for_doc": 2,
      "elastic_config": {
        "elastic": "elastic_global_search",
        "elastic_mapping": "elastic_mapping_default",
        "elastic_raw_mapping": "elastic_raw_mapping_default",
        "elastic_settings": "elastic_settings_default"
      },
      "nlp_config": "nlp_services_default",
      "rabbitmq_config": "rabbitmq_global_search",
      "reading_time_blacklist_op": [
        "Figure (chart/map)", "Chart (interactive)", "Infographic",
        "Dashboard", "Map (interactive)", "Data set",
        "External data reference"
      ],
      "schedule_interval": "@daily",
      "skip_doc_cnt": 100
    },
    "config_bise": {
      "concurrency": 2,
      "ignore_robots_txt": false,
      "normalize": {
        "blacklist": [],
        "location_rules": [
          {"ct": ["Topic page"], "path": "/protected-areas"},
          {"ct": ["Topic page", "Webpage"], "path": "/protected-areas/*"},
          {"ct": ["Topic page", "Webpage"], "path": "/threats/*"},
          {"ct": ["Topic page", "Webpage"], "path": "/ecosystems/*"}
        ],
        "location_rules_fallback": "Webpage",
        "whitelist": ["Document", "Page", "CompositePage", "File",
                      "News Item", "visualization", "bise_factsheet"]
      },
      "normalizers_variable": "default_normalizers",
      "scrape_pages": true,
      "trafilatura": {
        "remove_by_selector": [".header-wrapper", ".footerWrapper",
          ".eea.header", "#inpage-navigation"]
      },
      "type": "plone_rest_api",
      "url": "https://biodiversity.europa.eu",
      "url_api_part": "++api++"
    },
    "config_climate": {
      "concurrency": 1,
      "normalize": {
        "whitelist": [
          "eea.climateadapt.publicationreport", "eea.climateadapt.aceproject",
          "File", "News Item", "collective.cover.content", "Folder",
          "eea.climateadapt.informationportal",
          "eea.climateadapt.guidancedocument", "eea.climateadapt.casestudy",
          "eea.climateadapt.organisation", "eea.climateadapt.mapgraphdataset",
          "eea.climateadapt.tool", "eea.climateadapt.indicator",
          "eea.climateadapt.adaptationoption", "Document", "Event", "Page",
          "eea.climateadapt.video", "eea.climateadapt.c3sindicator",
          "mission_story", "mission_tool", "mission_funding_cca"
        ]
      },
      "normalizers_variable": "default_normalizers",
      "portal_types": [],
      "type": "plone_rest_api",
      "url": "https://climate-adapt.eea.europa.eu",
      "url_api_part": "cca-backend"
    },
    "config_eea_en": {
      "attribute_to_content_type_mapping": {
        "mapping": {
          "country fact sheet": ["Country fact sheet"],
          "country profile": ["Country fact sheet"]
        },
        "name": "subjects"
      },
      "fix_items_url": {
        "with_api": "https://www.eea.europa.eu/++api++/en",
        "without_api": "https://www.eea.europa.eu/en"
      },
      "ignore_robots_txt": false,
      "normalizers_variable": "default_normalizers",
      "robots_txt": "https://www.eea.europa.eu/robots.txt",
      "type": "plone_rest_api",
      "types_blacklist": ["Image", "LIF", "discodataconnector",
                          "elasticconnector"],
      "url": "https://www.eea.europa.eu/en",
      "url_api_part": "++api++/en"
    },
    "config_noise": {
      "concurrency": 1,
      "ignore_robots_txt": true,
      "normalizers_variable": "default_normalizers",
      "trafilatura": {"remove_by_selector": []},
      "type": "singlepage",
      "url": "https://noise.eea.europa.eu/",
      "url_api_part": ""
    },
    "config_sdi_prod": {
      "endpoint": "sdi.eea.europa.eu",
      "fetch_all_docs": true,
      "nlp_preprocessing": {
        "text": {
          "blacklist": [],
          "whitelist": ["resourceTitleObject.default",
                        "resourceAbstractObject.default"]
        }
      },
      "normalizers_variable": "sdi_normalizers",
      "path": "/catalogue/srv/api/search/records",
      "port": 443,
      "threshold": 35,
      "type": "sdi",
      "url": "https://sdi.eea.europa.eu/catalogue/srv/api/search/records"
    },
    "default_normalizers": {
      "//": "Normalise missing properties with the given values",
      "blackMap": {
        "effectiveDate": ["None", "Unknown"],
        "expires": ["None", "Unknown"],
        "temporalCoverage": ["-1"],
        "year": ["None", "Unknown"]
      },
      "normMissing": {
        "creation_date": "field:created",
        "creator": "European Environment Agency (EEA)",
        "fleschReadingEaseScore": 0,
        "language": "en",
        "readingTime": -1,
        "references": [],
        "spatial": "Other"
      },
      "normObj": {
        "CompositePage": "Webpage",
        "Document": "Webpage",
        "File": "File",
        "Folder": "Webpage",
        "Kosovo (UNSCR 1244/99)": "Kosovo",
        "News Item": "News",
        "Page": "Webpage",
        "bise_factsheet": "Country fact sheet",
        "visualization": "Chart (interactive)"
      },
      "normProp": {
        "@type": "objectProvides",
        "about": ["id", "about"],
        "location": "spatial",
        "themes": "topic",
        "title": ["title", "label"]
      },
      "proplist": ["id", "about", "language", "title", "description"],
      "whiteMap": {}
    },
    "sdi_normalizers": {
      "//": "Normalise missing properties with the given values",
      "blackMap": {},
      "normMissing": {},
      "normObj": {
        "Kosovo (UNSCR 1244/99)": "Kosovo",
        "true": "published"
      },
      "normProp": {
        "@type": "objectProvides",
        "OrgForResource": "organisation",
        "about": ["id", "about"],
        "isPublishedToAll": "hasWorkflowState",
        "mainLanguage": "language",
        "resourceAbstractObject.default": "description",
        "resourceTitleObject.default": ["title", "label"],
        "sdi_gemet": "gemet",
        "sdi_rod": "rod",
        "sdi_spatial": ["spatial", "places"],
        "sdi_spatialRepresentationType": "spatialRepresentationType",
        "sdi_topics": "topic"
      },
      "proplist": ["id", "about", "language"],
      "whiteMap": {}
    },
    "obligations": {
      "http://rod.eionet.europa.eu/obligations/102": {
        "instrument": "http://rod.eionet.europa.eu/instruments/411",
        "label": "UNFCCC"
      },
      "http://rod.eionet.europa.eu/obligations/104": {
        "instrument": "http://rod.eionet.europa.eu/instruments/36",
        "label": "Exchange of information Decision on fresh water (consolidated)"
      }
    },
    "theme_taxonomy": {
      "02sx2jjmd4": {"label": "Fisheries and aquaculture"},
      "07723e8f6t": {"label": "Pollution"}
    },
    "elastic_mapping_default": {
      "SearchableText": {
        "copy_to": ["did_you_mean", "all_fields_for_freetext"],
        "fielddata": true,
        "type": "text"
      },
      "about": {
        "copy_to": ["all_fields_for_freetext"],
        "fielddata": true,
        "fields": {"keyword": {"ignore_above": 256, "type": "keyword"}},
        "type": "text"
      },
      "cluster_name": {
        "analyzer": "none",
        "copy_to": ["did_you_mean", "all_fields_for_freetext"],
        "fielddata": true,
        "type": "text"
      },
      "issued": {"type": "date"},
      "readingTime": {"type": "float"}
    },
    "nlp_services_default": {
      "converter": {"host": "nlp-searchlib", "path": "api/converter", "port": "8000"},
      "embedding": {"dest_field_name": "nlp_250", "host": "nlp-searchlib",
                    "path": "api/embedding", "port": "8000"},
      "split": {
        "clean_empty_lines": true,
        "clean_whitespace": true,
        "dest_field_name": "nlp_250",
        "fulltext_field": "fulltext",
        "split_by": "word",
        "split_length": 250,
        "split_overlap": 50,
        "split_respect_sentence_boundary": false
      }
    }
  }"""

  private lazy val v = AirflowVariables.parse(fixture)

  test("app registry, error-retry thresholds, readingTime blacklist") {
    assert(v.sites("global_search") == Seq(
      "bise" -> "config_bise", "climate" -> "config_climate",
      "eea_en" -> "config_eea_en", "noise" -> "config_noise",
      "sdi" -> "config_sdi_prod"))
    assert(v.allowedErrorsForDoc("global_search") == 2)
    assert(v.skipDocCnt("global_search") == 100)
    assert(v.readingTimeBlacklistOp("global_search").head == "Figure (chart/map)")
  }

  test("loaded bise config equals the hand-built constants") {
    val sc = v.siteConfig("config_bise")
    assert(sc.siteType == "plone_rest_api")
    assert(sc.apiPart == "++api++")
    val n = sc.normalize.get
    assert(n.whitelist == SiteNormalizers.biseWhitelist)
    assert(n.locationRules == SiteNormalizers.biseLocationRules)
    assert(n.locationRulesFallback.contains("Webpage"))
    assert(sc.stripSelectors == Seq(".header-wrapper", ".footerWrapper",
      ".eea.header", "#inpage-navigation"))
  }

  test("loaded climate whitelist equals the hand-built constant") {
    assert(v.siteConfig("config_climate").normalize.get.whitelist ==
      SiteNormalizers.climateWhitelist)
  }

  test("loaded eea_en attr mapping + plone config equal the hand-built ones") {
    val sc = v.siteConfig("config_eea_en")
    assert(sc.attrMapping == SiteNormalizers.eeaEnAttrMapping)
    assert(sc.attrMappingName.contains("subjects"))
    assert(v.ploneConfigFor("config_eea_en") == PloneSiteConfig(
      apiPart = "++api++/en",
      fixItemsUrl = Some("https://www.eea.europa.eu/++api++/en" ->
        "https://www.eea.europa.eu/en"),
      typesBlacklist = Seq("Image", "LIF", "discodataconnector",
        "elasticconnector")))
  }

  test("loaded sdi_normalizers equals graft's shared sdi config") {
    val nv = v.normalizers("sdi_normalizers", v.graftAliases)
    val hand = SiteNormalizers.sdiNormalizersConfig
    assert(nv.normObj == hand.normObj)
    assert(nv.normProp == hand.normProp) // order-sensitive comparison
    assert(nv.normMissing.isEmpty && nv.blackMap.isEmpty && nv.whiteMap.isEmpty)

    val sdi = v.siteConfig("config_sdi_prod")
    assert(sdi.normalizersVariable == "sdi_normalizers")
    assert(sdi.deleteThreshold.contains(35.0))
    assert(sdi.nlpTxtProps == Seq("resourceTitleObject.default",
      "resourceAbstractObject.default"))
  }

  test("default_normalizers: field order kept, scalars stringified, list defaults dropped") {
    val nv = v.normalizers("default_normalizers", v.graftAliases)
    // insertion-ordered normProp with the alias translation applied
    assert(nv.normProp == Seq(
      "type_raw" -> Seq("object_provides"),
      "about" -> Seq("id", "about"),
      "location" -> Seq("spatial"),
      "themes" -> Seq("topic"),
      "title" -> Seq("title", "label")))
    // numeric defaults stringify; the [] list default is dropped
    val nm = nv.normMissing.toMap
    assert(nm("fleschReadingEaseScore") == "0")
    assert(nm("readingTime") == "-1")
    assert(nm("creation_date") == "field:created")
    assert(!nm.contains("references"))
    assert(nv.blackMap("year") == Seq("None", "Unknown"))
    assert(nv.normObj("Document") == "Webpage")
  }

  test("obligations, theme taxonomy, passage-split parameters") {
    assert(v.obligations("http://rod.eionet.europa.eu/obligations/102") == "UNFCCC")
    assert(v.themeTaxonomy("07723e8f6t") == "Pollution")
    val ps = v.passageSplit("nlp_services_default")
    assert(ps.splitLength == 250 && ps.splitOverlap == 50)
    assert(!ps.respectSentenceBoundary)
    assert(ps.fulltextField == "fulltext" && ps.destFieldName == "nlp_250")
  }

  test("normConfigFor merges site admission with the shared maps") {
    val cfg = v.normConfigFor("config_bise", app = Some("global_search"))
    assert(cfg.typeWhitelist == SiteNormalizers.biseWhitelist)
    assert(cfg.typeBlacklist.isEmpty)
    assert(cfg.readingTimeBlacklistTypes.contains("Dashboard"))
    assert(cfg.normObj("Kosovo (UNSCR 1244/99)") == "Kosovo")
    assert(cfg.normProp.head == ("type_raw" -> Seq("object_provides")))

    val ct = v.contentTypeConfigFor("config_bise", locCol = "loc", attrsCol = "attrs")
    assert(ct.rules == SiteNormalizers.biseLocationRules)
    assert(ct.fallback == "Webpage")
  }

  test("elastic mapping loads and renders back to deterministic index DDL") {
    val fields = v.elasticMapping("elastic_mapping_default")
    assert(fields.map(_.name) == Seq("SearchableText", "about",
      "cluster_name", "issued", "readingTime")) // document order
    val about = fields.find(_.name == "about").get
    assert(about.fieldType == "text" && about.hasKeywordSub && about.fielddata)
    assert(about.copyTo == Seq("all_fields_for_freetext"))
    assert(fields.find(_.name == "cluster_name").get.analyzer.contains("none"))
    assert(fields.find(_.name == "issued").get.fieldType == "date")

    val json = graft.sources.EsIndexDdl.mappingPropertiesFromConfig(fields)
    assert(json == graft.sources.EsIndexDdl.mappingPropertiesFromConfig(fields),
      "must be byte-deterministic")
    // the fields sub-object passes through VERBATIM (the document's own
    // key order) — a hand-authored ignore_above must survive unchanged
    assert(json.contains(
      """"about":{"type":"text","copy_to":["all_fields_for_freetext"],""" +
        """"fields":{"keyword":{"ignore_above":256,"type":"keyword"}},"fielddata":true}"""))
    assert(json.contains(""""issued":{"type":"date"}"""))
    assert(json.contains(""""cluster_name":{"type":"text","analyzer":"none","""))
  }

  test("portfolioFromVariables runs the app's sites off the parsed document") {
    import org.apache.spark.sql.functions.col
    val noiseDocs = spark.range(2).selectExpr(
      "cast(id as int) as rn",
      "concat('https://noise.eea.europa.eu/p/', id) as id",
      "'noise text with enough words for a body' as text",
      "'summary' as summary",
      "'<html><head><title>N</title></head><body>x</body></html>' as web_html")
    val climateDocs = spark.range(2).selectExpr(
      "cast(id as int) as rn",
      "concat('https://climate-adapt.eea.europa.eu/en/k/', id) as id",
      "'Document' as type_raw", "'published' as review_state",
      "false as include_in_observatory", "false as include_in_mission",
      "'2019-05-01' as publication_date", "concat('uid-', id) as uid",
      "'2018-01-01' as created", "cast(null as string) as cca_published",
      "cast(null as string) as issued",
      "array('k1') as keywords",
      "array(named_struct('title','Agriculture')) as sectors",
      "cast(null as array<struct<title:string>>) as climate_impacts",
      "cast(null as array<struct<title:string>>) as elements",
      "cast(null as array<struct<title:string>>) as origin_website",
      "cast(null as array<struct<title:string>>) as country",
      "cast(null as array<struct<title:string>>) as climate_threats",
      "cast(null as array<struct<title:string>>) as key_system",
      "cast(null as array<struct<token:string,title:string>>) as health_impacts",
      "cast(null as array<struct<token:string,title:string>>) as key_type_measures",
      "cast(null as struct<title:string>) as funding_programme",
      "cast(null as struct<countries:array<string>,transnational_region:array<string>>) as geographic",
      "cast(null as struct<scales:struct<preview:struct<download:string>>>) as preview_image",
      "cast(null as boolean) as is_eu_funded",
      "cast(null as boolean) as is_blended",
      "cast(null as string) as funding_rate",
      "cast(null as array<string>) as spatial",
      "'climate text with enough words for a body' as text",
      "concat('Title ', id) as title", "'summary' as summary",
      "cast(null as string) as description")
    // only two of the app's five sites have a crawl this run — the rest
    // skip, exactly like a reference DAG with nothing fetched
    val out = graft.operators.SiteNormalizers.portfolioFromVariables(
      v, "global_search",
      Map("noise" -> noiseDocs, "climate" -> climateDocs))
    assert(out.select("site_id").distinct().collect()
      .map(_.getString(0)).toSet == Set("noise", "climate"))
    assert(out.filter(col("cluster_name") === "noise").count() == 2)
    assert(out.filter(col("cluster_name") === "cca").count() == 2)
  }

  test("the loaded bise config drives normalizeBise to identical output") {
    val docs = spark.range(8).selectExpr(
      "cast(id as int) as rn",
      """concat('https://biodiversity.europa.eu', CASE
           WHEN id % 4 = 0 THEN '/protected-areas'
           WHEN id % 4 = 1 THEN concat('/threats/t', id)
           ELSE concat('/other/o', id) END) as id""",
      """CASE WHEN id % 3 = 0 THEN 'Page'
              WHEN id % 3 = 1 THEN 'bise_factsheet'
              ELSE 'Collection' END as type_raw""",
      "'published' as review_state",
      "concat('Title ', id) as title",
      "cast(null as array<string>) as spatial",
      "'biodiversity corpus text with enough words for a body' as text",
      "'summary' as summary")
    val n = v.siteConfig("config_bise").normalize.get
    // biseNormObj is the default_normalizers slice reachable on the
    // whitelist — derive it from the LOADED shared map the same way
    val loadedNormObj = v.normalizers("default_normalizers", v.graftAliases)
      .normObj.view.filterKeys(n.whitelist.contains).toMap
    assert(loadedNormObj == SiteNormalizers.biseNormObj)
    val fromConfig = SiteNormalizers.normalizeBise(docs,
      whitelist = n.whitelist,
      locationRules = n.locationRules,
      normObj = loadedNormObj)
    val handBuilt = SiteNormalizers.normalizeBise(docs)
    assert(fromConfig.columns.toSeq == handBuilt.columns.toSeq)
    assert(fromConfig.orderBy("rn").collect().toSeq ==
      handBuilt.orderBy("rn").collect().toSeq)
  }

  test("normMissing null defaults drop; mapping comments and custom sub-fields") {
    val doc = """{
      |  "norm_x": {"normMissing": {"issued": null, "lang": "en"}},
      |  "elastic_mapping_x": {
      |    "//": "a comment key, not a field",
      |    "big": {"type": "text",
      |            "fields": {"keyword": {"ignore_above": 512, "type": "keyword"}},
      |            "index": false}
      |  }
      |}""".stripMargin
    val v = AirflowVariables.parse(doc)
    val nm = v.normalizers("norm_x").normMissing.toMap
    assert(!nm.contains("issued"), "a JSON null default means no default")
    assert(nm("lang") == "en")
    val fields = v.elasticMapping("elastic_mapping_x")
    assert(fields.map(_.name) == Seq("big"), "comment keys never become fields")
    val ddl = graft.sources.EsIndexDdl.mappingPropertiesFromConfig(fields)
    assert(ddl.contains(""""ignore_above":512"""),
      "hand-authored sub-field settings survive verbatim")
    assert(ddl.contains(""""index":false"""),
      "unknown per-field settings pass through")
  }

  test("hasKeywordSub tests the TOP-LEVEL fields property, not the substring") {
    val doc = """{
      |  "elastic_mapping_k": {
      |    "a": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
      |    "b": {"type": "text", "fields": {"raw": {"type": "keyword"}}},
      |    "c": {"type": "text"}
      |  }
      |}""".stripMargin
    val fields = AirflowVariables.parse(doc).elasticMapping("elastic_mapping_k")
      .map(f => f.name -> f.hasKeywordSub).toMap
    assert(fields("a"), "a genuine keyword sub-field is detected")
    assert(!fields("b"),
      "a sub-field merely OF TYPE keyword (named raw) is not a .keyword sub-field")
    assert(!fields("c"), "no fields object at all")
  }
}
