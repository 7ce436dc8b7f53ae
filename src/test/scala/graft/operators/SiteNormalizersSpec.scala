package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** End-to-end specs for the per-site normalizer portfolio — each test drives
  * a full site config through `NormOps.commonNormalizer` plus the site's
  * pre/post projections, pinning the reference wrappers' observable
  * behavior (site_climate.py / site_wise_marine.py / site_sdi_fise.py).
  */
class SiteNormalizersSpec extends SparkSpec {
  import SiteNormalizers._

  private def byRn(df: org.apache.spark.sql.DataFrame): Map[Int, Row] =
    df.collect().map(r => r.getAs[Int]("rn") -> r).toMap

  // ------------------------------------------------------------ helpers

  test("yearsFromRanges defaults missing ends to 2010/currentYear and dedups") {
    val df = spark.range(1).selectExpr(
      """array(
           named_struct('start', named_struct('date', '2011-02-01'),
                        'end',   named_struct('date', '2013-06-01')),
           named_struct('start', named_struct('date', '2012-01-01'),
                        'end',   named_struct('date', cast(null as string)))
         ) as ranges""")
    val years = df.select(yearsFromRanges(col("ranges"), 2016).as("y"))
      .head.getSeq[Int](0)
    assert(years == Seq(2011, 2012, 2013, 2014, 2015, 2016))
  }

  test("mergedRanges merges gapped year runs and nulls open boundaries") {
    def merged(rangesExpr: String): String =
      spark.range(1).selectExpr(s"$rangesExpr as ranges")
        .select(to_json(mergedRanges(col("ranges"), 2016)).as("j"))
        .head.getString(0)

    // two disjoint runs → two closed ranges (get_merged_ranges, :85-122)
    assert(merged(
      """array(
           named_struct('start', named_struct('date','2011-01-01'),
                        'end',   named_struct('date','2012-01-01')),
           named_struct('start', named_struct('date','2014-01-01'),
                        'end',   named_struct('date','2015-01-01')))""") ==
      """[{"start":2011,"end":2012},{"start":2014,"end":2015}]""")

    // missing start → 2010 default AND first range start deleted (has_from)
    assert(merged(
      """array(
           named_struct('start', named_struct('date', cast(null as string)),
                        'end',   named_struct('date','2012-03-01')))""") ==
      """[{"end":2012}]""")

    // missing end → currentYear default AND last range end deleted (has_to)
    assert(merged(
      """array(
           named_struct('start', named_struct('date','2015-01-01'),
                        'end',   named_struct('date', cast(null as string))))""") ==
      """[{"start":2015}]""")
  }

  // ------------------------------------------------------------ climate

  private lazy val climateDocs = spark.range(5).selectExpr(
    "cast(id as int) as rn",
    """CASE id
         WHEN 0 THEN 'https://climate-adapt.eea.europa.eu/en/knowledge/page0'
         WHEN 1 THEN 'https://climate-adapt.eea.europa.eu/en/mission/stories/1'
         WHEN 2 THEN 'https://climate-adapt.eea.europa.eu/en/funding/2'
         WHEN 3 THEN 'https://climate-adapt.eea.europa.eu/en/news/3'
         ELSE 'https://climate-adapt.eea.europa.eu/en/other/4' END as id""",
    """CASE id WHEN 0 THEN 'Document' WHEN 1 THEN 'eea.climateadapt.casestudy'
         WHEN 2 THEN 'mission_funding_cca' WHEN 3 THEN 'Event'
         ELSE 'Collection' END as type_raw""",
    "'published' as review_state",
    "id = 1 as include_in_observatory",
    "false as include_in_mission",
    "'2019-05-01' as publication_date",
    "concat('uid-', id) as uid",
    "'2018-01-01T00:00:00' as created",
    "CASE WHEN id = 0 THEN '2020-02-02' END as cca_published",
    "CASE WHEN id = 3 THEN '2017-03-03' END as issued",
    "array('k1','k2','k1') as keywords",
    "array(named_struct('title','Agriculture'), named_struct('title','Energy')) as sectors",
    "array(named_struct('title','Flooding')) as climate_impacts",
    "array(named_struct('title','Observations')) as elements",
    "array(named_struct('title','climate-adapt')) as origin_website",
    "CASE WHEN id = 0 THEN array(named_struct('title','Italy')) END as country",
    "array(named_struct('title','Drought')) as climate_threats",
    "array(named_struct('title','Coastal')) as key_system",
    "array(named_struct('token','heat-stress','title','Heat stress')) as health_impacts",
    "array(named_struct('token','ktm1','title','KTM One')) as key_type_measures",
    "named_struct('title','LIFE') as funding_programme",
    "named_struct('countries', array('IT','FR'), 'transnational_region', array('Alpine')) as geographic",
    "named_struct('scales', named_struct('preview', named_struct('download', concat('http://img/', id, '.png')))) as preview_image",
    "CASE WHEN id = 2 THEN true END as is_eu_funded",
    "CASE WHEN id = 2 THEN false END as is_blended",
    "CASE WHEN id = 2 THEN '50%' END as funding_rate",
    "CASE WHEN id = 0 THEN array('Other') WHEN id = 1 THEN array('Spain') END as spatial",
    "'climate adaptation knowledge text with enough words for a fulltext body' as text",
    "concat('Title ', id) as title",
    "'summary text' as summary",
    "cast(null as string) as description")

  test("normalizeClimate: admission, mission flag, issued chain, vocab fan-out") {
    val out = byRn(normalizeClimate(climateDocs))
    assert(out.size == 4) // 'Collection' is not whitelisted

    val r0 = out(0); val r1 = out(1); val r2 = out(2); val r3 = out(3)

    // default_normalizers normObj slice on the @type copy
    assert(r0.getAs[String]("object_provides_scalar") == "Webpage")
    assert(r3.getAs[String]("object_provides_scalar") == "Event") // unmapped

    // issued ?? cca_published ?? publication_date (site_climate.py:102-107)
    assert(r0.getAs[String]("issued") == "2020-02-02")
    assert(r1.getAs[String]("issued") == "2019-05-01")
    assert(r3.getAs[String]("issued") == "2017-03-03")

    // spatial: leading 'Other' dropped, country titles appended (:139-144)
    assert(r0.getSeq[String](r0.fieldIndex("spatial")) == Seq("Italy"))
    assert(r1.getSeq[String](r1.fieldIndex("spatial")) == Seq("Spain"))

    // vocab fan-out: title vs token fields (:111-116)
    assert(r0.getSeq[String](r0.fieldIndex("cca_adaptation_sectors")) ==
      Seq("Agriculture", "Energy"))
    assert(r0.getSeq[String](r0.fieldIndex("cca_health_impacts")) == Seq("heat-stress"))
    assert(r0.getSeq[String](r0.fieldIndex("cca_key_type_measure")) == Seq("ktm1"))
    assert(r0.getAs[String]("cca_funding_programme") == "LIFE")
    assert(r0.getSeq[String](r0.fieldIndex("cca_geographic_countries")) == Seq("IT", "FR"))
    assert(r0.getAs[String]("cca_preview_image") == "http://img/0.png")

    // list dedup from the common pass (remove_duplicates)
    assert(r0.getSeq[String](r0.fieldIndex("cca_keywords")) == Seq("k1", "k2"))

    // search/observatory/mission flags (:171-177 + the :82 path override)
    assert(r0.getAs[String]("cca_include_in_search") == "false")
    assert(r1.getAs[String]("cca_include_in_search") == "true")
    assert(r0.getAs[String]("cca_include_in_mission") == "false")
    assert(r1.getAs[String]("cca_include_in_mission") == "true")
    assert(r1.getAs[String]("cca_include_in_search_observatory") == "true")

    // mission-funding block gated on portal type (:180-211)
    assert(r2.getAs[String]("cca_is_eu_funded") == "Yes")
    assert(r2.getAs[String]("cca_is_blended") == "No")
    assert(r2.getAs[String]("cca_funding_rate") == "50%")
    assert(r0.getAs[String]("cca_is_eu_funded") == null)

    // normMissing fills from the common config
    assert(r0.getAs[String]("language") == "en")
    assert(r0.getAs[String]("creation_date") == "2018-01-01T00:00:00")
    assert(r0.getAs[String]("creator") == "European Environment Agency (EEA)")

    // description fallback from fulltext; counts; cluster
    assert(r0.getAs[String]("description").nonEmpty)
    assert(r0.getAs[String]("cluster_name") == "cca")
    assert(r0.getAs[Long]("items_count_cca_keywords") == 2L)
    assert(r0.getAs[Long]("items_count_cluster_name") == 1L)
    assert(r0.getAs[String]("workflow_state") == "published")
  }

  // ------------------------------------------------------------ wise_marine

  private lazy val marineDocs = spark.range(8).selectExpr(
    "cast(id as int) as rn",
    """concat('https://water.europa.eu', CASE id
         WHEN 0 THEN '/marine/policy-and-reporting/reports/r1'
         WHEN 1 THEN '/marine/state-of-europe-seas/marine-sectors-catalogue-of-measures'
         WHEN 2 THEN '/marine/countries-and-regional-seas/country-profiles/italy'
         WHEN 3 THEN '/marine/unmatched/page'
         WHEN 4 THEN '/marine/measures/m1'
         WHEN 5 THEN '/marine/datasets/d1'
         WHEN 6 THEN '/marine/indicators/i1'
         ELSE '/marine/x' END) as id""",
    """CASE id WHEN 0 THEN 'Document' WHEN 1 THEN 'Page'
         WHEN 2 THEN 'country_factsheet' WHEN 3 THEN 'Document'
         WHEN 4 THEN 'measure' WHEN 5 THEN 'Document'
         WHEN 6 THEN 'Page' ELSE 'Folder' END as type_raw""",
    "'published' as review_state",
    "CASE WHEN id = 2 THEN 'Italy' ELSE concat('Title ', id) END as title",
    "array('Baltic') as spatial",
    "cast(null as string) as issued",
    "'marine assessment text with enough words for a fulltext body' as text",
    "'summary text' as summary",
    "array('marine', 'water') as theme",
    "array(named_struct('title','Pressure')) as dpsir_type",
    "array(named_struct('title','MSFD')) as legislative_reference",
    "'Fishing' as sector",
    "'C1' as code")

  // spec-only config extension: two extra location rules exercising the
  // Data-set collapse and Indicator branches (config-driven in the
  // reference — variables.json location_rules)
  private lazy val marineOut = byRn(normalizeWiseMarine(
    marineDocs,
    whitelist = wiseMarineWhitelist :+ "measure",
    locationRules = wiseMarineLocationRules ++ Seq(
      "/marine/datasets/*" -> Seq("Data set", "Webpage"),
      "/marine/indicators/*" -> Seq("Indicator"))))

  test("normalizeWiseMarine: admission, location rules, factsheet spatial") {
    val out = marineOut
    assert(out.size == 7) // 'Folder' is not whitelisted

    def op(rn: Int): Seq[String] =
      out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))

    assert(op(0) == Seq("Webpage"))           // policy-and-reporting/* rule
    assert(op(1) == Seq("Dashboard"))         // overlapping rules: LAST match wins
    assert(op(2) == Seq("Country fact sheet", "Dashboard")) // country-profiles/*
    assert(op(3) == Seq("Webpage"))           // location_rules_fallback

    // a country factsheet's spatial is its own title (:96)
    assert(out(2).getSeq[String](out(2).fieldIndex("spatial")) == Seq("Italy"))
    assert(out(0).getSeq[String](out(0).fieldIndex("spatial")) == Seq("Baltic"))

    assert(out(0).getAs[String]("cluster_name") == "wise-marine")
    assert(out(0).getAs[Long]("items_count_object_provides") == 1L)
    assert(out(2).getAs[Long]("items_count_object_provides") == 2L)
  }

  test("normalizeWiseMarine: Data-set prunes Webpage; SPM block fans out") {
    val out = marineOut

    // "Data set" in a multi-type resolution removes "Webpage" (:121-125)
    assert(out(5).getSeq[String](out(5).fieldIndex("object_provides")) ==
      Seq("Data set"))

    // Shipping-and-Ports-Measure block (:126-132)
    val spm = out(4)
    assert(spm.getSeq[String](spm.fieldIndex("object_provides")) ==
      Seq("Shipping and Ports Measure"))
    assert(spm.getSeq[String](spm.fieldIndex("exclude_from_globalsearch")) ==
      Seq("True"))
    assert(spm.getAs[String]("issued") == "2023-09-04T07:17:00") // backfill
    assert(spm.getAs[String]("wm_spm_sector") == "Fishing")
    assert(spm.getAs[String]("wm_spm_code") == "C1")
    assert(spm.getAs[String]("wm_spm_title") == "Title 4")
    assert(out(0).getAs[String]("wm_spm_sector") == null)
    assert(out(0).getSeq[String](out(0).fieldIndex("exclude_from_globalsearch")) == null)
    assert(out(0).getAs[String]("issued") == null) // backfill is SPM-only
  }

  test("normalizeWiseMarine: vocab flattening and the Indicator override") {
    val out = marineOut

    assert(out(0).getSeq[String](out(0).fieldIndex("legislative_reference")) ==
      Seq("MSFD"))
    assert(out(0).getSeq[String](out(0).fieldIndex("wm_theme")) ==
      Seq("marine", "water"))
    assert(out(0).getSeq[String](out(0).fieldIndex("wm_dpsir_type")) ==
      Seq("Pressure"))

    // Indicator: description = title, dpsir = dpsir_type titles (:143-146)
    assert(out(6).getAs[String]("description") == "Title 6")
    assert(out(6).getSeq[String](out(6).fieldIndex("dpsir")) == Seq("Pressure"))
    assert(out(0).getSeq[String](out(0).fieldIndex("dpsir")) == null)
    assert(out(0).getAs[String]("description") != "Title 0") // fallback from fulltext
  }

  // ------------------------------------------------------------ sdi_fise

  private val sdiObligations = Map("http://rod/1" -> "Reporting obligation 1")

  private lazy val sdiDocs = spark.range(3).selectExpr(
    "cast(id as int) as rn",
    "concat('md-', id) as metadataIdentifier",
    "cast(null as string) as issued",
    "CASE WHEN id = 0 THEN array('2019-04-04') END as publicationDateForResource",
    "CASE WHEN id = 0 THEN array('2018-03-03') END as creationDateForResource",
    "CASE WHEN id = 1 THEN '2010-09-09' END as createDate",
    "array(named_struct('url', concat('http://o/', id))) as overview",
    "array(named_struct('default','Obligation 1','link','http://rod/1')) as `th_rod-eionet-europa-eu`",
    "array(named_struct('default','Climate mitigation'), named_struct('default','Water')) as `th_eea-topics`",
    "array('concepts^environment^water pollution') as `th_gemet_tree.default`",
    "array(named_struct('default','vector')) as cl_spatialRepresentationType",
    "array(named_struct('default','Kosovo (UNSCR 1244/99)'), named_struct('default','Italy')) as th_regions",
    """CASE WHEN id = 0 THEN array(
         named_struct('start', named_struct('date','2011-02-01'),
                      'end',   named_struct('date','2013-06-01')),
         named_struct('start', named_struct('date','2015-01-01'),
                      'end',   named_struct('date', cast(null as string))))
       END as resourceTemporalExtentDetails""",
    "array(named_struct('format', array('SHP','CSV')), named_struct('format', array('CSV'))) as children",
    """CASE WHEN id = 0 THEN array(named_struct('code','DAT-123'), named_struct('code','XYZ-9'))
            ELSE array(named_struct('code','XYZ-9')) END as resourceIdentifier""",
    "concat('Forest Map ', id) as `resourceTitleObject.default`",
    "concat('Abstract ', id) as `resourceAbstractObject.default`",
    """CASE WHEN id = 0 THEN array(named_struct('key','asNeeded'))
            WHEN id = 1 THEN array(named_struct('key','weirdKey'))
       END as cl_maintenanceAndUpdateFrequency""",
    "CASE WHEN id = 0 THEN 'ita' ELSE 'xyz' END as mainLanguage",
    """CASE WHEN id = 0 THEN array(named_struct('key','obsolete'))
            ELSE array(named_struct('key','completed')) END as cl_status""",
    "CASE WHEN id = 0 THEN '2019' END as publicationYearForResource",
    "CASE WHEN id = 0 THEN '2018' END as creationYearForResource",
    "CASE WHEN id = 1 THEN array('2012','2014') END as revisionYearForResource",
    """CASE WHEN id = 0 THEN array(named_struct(
         'organisationObject', named_struct('default','EEA'), 'email','info@eea'))
       END as contact""",
    """CASE id WHEN 0 THEN array('dataset') WHEN 1 THEN array('service')
         ELSE array('other') END as resourceType""",
    "CASE WHEN id = 0 THEN '2021-05-05' END as changeDate",
    "CASE WHEN id = 0 THEN '2021-01-01' WHEN id = 1 THEN '2020-02-02' END as dateStamp",
    "array(named_struct('default','environment')) as cl_topic",
    "array(named_struct('default','EEA Org')) as OrgForResourceObject")

  test("preNormalizeSdi: field mapping, topic renames, ranges, prod_id") {
    val pre = byRn(preNormalizeSdi(sdiDocs, sdiObligations, currentYear = 2016))
    val r0 = pre(0)

    assert(r0.getAs[String]("site_id") == "sdi")
    assert(r0.getAs[String]("type_raw") == "Data set")
    assert(r0.getAs[String]("about") == "md-0")
    // eea-topics literal renames (:227-241)
    assert(r0.getSeq[String](r0.fieldIndex("sdi_topics")) == Seq("climate", "Water"))
    // gemet tree leaf, Title Cased (:242)
    assert(r0.getSeq[String](r0.fieldIndex("sdi_gemet")) == Seq("Water Pollution"))
    // temporal extent: years + merged ranges with pinned currentYear
    assert(r0.getSeq[Int](r0.fieldIndex("time_coverage")) ==
      Seq(2011, 2012, 2013, 2015, 2016))
    // children format flatten (:267); common dedup happens later
    assert(r0.getSeq[String](r0.fieldIndex("dataset_formats")) ==
      Seq("SHP", "CSV", "CSV"))
    // DAT-prefixed resource codes (:284-293)
    assert(r0.getSeq[String](r0.fieldIndex("prod_id")) == Seq("DAT-123"))
    assert(pre(1).getSeq[String](pre(1).fieldIndex("prod_id")) == Seq())
    // rod links → obligation labels (:272-281)
    assert(r0.getSeq[String](r0.fieldIndex("instrument")) ==
      Seq("Reporting obligation 1"))
    assert(r0.getSeq[String](r0.fieldIndex("overview.url")) == Seq("http://o/0"))
    assert(r0.getAs[String]("title") == "Forest Map 0")
  }

  test("normalizeSdiFise: sdi_normalizers renames + FISE post fan-out") {
    val out = byRn(normalizeSdiFise(
      sdiDocs, sdiObligations, currentYear = 2016,
      archivedExpires = "2026-08-10"))
    val r0 = out(0); val r1 = out(1); val r2 = out(2)

    // about → id; about rebuilt as the catalogue record URL (:468)
    assert(r0.getAs[String]("id") == "md-0")
    assert(r0.getAs[String]("about") ==
      "https://sdi.eea.europa.eu/catalogue/fise/api/records/md-0")
    // resourceTitleObject.default → title + label; abstract → description
    assert(r0.getAs[String]("title") == "Forest Map 0")
    assert(r0.getAs[String]("label") == "Forest Map 0")
    assert(r0.getAs[String]("description") == "Abstract 0")
    // pinned isPublishedToAll → hasWorkflowState, normObj "true"→"published"
    assert(r0.getAs[String]("hasWorkflowState") == "published")
    // OrgForResourceObject fallback → OrgForResource → organisation
    assert(r0.getSeq[String](r0.fieldIndex("organisation")) == Seq("EEA Org"))
    // normObj maps the Kosovo label inside the spatial list
    assert(r0.getSeq[String](r0.fieldIndex("spatial")) == Seq("Kosovo", "Italy"))
    assert(r0.getSeq[String](r0.fieldIndex("places")) == Seq("Kosovo", "Italy"))

    // issued fallback chain (:205-212)
    assert(r0.getAs[String]("issued") == "2019-04-04")
    assert(r1.getAs[String]("issued") == "2010-09-09")

    // publicationYear int chain with the 2500 default (:381-403)
    assert(r0.getAs[Int]("publicationYear") == 2019)
    assert(r1.getAs[Int]("publicationYear") == 2014) // last revision year
    assert(r2.getAs[Int]("publicationYear") == 2500)

    // maintenance frequency: mapped key / raw passthrough / Unknown (:409-448)
    assert(r0.getAs[String]("update_frequency_value") == "As needed")
    assert(r1.getAs[String]("update_frequency_value") == "weirdKey")
    assert(r2.getAs[String]("update_frequency_value") == "Unknown")

    // language / country name maps (:459-467)
    assert(r0.getSeq[String](r0.fieldIndex("language")) == Seq("Italian"))
    assert(r0.getSeq[String](r0.fieldIndex("country")) == Seq("Italy"))
    assert(r1.getSeq[String](r1.fieldIndex("language")) == Seq("Unknown"))

    // resourceType → SDI object_provides (:473-480)
    assert(r0.getSeq[String](r0.fieldIndex("object_provides")) == Seq("Spatial dataset"))
    assert(r1.getSeq[String](r1.fieldIndex("object_provides")) == Seq("Data services"))
    assert(r2.getSeq[String](r2.fieldIndex("object_provides")) == Seq("SDI"))

    // obsolete status → pinned expires stamp (:304-335)
    assert(r0.getAs[String]("expires") == "2026-08-10")
    assert(r1.getAs[String]("expires") == null)

    // last_modified / created / date_publication (:486-492)
    assert(r0.getAs[String]("last_modified") == "2021-05-05")
    assert(r1.getAs[String]("last_modified") == "2020-02-02")
    assert(r0.getAs[String]("created") == "2018-03-03")
    assert(r0.getAs[String]("date_publication") == "2019-04-04")

    // time_coverage cast to strings (:482); dataset_formats deduped by common
    assert(r0.getSeq[String](r0.fieldIndex("time_coverage")) ==
      Seq("2011", "2012", "2013", "2015", "2016"))
    assert(r0.getSeq[String](r0.fieldIndex("dataset_formats")) == Seq("SHP", "CSV"))

    // contact → organisation name/email (:452-457)
    assert(r0.getAs[String]("organisation_name") == "EEA")
    assert(r0.getAs[String]("organisation_email") == "info@eea")

    // topic overwritten from cl_topic at the end (:497-500)
    assert(r0.getSeq[String](r0.fieldIndex("topic")) == Seq("environment"))

    assert(r0.getAs[String]("cluster_name") == "fise_sdi")
    assert(r0.getAs[Long]("items_count_spatial") == 2L)
  }

  // ------------------------------------------------------ wise_freshwater

  test("bepStrip removes code prefixes only from full-matching values") {
    val df = spark.range(1).selectExpr(
      "array('BP12 - Water retention', 'BP3- no space', 'plain') as v")
    val got = df.select(bepStrip(col("v"), "BP").as("v"))
      .head.getSeq[String](0)
    assert(got == Seq("Water retention", "BP3- no space", "plain"))
  }

  private lazy val freshwaterDocs = spark.range(5).selectExpr(
    "cast(id as int) as rn",
    """concat('https://water.europa.eu', CASE id
         WHEN 0 THEN '/freshwater/europe-freshwater/overview'
         WHEN 1 THEN '/freshwater/countries/italy'
         WHEN 2 THEN '/freshwater/measures/m1'
         WHEN 3 THEN '/freshwater/other'
         ELSE '/freshwater/x' END) as id""",
    """CASE id WHEN 0 THEN 'Page' WHEN 1 THEN 'country_profile'
         WHEN 2 THEN 'measure' WHEN 3 THEN 'dataset'
         ELSE 'Collection' END as type_raw""",
    "'published' as review_state",
    "CASE WHEN id = 1 THEN 'Italy' ELSE concat('Title ', id) END as title",
    "array('Baltic') as spatial",
    "'freshwater assessment text with enough words for a body' as text",
    "'summary text' as summary",
    "named_struct('value', array(named_struct('name','BP12 - Water retention'), named_struct('name','Other impact'))) as biophysical_impacts",
    "named_struct('value', array(named_struct('name','ES3 - Flood control'))) as ecosystem_services",
    "named_struct('value', array(named_struct('name','PO1 - Good status'))) as policy_objectives",
    "array(named_struct('title','WFD')) as legislative_reference",
    "array('cat1') as category",
    "'agriculture' as measure_sector",
    "array('Italy','Spain') as country",
    "named_struct('data', '<p>Measure <b>summary</b> body</p>') as measure_summary")

  test("normalizeWiseFreshwater: rules, bep strip, exclusions, country move") {
    val out = byRn(normalizeWiseFreshwater(freshwaterDocs))
    assert(out.size == 4) // Collection dropped

    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    assert(op(0) == Seq("Topic page"))  // europe-freshwater/* rule
    assert(op(1) == Seq("Country fact sheet")) // not Webpage: no re-resolve
    assert(op(2) == Seq("Measure"))
    assert(op(3) == Seq("Webpage")) // lone Data set collapses (:61-63)

    // country_profile spatial = title (:39)
    assert(out(1).getSeq[String](out(1).fieldIndex("spatial")) == Seq("Italy"))

    // Measure/Source/Case study/chemical exclusion (:66-71)
    assert(out(2).getSeq[String](out(2).fieldIndex("exclude_from_globalsearch")) ==
      Seq("True"))
    assert(out(0).getSeq[String](out(0).fieldIndex("exclude_from_globalsearch")) == null)

    // bep prefix strip (:77-105)
    assert(out(0).getSeq[String](out(0).fieldIndex("biophysical_impacts")) ==
      Seq("Water retention", "Other impact"))
    assert(out(0).getSeq[String](out(0).fieldIndex("ecosystem_services")) ==
      Seq("Flood control"))
    assert(out(0).getSeq[String](out(0).fieldIndex("policy_objectives")) ==
      Seq("Good status"))

    assert(out(0).getSeq[String](out(0).fieldIndex("legislative_reference")) ==
      Seq("WFD"))

    // country → wise_country, source column removed (:120-122)
    assert(out(0).getSeq[String](out(0).fieldIndex("wise_country")) ==
      Seq("Italy", "Spain"))
    assert(!out(0).schema.fieldNames.contains("country"))

    // Measure description from measure_summary html (:126-130)
    assert(out(2).getAs[String]("description") == "Measure summary body")
    assert(out(0).getAs[String]("description") != "Measure summary body")
    assert(out(0).getAs[String]("cluster_name") == "wise-freshwater")
  }

  // ----------------------------------------------------------------- bise

  test("normalizeBise: Webpage rules and the factsheet+Dashboard pairing") {
    val docs = spark.range(4).selectExpr(
      "cast(id as int) as rn",
      """concat('https://biodiversity.europa.eu', CASE id
           WHEN 0 THEN '/protected-areas'
           WHEN 1 THEN '/threats/invasive-species'
           WHEN 2 THEN '/countries/italy'
           ELSE '/other' END) as id""",
      """CASE id WHEN 0 THEN 'Page' WHEN 1 THEN 'Document'
           WHEN 2 THEN 'bise_factsheet' ELSE 'Document' END as type_raw""",
      "'published' as review_state",
      "CASE WHEN id = 2 THEN 'Italy' ELSE concat('Title ', id) END as title",
      "cast(null as array<string>) as spatial",
      "'biodiversity text with enough words for a body' as text",
      "'summary' as summary")
    val out = byRn(normalizeBise(docs))
    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    // the exact /protected-areas rule matches, but so does the LATER
    // /protected-areas/* glob (is_doc_on_path strips slashes, so the glob
    // covers its own root) — last match wins, like find_ct_by_rules
    assert(op(0) == Seq("Topic page", "Webpage"))
    assert(op(1) == Seq("Topic page", "Webpage")) // threats/* rule
    assert(op(2) == Seq("Country fact sheet", "Dashboard")) // :57-58
    assert(op(3) == Seq("Webpage"))               // fallback
    assert(out(2).getSeq[String](out(2).fieldIndex("spatial")) == Seq("Italy"))
    assert(out(0).getAs[String]("cluster_name") == "bise")
  }

  // ---------------------------------------------------------------- noise

  test("normalizeNoise: forced type, constants, title from page html") {
    val docs = spark.range(2).selectExpr(
      "cast(id as int) as rn",
      "concat('https://noise.eea.europa.eu/page/', id) as id",
      "'noise map text with enough words for a body' as text",
      "'summary' as summary",
      "concat('<html><head><title> Noise map ', id, ' </title></head><body>x</body></html>') as web_html")
    val out = byRn(normalizeNoise(docs))
    assert(out.size == 2)
    val r0 = out(0)
    assert(r0.getSeq[String](r0.fieldIndex("object_provides")) ==
      Seq("Webpage", "Map (interactive)"))
    assert(r0.getSeq[String](r0.fieldIndex("topic")) == Seq("Noise"))
    assert(r0.getAs[String]("issued") == "2021-07-01T13:47:12.000Z")
    assert(r0.getAs[String]("title") == "Noise map 0")
    assert(r0.getAs[String]("workflow_state") == "published")
    assert(r0.getAs[Long]("items_count_object_provides") == 2L)
  }

  // ------------------------------------------------------------------ eea

  private lazy val eeaDocs = spark.range(7).selectExpr(
    "cast(id as int) as rn",
    "concat('https://www.eea.europa.eu/d/', id) as id",
    """CASE id WHEN 0 THEN 'Document' WHEN 1 THEN 'Fiche' WHEN 2 THEN 'Fiche'
         WHEN 3 THEN 'Term' WHEN 4 THEN 'helpcenter_faq'
         WHEN 5 THEN cast(null as string) ELSE 'Plone Site' END as type_raw""",
    "'published' as review_state",
    "concat('Title ', id) as title",
    "'eea report text with enough words for a body' as text",
    "'summary' as summary",
    """CASE WHEN id = 1 THEN 'shared summary of the parent report body'
            WHEN id = 2 THEN 'completely different fiche text'
            ELSE concat('desc ', id) END as description""",
    "CASE WHEN id IN (1, 2) THEN 'Report' END as parent_type",
    """CASE WHEN id IN (1, 2) THEN 'shared summary of the parent report body'
       END as parent_description""",
    "'EEA glossary' as source",
    "id = 0 as has_duplicate")

  test("normalizeEea: Fiche dup drop, FAQ drop, Term fields, Briefing append") {
    val out = byRn(normalizeEea(eeaDocs))
    // dropped: rn=1 (Fiche similar to parent), rn=4 (en FAQ),
    // rn=5 (null type), rn=6 (Plone Site)
    assert(out.keySet == Set(0, 2, 3))

    // the dissimilar Fiche survives and maps to Briefing
    assert(out(2).getSeq[String](out(2).fieldIndex("object_provides")) ==
      Seq("Briefing"))

    // glossary term carries raw description/source (:37-39)
    assert(out(3).getSeq[String](out(3).fieldIndex("object_provides")) ==
      Seq("Glossary term"))
    assert(out(3).getAs[String]("term_description") == "desc 3")
    assert(out(3).getAs[String]("term_source") == "EEA glossary")
    assert(out(0).getAs[String]("term_description") == null)

    // duplicate_info → Briefing appended + count bumped (:45-48)
    assert(out(0).getSeq[String](out(0).fieldIndex("object_provides")) ==
      Seq("Webpage", "Briefing"))
    assert(out(0).getAs[Long]("items_count_object_provides") == 2L)
    assert(out(3).getAs[Long]("items_count_object_provides") == 1L)
    assert(out(0).getAs[String]("cluster_name") == "eea")
    assert(out(0).getAs[String]("language") == "en") // normMissing fill
  }

  // --------------------------------------------------------------- eea_en

  test("normalizeEeaEn: sandbox drop, workflow backfill, attr-mapping append") {
    val docs = spark.range(7).selectExpr(
      "cast(id as int) as rn",
      """concat('https://www.eea.europa.eu/en', CASE id
           WHEN 4 THEN '/sandbox/page4' ELSE concat('/analysis/d', id) END) as id""",
      """CASE id WHEN 0 THEN 'Document' WHEN 1 THEN 'File'
           WHEN 2 THEN 'visualization' WHEN 3 THEN 'Page'
           WHEN 4 THEN 'Document' WHEN 5 THEN cast(null as string)
           ELSE 'Plone Site' END as type_raw""",
      "CASE WHEN id = 1 THEN cast(null as string) ELSE 'published' END as review_state",
      """CASE WHEN id = 2 THEN 'Indicator: Air quality'
              ELSE concat('Title ', id) END as title""",
      "'analysis text with enough words for a body' as text",
      "'summary' as summary",
      "cast(null as string) as description",
      "'2020-01-01' as creation_date",
      "array(named_struct('title','Air pollution')) as topics",
      "array(named_struct('title','Pressure')) as taxonomy_dpsir",
      "array(named_struct('title','Indicator typology')) as taxonomy_typology",
      "array(named_struct('title','SDG 13')) as taxonomy_un_sdgs",
      """CASE WHEN id = 3 THEN array('Environment', 'Country Fact Sheet')
              ELSE array('Environment') END as subjects""")
    val out = byRn(normalizeEeaEn(docs))
    // dropped: rn=4 (sandbox path), rn=5 (null type), rn=6 (Plone Site)
    assert(out.keySet == Set(0, 1, 2, 3))

    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    assert(op(0) == Seq("Webpage"))
    // File with missing workflow state publishes + issued backfills (:56-63)
    assert(out(1).getAs[String]("workflow_state") == "published")
    assert(out(1).getAs[String]("issued") == "2020-01-01")
    assert(out(0).getAs[String]("workflow_state") == "published")
    // visualization titled Indicator gains the type (:64-65)
    assert(op(2) == Seq("Chart (interactive)", "Indicator"))
    // attr-mapping: case-insensitive subjects hit appends (:68, lib :662)
    assert(op(3) == Seq("Webpage", "Country fact sheet"))
    assert(out(3).getAs[Long]("items_count_object_provides") == 2L)
    // taxonomy fan-out
    assert(out(0).getSeq[String](out(0).fieldIndex("topic")) == Seq("Air pollution"))
    assert(out(0).getSeq[String](out(0).fieldIndex("dpsir")) == Seq("Pressure"))
    assert(out(0).getSeq[String](out(0).fieldIndex("un_sdgs")) == Seq("SDG 13"))
    assert(out(0).getAs[String]("cluster_name") == "eea")
  }

  // -------------------------------------- simple sites + energy + forest

  test("normalizeSimpleSite covers industry and cab; empty whitelist admits all") {
    val docs = spark.range(3).selectExpr(
      "cast(id as int) as rn",
      "concat('https://industry.eea.europa.eu/d/', id) as id",
      "CASE id WHEN 0 THEN 'Page' WHEN 1 THEN 'Document' ELSE 'Collection' END as type_raw",
      "'published' as review_state",
      "concat('Title ', id) as title",
      "'industry text with enough words for a body' as text",
      "'summary' as summary")
    val ind = byRn(normalizeIndustry(docs))
    assert(ind.keySet == Set(0, 1)) // Collection not whitelisted
    assert(ind(0).getSeq[String](ind(0).fieldIndex("object_provides")) == Seq("Webpage"))
    assert(ind(0).getSeq[String](ind(0).fieldIndex("themes")) == Seq("industry"))
    assert(ind(0).getAs[String]("cluster_name") == "industry")

    val cab = byRn(normalizeCab(docs))
    assert(cab.keySet == Set(0, 1, 2)) // cab's empty whitelist admits all
    assert(cab(2).getSeq[String](cab(2).fieldIndex("object_provides")) == Seq("Collection"))
    assert(cab(0).getAs[String]("cluster_name") == "cab")
  }

  test("normalizeIas: european-statistics products split Map vs Dashboard") {
    val docs = spark.range(3).selectExpr(
      "cast(id as int) as rn",
      """concat('https://ias.eea.europa.eu', CASE id
           WHEN 0 THEN '/products/european-statistics/p0'
           WHEN 1 THEN '/products/european-statistics/p1'
           ELSE '/about' END) as id""",
      "'Page' as type_raw",
      "'published' as review_state",
      "CASE WHEN id = 1 THEN 'Map of invasive species' ELSE concat('Title ', id) END as title",
      "'invasive species text with enough words' as text",
      "'summary' as summary")
    val out = byRn(normalizeIas(docs))
    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    assert(op(0) == Seq("Dashboard"))
    assert(op(1) == Seq("Map (interactive)")) // Map-titled product
    assert(op(2) == Seq("Webpage"))
    assert(out(0).getAs[String]("cluster_name") == "ias")
  }

  test("normalizeEnergy: unconditional rules, Data override, intro topic page") {
    val docs = spark.range(4).selectExpr(
      "cast(id as int) as rn",
      """concat('https://energy.eea.europa.eu', CASE id
           WHEN 0 THEN '/countries/italy'
           WHEN 1 THEN '/topics/renewables/intro'
           WHEN 2 THEN '/analysis/a2'
           ELSE '/analysis/a3' END) as id""",
      "CASE WHEN id = 1 THEN 'visualization' ELSE 'Page' END as type_raw",
      "'published' as review_state",
      "CASE WHEN id = 0 THEN 'Italy' ELSE concat('Title ', id) END as title",
      "'energy statistics text with enough words' as text",
      "'summary' as summary",
      "CASE WHEN id = 3 THEN named_struct('token', 'Data') ELSE named_struct('token', 'Doc') END as resource_type")
    val out = byRn(normalizeEnergy(docs))
    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    assert(op(0) == Seq("Country fact sheet")) // /countries/* rule
    assert(out(0).getAs[String]("spatial") == "Italy") // factsheet spatial (:49-50)
    assert(op(1) == Seq("Topic page"))  // topics/…/intro override (:55-60)
    assert(op(2) == Seq("Webpage"))     // fallback
    assert(op(3) == Seq("Dashboard"))   // resource_type Data override (:52-53)
    assert(out(2).getAs[String]("spatial") == null)
    assert(out(0).getAs[String]("cluster_name") == "energy")
  }

  test("normalizeForest: catalogue drop, parent spatial, topics/EU splits") {
    val docs = spark.range(6).selectExpr(
      "cast(id as int) as rn",
      """concat('https://forest.eea.europa.eu', CASE id
           WHEN 0 THEN '/topics/ecosystems/state'
           WHEN 1 THEN '/countries/italy/f1'
           WHEN 2 THEN '/countries/regions/european-union/f2'
           WHEN 3 THEN '/policy/eu-strategy'
           WHEN 4 THEN '/other/page'
           ELSE '/cat' END) as id""",
      """CASE WHEN id IN (1, 2) THEN 'basic_data_factsheet'
              ELSE 'Page' END as type_raw""",
      "'published' as review_state",
      "CASE WHEN id = 5 THEN 'https://forest.eea.europa.eu/resources/data-catalogue/x' ELSE concat('https://forest.eea.europa.eu/a', id) END as about",
      "CASE WHEN id = 1 THEN named_struct('title', 'Italy') ELSE named_struct('title', 'Regions') END as parent",
      "concat('Title ', id) as title",
      "cast(null as array<string>) as spatial",
      "'forest condition text with enough words' as text",
      "'summary' as summary")
    val out = byRn(normalizeForest(docs))
    assert(out.keySet == Set(0, 1, 2, 3, 4)) // data-catalogue about dropped

    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    // the /topics/* rule resolves first — the EU27 fallback branch is only
    // reachable when no rule matched (the reference's code path is the same)
    assert(op(0) == Seq("Topic page"))
    assert(out(0).getAs[String]("places") == "unknown")
    assert(out(4).getAs[String]("places") == "unknown")

    // drop the topics rule: the lone-Webpage fallback now upgrades the
    // topics path AND backfills places to EU27 (:58-70)
    val fb = byRn(normalizeForest(docs, locationRules =
      Seq("/policy/*" -> Seq("Webpage"),
        "/countries/regions/european-union" -> Seq("Dashboard"))))
    assert(fb(0).getSeq[String](fb(0).fieldIndex("object_provides")) ==
      Seq("Topic page"))
    assert(fb(0).getAs[String]("places") == "EU27")
    // factsheet off the EU path pairs with Dashboard; parent title spatial
    assert(op(1) == Seq("Country fact sheet", "Dashboard"))
    assert(out(1).getSeq[String](out(1).fieldIndex("spatial")) == Seq("Italy"))
    // 'Regions' parent leaves spatial alone (:45-48)
    assert(out(2).getSeq[String](out(2).fieldIndex("spatial")) == null)
    // factsheet ON the EU region path is a lone Dashboard (:72-75)
    assert(op(2) == Seq("Dashboard"))
    assert(op(3) == Seq("Webpage")) // /policy/* explicit Webpage rule
    assert(op(4) == Seq("Webpage")) // fallback
    assert(out(0).getAs[String]("cluster_name") == "fise")
  }

  test("normalizeEionet: publication_date issued and per-ETC topic terms") {
    val docs = spark.range(3).selectExpr(
      "cast(id as int) as rn",
      """concat('https://www.eionet.europa.eu', CASE id
           WHEN 0 THEN '/etcs/etc-bd/report1'
           WHEN 1 THEN '/etcs/etc-cme/report2'
           ELSE '/about' END) as id""",
      "CASE WHEN id = 2 THEN 'Page' ELSE 'etc_report' END as type_raw",
      "'published' as review_state",
      "concat('Title ', id) as title",
      "'european topic centre text with enough words' as text",
      "'summary' as summary",
      "CASE WHEN id = 0 THEN '2022-05-05' END as publication_date")
    val out = byRn(normalizeEionet(docs))
    assert(out(0).getAs[String]("issued") == "2022-05-05")
    assert(out(0).getSeq[String](out(0).fieldIndex("object_provides")) == Seq("Report"))
    assert(out(0).getSeq[String](out(0).fieldIndex("topic")) == Seq("term4"))
    assert(out(1).getSeq[String](out(1).fieldIndex("topic")) == Seq("term11", "term14"))
    assert(out(2).getSeq[String](out(2).fieldIndex("topic")) == null)
    assert(out(0).getAs[String]("cluster_name") == "etc")
  }

  test("normalizeDiscomap: URL families set topic and home-vs-map types") {
    val docs = spark.range(4).selectExpr(
      "cast(id as int) as rn",
      """CASE id
           WHEN 0 THEN 'https://discomap.eea.europa.eu/climatechange'
           WHEN 1 THEN 'https://discomap.eea.europa.eu/climatechange/?page=Adaptation'
           WHEN 2 THEN 'https://discomap.eea.europa.eu/atlas/?page=Home'
           ELSE 'https://discomap.eea.europa.eu/atlas/?page=Mortality'
         END as id""",
      "'map portal text with enough words' as text",
      "'summary' as summary",
      "concat('<html><head><title>Discomap ', id, '</title></head><body>x</body></html>') as web_html",
      "'2023-03-03' as modified")
    val out = byRn(normalizeDiscomap(docs))
    def op(rn: Int) = out(rn).getSeq[String](out(rn).fieldIndex("object_provides"))
    assert(op(0) == Seq("Webpage"))            // climatechange home
    assert(op(1) == Seq("Map (interactive)"))  // climatechange map page
    assert(op(2) == Seq("Webpage"))            // atlas home
    assert(op(3) == Seq("Map (interactive)"))  // atlas map page
    assert(out(0).getSeq[String](out(0).fieldIndex("topic")) ==
      Seq("Climate change adaptation", "Climate change mitigation"))
    assert(out(3).getSeq[String](out(3).fieldIndex("topic")) ==
      Seq("Environmental health impacts"))
    assert(out(0).getAs[String]("title") == "Discomap 0")
    assert(out(0).getAs[String]("issued") == "2023-03-03")
    assert(out(0).getAs[String]("cluster_name") == "discomap")
  }

  // ------------------------------------------------------------------ sdi

  /** sdiDocs plus the sdi-only inputs: children changeDates (last_modified,
    * site_sdi.py:332-343), a hot-fix record id (:213-215), and a row where
    * ONLY creationDateForResource is set (the issued-chain delta, :204-209).
    */
  private lazy val sdiDocsFull = sdiDocs
    .withColumn("children", transform(col("children"), (c, i) =>
      c.withField("changeDate",
        when(col("rn") === 0, when(i === 0, lit("2020-01-01")).otherwise(lit("2022-03-03")))
          .when(col("rn") === 1 && i === 0, lit("2019-09-09")))))
    .withColumn("metadataIdentifier",
      when(col("rn") === 1, lit("fa8b1229-3db6-495d-b18e-9c9b3267c02b"))
        .otherwise(col("metadataIdentifier")))
    .withColumn("creationDateForResource",
      when(col("rn") === 2, array(lit("2017-07-07")))
        .otherwise(col("creationDateForResource")))
    .withColumn("createDate",
      when(col("rn") === 1, col("createDate")))

  test("normalizeSdi: issued chain, hot-fix, taxonomy, expired, last_modified") {
    val out = byRn(normalizeSdi(
      sdiDocsFull, sdiObligations, currentYear = 2016,
      archivedExpires = "2026-08-10",
      themeTaxonomy = Map("Water" -> "water")))
    val r0 = out(0); val r1 = out(1); val r2 = out(2)

    assert(r0.getAs[String]("cluster_name") == "sdi")

    // issued: publication date wins (:204-209)
    assert(r0.getAs[String]("issued") == "2019-04-04")
    // the two-record hot-fix overrides the createDate fallback (:213-215)
    assert(r1.getAs[String]("issued") == "2023-08-03T06:00:00Z")
    // the sdi chain has NO creationDateForResource step — null, where the
    // fise chain would have picked 2017-07-07
    assert(r2.getAs[String]("issued") == null)
    val fisePre = byRn(preNormalizeSdi(sdiDocsFull, sdiObligations, 2016))
    assert(fisePre(2).getAs[String]("issued") == "2017-07-07")

    // theme taxonomy maps post-rename tokens; unmapped pass through
    // (:236-239) — sdi_topics → topic via sdi_normalizers normProp
    assert(r0.getSeq[String](r0.fieldIndex("topic")) == Seq("climate", "water"))

    // time_coverage years as strings (:352-356)
    assert(r0.getSeq[String](r0.fieldIndex("time_coverage")) ==
      Seq("2011", "2012", "2013", "2015", "2016"))

    // add_expired: obsolete cl_status stamps the pinned date (:320-330)
    assert(r0.getAs[String]("expires") == "2026-08-10")
    assert(r1.getAs[String]("expires") == null)

    // last_modified = max(children changeDates ∪ own changeDate) (:332-343)
    assert(r0.getAs[String]("last_modified") == "2022-03-03")
    assert(r1.getAs[String]("last_modified") == "2019-09-09")
    assert(r2.getAs[String]("last_modified") == null)

    // the shared sdi_normalizers maps still apply (Kosovo label, renames)
    assert(r0.getSeq[String](r0.fieldIndex("spatial")) == Seq("Kosovo", "Italy"))
    assert(r0.getAs[String]("hasWorkflowState") == "published")
    assert(r0.getAs[Long]("items_count_spatial") == 2L)
  }

  // ------------------------------------------------------------- registry

  test("registry: the 21 reference names, ctx plumbing, default, fallback") {
    val ctx = SiteContext(obligations = sdiObligations, currentYear = 2016,
      archivedExpires = "2026-08-10")
    val r = registry(ctx)
    // exactly the reference's register_facets_normalizer names
    assert(r.keySet == Set(
      "bise", "cab", "climate", "default", "discomap", "eea", "eea_en",
      "eionet", "energy", "fise", "fise_resource", "ias", "industry",
      "insitu", "land", "land_demo", "noise", "sdi", "sdi_fise",
      "wise_freshwater", "wise_marine"))

    // SiteContext reaches the sdi family through the closure
    val sdiOut = r("sdi")(sdiDocsFull)
    assert(sdiOut.count() == 3)
    assert(sdiOut.select("cluster_name").distinct().head.getString(0) == "sdi")

    // "default" drops every doc (site_default.py:7-9 returns None)
    assert(r("default")(eeaDocs).count() == 0)

    // unknown site ids fall back to the eea normalizer (registry.py:26-27)
    val viaFallback = normalizerFor("no-such-site", ctx)(eeaDocs)
      .orderBy("rn").collect().toSeq
    val viaEea = r("eea")(eeaDocs).orderBy("rn").collect().toSeq
    assert(viaFallback == viaEea)
  }

  test("nlpRegistry: the reference names, sdi pre-normalize, default, fallback") {
    val r = nlpRegistry()
    // exactly the register_nlp_preprocessor names: the facets list minus
    // eea_en (site_eea_europa_eu_en.py registers its preprocessor under
    // "eea", :72)
    assert(r.keySet == Set(
      "bise", "cab", "climate", "default", "discomap", "eea",
      "eionet", "energy", "fise", "fise_resource", "ias", "industry",
      "insitu", "land", "land_demo", "noise", "sdi", "sdi_fise",
      "wise_freshwater", "wise_marine"))
    assert(registry().keySet -- r.keySet == Set("eea_en"))

    val docs = spark.range(2).selectExpr(
      "cast(id as int) as rn",
      "concat('https://noise.eea.europa.eu/p/', id) as id",
      "concat('Title ', id) as title",
      """concat('<html><head><title>T</title></head><body>page body ',
                id, ' with prose</body></html>') as web_html""")
    // every common entry IS common_preprocess (NormOps.nlpPreprocess)
    val viaNoise = r("noise")(docs).orderBy("rn").collect().toSeq
    val direct = NormOps.nlpPreprocess(docs).orderBy("rn").collect().toSeq
    assert(viaNoise == direct)

    // "default" drops every doc; unknown ids (eea_en included) fall back
    // to the eea preprocessor (registry.py:30)
    assert(r("default")(docs).count() == 0)
    val viaFallback = nlpPreprocessorFor("eea_en")(docs)
      .orderBy("rn").collect().toSeq
    assert(viaFallback == r("eea")(docs).orderBy("rn").collect().toSeq)

    // the sdi pair pre-normalizes the RAW record first (site_sdi.py /
    // site_sdi_fise.py): the whitelisted raw text props reach nlp_text,
    // and a pre-normalize output column (site_id) appears
    val sdiRaw = spark.range(1).selectExpr(
      "'md-1' as metadataIdentifier",
      "cast(null as string) as issued",
      "array('2019-04-04') as publicationDateForResource",
      "array('2017-07-07') as creationDateForResource",
      "cast(null as string) as createDate",
      "cast(null as array<struct<url:string>>) as overview",
      "cast(null as array<struct<default:string,link:string>>) as `th_rod-eionet-europa-eu`",
      "cast(null as array<struct<default:string>>) as `th_eea-topics`",
      "cast(null as array<string>) as `th_gemet_tree.default`",
      "cast(null as array<struct<default:string>>) as cl_spatialRepresentationType",
      "cast(null as array<struct<default:string>>) as th_regions",
      "cast(null as array<struct<start:struct<date:string>,end:struct<date:string>>>) as resourceTemporalExtentDetails",
      "cast(null as array<struct<format:array<string>,changeDate:string>>) as children",
      "cast(null as array<struct<code:string>>) as resourceIdentifier",
      "'Series title' as `resourceTitleObject.default`",
      "'Series abstract' as `resourceAbstractObject.default`")
    val sdiOut = nlpPreprocessorFor("sdi",
      txtProps = Seq("resourceTitleObject.default", "resourceAbstractObject.default"))(
      sdiRaw).head
    val nlp = sdiOut.getAs[String]("nlp_text")
    assert(nlp.contains("Series title") && nlp.contains("Series abstract"))
    assert(sdiOut.getAs[String]("site_id") == "sdi") // pre-normalize ran
    assert(sdiOut.getAs[String]("issued") == "2019-04-04") // fise=false chain
  }

  test("normalizePortfolio unions per-site outputs by name with provenance") {
    val noiseDocs = spark.range(2).selectExpr(
      "cast(id as int) as rn",
      "concat('https://noise.eea.europa.eu/p/', id) as id",
      "'noise text with enough words for a body' as text",
      "'summary' as summary",
      "'<html><head><title>N</title></head><body>x</body></html>' as web_html")
    val out = normalizePortfolio(Seq(
      "noise" -> noiseDocs,
      "eea" -> eeaDocs))
    // noise rows carry topic [Noise]; eea rows null-fill it, and
    // eea-only columns (term_description) null-fill on the noise side
    assert(out.filter(col("site_id") === "noise").count() == 2)
    assert(out.filter(col("site_id") === "eea").count() == 3)
    val byId = out.filter(col("site_id") === "noise").head
    assert(byId.getSeq[String](byId.fieldIndex("topic")) == Seq("Noise"))
    assert(out.columns.contains("term_description"))
    assert(out.filter(col("site_id") === "noise")
      .filter(col("term_description").isNotNull).count() == 0)
  }

  test("prepareDocs: error admission, site normalize, fulltext, site_id") {
    val raw = spark.range(4).selectExpr(
      "cast(id as int) as rn",
      "concat('https://noise.eea.europa.eu/p/', id) as id",
      "'noise text with enough words for a body' as text",
      "'summary' as summary",
      """concat('<html><head><title>Page ', id,
                '</title></head><body>body prose long enough to clear the bar</body></html>')
         as web_html""",
      // rn 0: clean; rn 1: errored + indexed (drop); rn 2: errored,
      // NOT indexed (keep); rn 3: clean
      "CASE WHEN id IN (1, 2) THEN array('web') ELSE array() END as errors")
    val searchui = spark.range(2).selectExpr(
      "concat('https://noise.eea.europa.eu/p/', id) as id")

    val out = prepareDocs(raw, searchui, "noise")
    // exactly ONE fulltext column — the normalizer's joinText fulltext is
    // overwritten by the preprocessor's, like the reference's
    // normalized_doc["fulltext"] assignment (a duplicate name would make
    // every downstream select AMBIGUOUS_REFERENCE)
    assert(out.columns.count(_ == "fulltext") == 1)
    val rows = out.orderBy("rn").collect()
    assert(rows.map(_.getAs[Int]("rn")).toSeq == Seq(0, 2, 3))
    assert(rows.forall(_.getAs[String]("site_id") == "noise"))
    assert(rows.forall(_.getAs[String]("cluster_name") == "noise"))
    // fulltext extracted from the page html by the NLP preprocessor
    assert(rows.forall(
      _.getAs[String]("fulltext").contains("body prose long enough")))
    // a NULL errors column means no errors — an indexed doc with null
    // errors must re-admit
    val withNullErrors = raw.withColumn("errors",
      when(col("rn") === 0, lit(null).cast("array<string>"))
        .otherwise(col("errors")))
    val out2 = prepareDocs(withNullErrors, searchui, "noise")
    assert(out2.orderBy("rn").collect().map(_.getAs[Int]("rn")).toSeq ==
      Seq(0, 2, 3))
    // a duplicated id in the index listing must not fan out admitted rows
    // (the reference keys the listing by id — duplicates collapse)
    val dupListing = searchui.union(searchui)
    val out3 = prepareDocs(raw, dupListing, "noise")
    assert(out3.orderBy("rn").collect().map(_.getAs[Int]("rn")).toSeq ==
      Seq(0, 2, 3))
  }

  test("siteForUrl routes a mixed corpus into per-site registry runs") {
    val siteMap = Map(
      "noise" -> "https://noise.eea.europa.eu",
      "cab" -> "https://climate-advisory-board.europa.eu")
    val docs = spark.range(6).selectExpr(
      "cast(id as int) as rn",
      """CASE WHEN id % 2 = 0
           THEN concat('https://noise.eea.europa.eu/p/', id)
           ELSE concat('https://climate-advisory-board.europa.eu/d/', id)
         END as id""",
      "'site text with enough words for a body' as text",
      "'summary' as summary",
      "'<html><head><title>T</title></head><body>x</body></html>' as web_html",
      "'Page' as type_raw",
      "'published' as review_state",
      "concat('Title ', id) as title")
    val routed = docs.withColumn("site_id",
      SyncOps.siteForUrl(col("id"), siteMap))
    // route → split per site → registry normalize → portfolio union
    val bySite = Seq("noise", "cab").map(s =>
      s -> routed.filter(col("site_id") === s).drop("site_id"))
    val out = normalizePortfolio(bySite)
    assert(out.filter(col("site_id") === "noise").count() == 3)
    assert(out.filter(col("site_id") === "cab").count() == 3)
    assert(out.filter(col("cluster_name").isInCollection(Seq("noise", "cab")))
      .count() == 6)
  }

  test("diceSim scores similar and dissimilar text like the dup gate needs") {
    val df = spark.range(1).selectExpr(
      "'shared summary of the parent report body' as a",
      "'shared summary of the parent report body extended' as b",
      "'completely different fiche text' as c")
    val r = df.select(
      diceSim(col("a"), col("b")).as("sim"),
      diceSim(col("a"), col("c")).as("dis"),
      diceSim(col("a"), lit(null).cast("string")).as("nul")).head
    assert(r.getDouble(0) > 0.2)
    assert(r.getDouble(1) < 0.2)
    assert(r.getDouble(2) == 0.0)
  }
}
