package graft.sources

import org.apache.spark.sql.types._

/** ES index-DDL twin — the data half of the reference's index lifecycle
  * (lib/elastic.py): `create_index` (:107-120) builds
  * `{"mappings": {"properties": ...}, "settings": ...}` with an optional
  * `dense_vector` 768-d embedding field, and the rollover helpers flip
  * `index.blocks.write` (:8-9, :78-80). The HTTP PUT itself is transport
  * (SURVEY §6); what graft owns is the SCHEMA TRANSLATION — a Spark
  * `StructType` is the source of truth for what a search index of a
  * DataFrame must look like, so the mapping derives from it mechanically
  * and deterministically (fields in schema order, stable key order inside
  * each field — byte-identical output for identical schemas, same policy
  * as EsBulkSink's explicit-concat JSON).
  */
object EsIndexDdl {

  /** Spark type → ES field type. Strings become `text` with a `keyword`
    * sub-field (ES's own dynamic-mapping convention — search on the text,
    * aggregate/sort on `<field>.keyword`); `keywordCols` forces plain
    * keyword for id-like fields that should never be analyzed. Arrays map
    * to their element type (ES fields are implicitly multi-valued — there
    * is no array type in a mapping).
    */
  def esType(dt: DataType): String = dt match {
    case StringType => "text"
    case LongType => "long"
    case IntegerType | ShortType | ByteType => "integer"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case TimestampType | DateType => "date"
    case BinaryType => "binary"
    case ArrayType(elem, _) => esType(elem)
    case other =>
      throw new IllegalArgumentException(
        s"no ES mapping for Spark type ${other.simpleString} — flatten structs first")
  }

  private def fieldJson(name: String, dt: DataType, keyword: Boolean): String = {
    val body = dt match {
      case StringType | ArrayType(StringType, _) if keyword =>
        """{"type":"keyword"}"""
      case StringType | ArrayType(StringType, _) =>
        """{"type":"text","fields":{"keyword":{"type":"keyword","ignore_above":256}}}"""
      case other => s"""{"type":"${esType(other)}"}"""
    }
    s""""$name":$body"""
  }

  /** The `properties` mapping for a DataFrame schema, as deterministic
    * JSON (schema field order).
    */
  def mappingProperties(
      schema: StructType,
      keywordCols: Set[String] = Set.empty,
      embeddingCol: Option[String] = None,
      embeddingDims: Int = 768): String = {
    val fields = schema.fields.map {
      case f if embeddingCol.contains(f.name) =>
        // create_index's add_embedding toggle (elastic.py:108-109)
        s""""${f.name}":{"type":"dense_vector","dims":$embeddingDims}"""
      case f => fieldJson(f.name, f.dataType, keywordCols.contains(f.name))
    }
    fields.mkString("{", ",", "}")
  }

  /** The full `create_index` body (elastic.py:110):
    * `{"mappings":{"properties":<mapping>},"settings":<settings>}`.
    * Settings render in insertion order — pass a Seq so the output stays
    * byte-deterministic.
    */
  def createIndexBody(
      schema: StructType,
      settings: Seq[(String, String)] = Nil,
      keywordCols: Set[String] = Set.empty,
      embeddingCol: Option[String] = None,
      embeddingDims: Int = 768): String = {
    val props = mappingProperties(schema, keywordCols, embeddingCol, embeddingDims)
    val settingsJson = settings
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    s"""{"mappings":{"properties":$props},"settings":$settingsJson}"""
  }

  /** BLOCK_WRITE_TRUE / BLOCK_WRITE_FALSE (elastic.py:8-9) — the settings
    * bodies the rollover flow PUTs around `backup_index`.
    */
  def blockWrite(readOnly: Boolean): String =
    s"""{"settings":{"index.blocks.write":$readOnly}}"""

  /** The `properties` mapping rendered from a LOADED `elastic_mapping_*`
    * variable ([[graft.config.AirflowVariables.Variables.elasticMapping]])
    * instead of a Spark schema — for creating an index with the
    * reference's exact hand-authored mapping (analyzers, copy_to fan-in,
    * keyword sub-fields) rather than the schema-derived one. Document
    * field order, stable key order per field — byte-deterministic like
    * the schema path.
    */
  def mappingPropertiesFromConfig(
      fields: Seq[graft.config.AirflowVariables.EsMappingField]): String = {
    // names/analyzers/copy_to targets come from an ARBITRARY external
    // document (hand-authored config), unlike the schema path's Spark
    // identifiers — escape them or a quote in a value corrupts the DDL
    def esc(s: String): String = {
      val b = new StringBuilder(s.length + 8)
      s.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.toString
    }
    val rendered = fields.map { f =>
      val parts = Seq.newBuilder[String]
      parts += s""""type":"${esc(f.fieldType)}""""
      f.analyzer.foreach(a => parts += s""""analyzer":"${esc(a)}"""")
      if (f.copyTo.nonEmpty)
        parts += f.copyTo.map(t => s""""${esc(t)}"""").mkString(""""copy_to":[""", ",", "]")
      // verbatim passthrough: the sub-field object and any extra settings
      // are already well-formed compact JSON from the parsed document
      f.fieldsJson.foreach(j => parts += s""""fields":$j""")
      if (f.fielddata) parts += """"fielddata":true"""
      f.extra.foreach { case (k, j) => parts += s""""${esc(k)}":$j""" }
      s""""${esc(f.name)}":${parts.result().mkString("{", ",", "}")}"""
    }
    rendered.mkString("{", ",", "}")
  }
}
