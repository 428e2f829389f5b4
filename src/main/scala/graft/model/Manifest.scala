package graft.model

import com.fasterxml.jackson.annotation.JsonProperty
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.types.{StructField, StructType}

/** Keboola Storage table manifest (the `/data` contract's `.manifest` JSON):
  * the declared-schema side of the CSV source (S2,
  * `components/wr-iceberg/src/component.py:65-77`) and the emitted metadata
  * of the CSV sink (K3, `components/ex-iceberg/src/component.py:57-76,82`).
  * Unknown keys in platform manifests are tolerated (FIXTURES §A3).
  */
final case class ManifestColumn(name: String, @JsonProperty("base_type") baseType: String)

final case class KeboolaManifest(
    columns: Seq[String] = Nil,
    @JsonProperty("primary_key") primaryKey: Seq[String] = Nil,
    delimiter: String = ",",
    enclosure: String = "\"",
    @JsonProperty("has_header") hasHeader: Boolean = false,
    incremental: Boolean = false,
    schema: Seq[ManifestColumn] = Nil) {

  /** Declared Spark read schema (mapping B); `allVarchar` forces StringType
    * on every column (`wr/src/configuration.py:29`, `wr:76`).
    */
  def sparkSchema(allVarchar: Boolean = false): StructType = {
    val byName = schema.map(c => c.name -> c.baseType).toMap
    val names = if (columns.nonEmpty) columns else schema.map(_.name)
    StructType(names.map { n =>
      val dt =
        if (allVarchar) org.apache.spark.sql.types.StringType
        else TypeMapper.toSparkType(byName.getOrElse(n, TypeMapper.Str))
      StructField(n, dt, nullable = true)
    })
  }
}

object KeboolaManifest {

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    .configure(SerializationFeature.INDENT_OUTPUT, true)

  def fromJson(json: String): KeboolaManifest =
    mapper.readValue(json, classOf[KeboolaManifest])

  def toJson(m: KeboolaManifest): String = mapper.writeValueAsString(m)

  /** Build the out-manifest for a result schema (K3): base types via
    * mapping A, plus primary key / incremental / header flags.
    */
  def forSchema(schema: StructType, primaryKey: Seq[String] = Nil,
      incremental: Boolean = false): KeboolaManifest =
    KeboolaManifest(
      columns = schema.fieldNames.toSeq,
      primaryKey = primaryKey,
      hasHeader = true,
      incremental = incremental,
      schema = schema.fields.toSeq.map(f =>
        ManifestColumn(f.name, TypeMapper.toBaseType(f.dataType))))
}
