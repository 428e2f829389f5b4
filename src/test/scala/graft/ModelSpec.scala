package graft

import org.apache.spark.sql.types._
import graft.model.{KeboolaManifest, ManifestColumn, TypeMapper}
import graft.sources.KeboolaCsv

class ModelSpec extends SparkSpec {

  test("mapping A collapses engine types to Keboola base types (ex:110-136)") {
    assert(TypeMapper.toBaseType(ByteType) == "INTEGER")
    assert(TypeMapper.toBaseType(ShortType) == "INTEGER")
    assert(TypeMapper.toBaseType(IntegerType) == "INTEGER")
    assert(TypeMapper.toBaseType(LongType) == "INTEGER")
    assert(TypeMapper.toBaseType(FloatType) == "NUMERIC")
    assert(TypeMapper.toBaseType(DecimalType(10, 2)) == "NUMERIC")
    assert(TypeMapper.toBaseType(DoubleType) == "FLOAT")
    assert(TypeMapper.toBaseType(BooleanType) == "BOOLEAN")
    assert(TypeMapper.toBaseType(TimestampType) == "TIMESTAMP")
    assert(TypeMapper.toBaseType(TimestampNTZType) == "TIMESTAMP")
    assert(TypeMapper.toBaseType(DateType) == "DATE")
    // everything else is STRING, lossy by design
    assert(TypeMapper.toBaseType(StringType) == "STRING")
    assert(TypeMapper.toBaseType(BinaryType) == "STRING")
    assert(TypeMapper.toBaseType(ArrayType(IntegerType)) == "STRING")
    assert(TypeMapper.toBaseType(MapType(StringType, StringType)) == "STRING")
  }

  test("manifest json round trip tolerates platform keys") {
    val json =
      """{"columns": ["a", "b"], "primary_key": ["a"], "delimiter": ";",
        |"enclosure": "'", "has_header": true, "unknown_platform_key": 42,
        |"schema": [{"name": "a", "base_type": "INTEGER"},
        |           {"name": "b", "base_type": "STRING"}]}""".stripMargin
    val m = KeboolaManifest.fromJson(json)
    assert(m.columns == Seq("a", "b"))
    assert(m.primaryKey == Seq("a"))
    assert(m.delimiter == ";")
    assert(m.hasHeader)
    assert(m.sparkSchema() == StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    assert(m.sparkSchema(allVarchar = true).fields.forall(_.dataType == StringType))
    val back = KeboolaManifest.fromJson(KeboolaManifest.toJson(m))
    assert(back == m)
  }

  test("forSchema emits mapping-A base types") {
    val m = KeboolaManifest.forSchema(
      StructType(Seq(
        StructField("id", LongType), StructField("price", DoubleType),
        StructField("name", StringType))),
      primaryKey = Seq("id"), incremental = true)
    assert(m.schema == Seq(
      ManifestColumn("id", "INTEGER"), ManifestColumn("price", "FLOAT"),
      ManifestColumn("name", "STRING")))
    assert(m.incremental && m.hasHeader && m.primaryKey == Seq("id"))
  }

  test("quoted CSV sink + declared-schema source round-trips tricky values") {
    import spark.implicits._
    val df = Seq(
      (1L, "says \"hi\", twice", 1.5),
      (2L, "trailing space ", -0.25),
      (3L, "čeština, ťažké", 1e-9))
      .toDF("id", "note", "x")
    val dir = scratch("csvrt") + "/t"
    KeboolaCsv.writeQuoted(df, dir, singleFile = true)
    val m = KeboolaManifest.forSchema(df.schema)
    val back = KeboolaCsv.read(spark, dir, m).orderBy("id")
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("x").dataType == DoubleType)
    assert(back.collect().toSeq == df.orderBy("id").collect().toSeq)
    // every field quoted (FORCE_QUOTE * parity)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val csvFile = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".csv")).get
    val firstLines = scala.io.Source.fromInputStream(fs.open(csvFile), "UTF-8").getLines().take(2).toSeq
    assert(firstLines.head == "\"id\",\"note\",\"x\"")
    assert(firstLines(1).startsWith("\"1\",\"says \"\"hi\"\", twice\""))
  }
}
