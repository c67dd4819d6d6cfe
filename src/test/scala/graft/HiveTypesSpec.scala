package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY.md §1.2 type-correspondence table, row by row, plus the
  * nested forms the reference flattens to pandas `object` columns. */
class HiveTypesSpec extends AnyFunSuite with SparkSuite {

  test("every primitive row of the §1.2 table maps as documented") {
    val rows = Seq(
      "tinyint" -> ByteType, "smallint" -> ShortType,
      "int" -> IntegerType, "bigint" -> LongType,
      "float" -> FloatType, "double" -> DoubleType,
      "boolean" -> BooleanType, "string" -> StringType,
      "binary" -> BinaryType, "timestamp" -> TimestampNTZType,
      "date" -> DateType)
    rows.foreach { case (h, t) => assert(HiveTypes.toSpark(h) == t, h) }
  }

  test("parameterized types: decimal / char / varchar") {
    assert(HiveTypes.toSpark("decimal(12,2)") == DecimalType(12, 2))
    assert(HiveTypes.toSpark("decimal(7)") == DecimalType(7, 0))
    assert(HiveTypes.toSpark("decimal") == DecimalType(10, 0))
    assert(HiveTypes.toSpark("char(3)") == CharType(3))
    assert(HiveTypes.toSpark("varchar(64)") == VarcharType(64))
  }

  test("nested types parse recursively") {
    assert(HiveTypes.toSpark("array<float>") == ArrayType(FloatType))
    assert(HiveTypes.toSpark("map<string, array<decimal(10,2)>>") ==
      MapType(StringType, ArrayType(DecimalType(10, 2))))
    assert(HiveTypes.toSpark(
      "struct<id:bigint, tags:array<string>, kv:map<string,int>>") ==
      StructType(Seq(
        StructField("id", LongType),
        StructField("tags", ArrayType(StringType)),
        StructField("kv", MapType(StringType, IntegerType)))))
  }

  test("case and whitespace insensitive") {
    assert(HiveTypes.toSpark("  ARRAY < BigInt > ") == ArrayType(LongType))
  }

  test("schemaOf builds a FieldSchema-shaped StructType") {
    assert(HiveTypes.schemaOf(Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int")) ==
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
  }

  test("the parsed schema round-trips against a real fixture") {
    // embeddings.parquet reads exactly as the schema the Hive DDL
    // strings above declare (modulo nullability, which the metastore
    // does not carry)
    val actual = Tables.embeddings(spark, sf).schema
    val declared = HiveTypes.schemaOf(Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))
    assert(actual.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      declared.fields.map(f => (f.name, f.dataType.sql)).toSeq)
  }

  test("createExternal registers a readable table from Hive type strings") {
    spark.sql("DROP TABLE IF EXISTS ht_ext_embeddings")
    HiveTables.createExternal(spark, "default", "ht_ext_embeddings",
      Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
        "label" -> "int"),
      s"$sf/embeddings.parquet")
    try {
      val n = HiveTables.table(spark, "default", "ht_ext_embeddings").count()
      assert(n == Tables.embeddings(spark, sf).count())
    } finally spark.sql("DROP TABLE IF EXISTS ht_ext_embeddings")
  }

  test("malformed and unsupported strings are rejected") {
    Seq("uniontype<int,string>", "array<int", "decimal(,2)", "int>", "")
      .foreach { bad =>
        assertThrows[IllegalArgumentException](HiveTypes.toSpark(bad))
      }
  }
}
