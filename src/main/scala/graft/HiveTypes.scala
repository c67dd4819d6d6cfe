package graft

import org.apache.spark.sql.types._

/** Hive DDL type-string → Spark `DataType` — the engine's version of the
  * reference's central type map (dask_hivemetastore core.py maps Hive
  * type strings to numpy/pandas dtypes before building each dataframe;
  * SURVEY.md §1.2 gives the full three-column correspondence). The
  * reference stops at primitives because pandas has no nested dtypes
  * (arrays/maps/structs all land as `object` columns); Spark's type
  * system is recursive, so the nested forms parse for real here.
  *
  * Grammar (case-insensitive, whitespace-tolerant):
  * {{{
  *   type     := primitive | decimal | char | varchar
  *             | array '<' type '>'
  *             | map '<' type ',' type '>'
  *             | struct '<' name ':' type (',' name ':' type)* '>'
  *   decimal  := decimal ['(' p [',' s] ')']
  * }}}
  */
object HiveTypes {

  private val primitives: Map[String, DataType] = Map(
    "tinyint" -> ByteType,
    "smallint" -> ShortType,
    "int" -> IntegerType,
    "integer" -> IntegerType,
    "bigint" -> LongType,
    "float" -> FloatType,
    "real" -> FloatType,
    "double" -> DoubleType,
    "boolean" -> BooleanType,
    "string" -> StringType,
    "binary" -> BinaryType,
    // Hive timestamps are wall-clock values without a zone; Spark's
    // faithful carrier is TIMESTAMP_NTZ (the parquet fixtures read the
    // same way — see FIXTURES.md lineitem/orders)
    "timestamp" -> TimestampNTZType,
    "date" -> DateType)

  /** Parse one Hive type string, e.g. `map<string,array<decimal(10,2)>>`.
    * Throws IllegalArgumentException on malformed or unsupported input
    * (uniontype has no Spark analogue — the reference rejects it too). */
  def toSpark(hive: String): DataType = {
    val (t, rest) = parseType(hive, 0)
    require(skipWs(hive, rest) == hive.length,
      s"trailing input after type at ${rest}: '$hive'")
    t
  }

  /** Build a StructType from (name, hive-type-string) pairs — the shape
    * of a metastore StorageDescriptor's FieldSchema list. */
  def schemaOf(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (n, t) => StructField(n, toSpark(t)) })

  private def skipWs(s: String, i: Int): Int = {
    var j = i
    while (j < s.length && s(j).isWhitespace) j += 1
    j
  }

  private def parseWord(s: String, i0: Int): (String, Int) = {
    val i = skipWs(s, i0)
    var j = i
    while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
    require(j > i, s"expected a type name at $i in '$s'")
    (s.substring(i, j).toLowerCase, j)
  }

  private def expect(s: String, i0: Int, c: Char): Int = {
    val i = skipWs(s, i0)
    require(i < s.length && s(i) == c, s"expected '$c' at $i in '$s'")
    i + 1
  }

  private def parseInt(s: String, i0: Int): (Int, Int) = {
    val i = skipWs(s, i0)
    var j = i
    while (j < s.length && s(j).isDigit) j += 1
    require(j > i, s"expected a number at $i in '$s'")
    (s.substring(i, j).toInt, j)
  }

  private def parseType(s: String, i0: Int): (DataType, Int) = {
    val (word, i1) = parseWord(s, i0)
    word match {
      case w if primitives.contains(w) => (primitives(w), i1)
      case "decimal" =>
        val j = skipWs(s, i1)
        if (j < s.length && s(j) == '(') {
          val (p, j1) = parseInt(s, j + 1)
          val k = skipWs(s, j1)
          if (k < s.length && s(k) == ',') {
            val (sc, k1) = parseInt(s, k + 1)
            (DecimalType(p, sc), expect(s, k1, ')'))
          } else (DecimalType(p, 0), expect(s, k, ')'))
        } else (DecimalType(10, 0), i1) // Hive's default decimal
      case "char" =>
        val (n, j) = parseInt(s, expect(s, i1, '('))
        (CharType(n), expect(s, j, ')'))
      case "varchar" =>
        val (n, j) = parseInt(s, expect(s, i1, '('))
        (VarcharType(n), expect(s, j, ')'))
      case "array" =>
        val (elem, j) = parseType(s, expect(s, i1, '<'))
        (ArrayType(elem), expect(s, j, '>'))
      case "map" =>
        val (k, j1) = parseType(s, expect(s, i1, '<'))
        val (v, j2) = parseType(s, expect(s, j1, ','))
        (MapType(k, v), expect(s, j2, '>'))
      case "struct" =>
        var i = expect(s, i1, '<')
        val fields = Seq.newBuilder[StructField]
        var done = false
        while (!done) {
          val (name, j1) = parseWord(s, i)
          val (t, j2) = parseType(s, expect(s, j1, ':'))
          fields += StructField(name, t)
          val j3 = skipWs(s, j2)
          require(j3 < s.length, s"unterminated struct in '$s'")
          if (s(j3) == ',') i = j3 + 1
          else { i = expect(s, j3, '>'); done = true }
        }
        (StructType(fields.result()), i)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Hive type '$other' in '$s'")
    }
  }
}
