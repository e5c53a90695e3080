package graft.cdc

import graft.SparkSpec

/** Port of the reference's `VariantConvertingTest.testVariantTypeCoercion`
  * (flink-cdc-common/src/test/java/.../converter/VariantConvertingTest.java:114-143)
  * onto Spark's native VariantType: the VARIANT → STRING coercion matrix
  * (`SchemaMergingUtils.coerceObject("UTC", v, VARIANT, STRING)` in the
  * reference ≙ `to_json(variant)` here — both produce the JSON rendering;
  * Spark's `cast(variant as string)` instead UNQUOTES top-level strings
  * and is not the coercion analog).
  *
  * The reference's other two cases (`testConvertingFromVariant` /
  * `testConvertingToVariant`) exercise its 629-LoC binary-variant codec
  * identity — N/A by design: Spark 4's VariantType IS that storage
  * (SURVEY §2.10 serializers).
  *
  * DIVERGENCE (formatting only, pinned below): the reference renders
  * temporals with ISO-8601 'T' ("1970-01-01T00:00:00.029+00:00");
  * Spark's variant JSON uses its SQL timestamp format with a space
  * ("1970-01-01 00:00:00.029+00:00"). Same instant, same offset, same
  * fraction. Also pinned: typed (timestamp/date/binary/decimal) members
  * inside variant OBJECTS are not constructible from public Spark SQL —
  * `cast(struct|map as variant)` both fail CAST_WITHOUT_SUGGESTION in
  * Spark 4.1 — so the object case runs over the JSON-expressible subset
  * via parse_json, which still pins the reference's sorted-key rendering.
  */
class VariantCoercionSpec extends SparkSpec {

  private def js(expr: String): String = {
    val r = spark.sql(s"select to_json($expr) as s").collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  // the 14 scalar builders, value-for-value the reference's TEST_VARIANTS
  private val scalars = Seq(
    "cast(true as variant)" -> "true",
    "cast(cast(2 as tinyint) as variant)" -> "2",
    "cast(cast(3 as smallint) as variant)" -> "3",
    "cast(5 as variant)" -> "5",
    "cast(cast(7 as bigint) as variant)" -> "7",
    "cast('11' as variant)" -> "\"11\"",
    "cast(cast(13 as double) as variant)" -> "13.0",
    "cast(cast(17 as float) as variant)" -> "17.0",
    "cast(cast('19' as binary) as variant)" -> "\"MTk=\"", // base64, like the reference
    "cast(cast(23 as decimal(10,0)) as variant)" -> "23",
    // reference: "1970-01-01T00:00:00.029+00:00" — divergence is the 'T'
    "cast(timestamp'1970-01-01 00:00:00.029Z' as variant)" ->
      "\"1970-01-01 00:00:00.029+00:00\"",
    "cast(date'1970-02-01' as variant)" -> "\"1970-02-01\"",
    // reference: "1970-01-01T00:00:37"
    "cast(timestamp_ntz'1970-01-01 00:00:37' as variant)" ->
      "\"1970-01-01 00:00:37\"",
    "parse_json('null')" -> "null")

  test("scalar variants coerce to the reference's JSON strings (testVariantTypeCoercion)") {
    scalars.foreach { case (expr, expected) =>
      assert(js(expr) === expected, s"for $expr")
    }
  }

  test("a heterogeneous variant array renders elementwise, comma-joined") {
    // reference row 15: every scalar in one array
    val arr = s"cast(array(${scalars.map(_._1).mkString(",")}) as variant)"
    assert(js(arr) ===
      "[true,2,3,5,7,\"11\",13.0,17.0,\"MTk=\",23," +
        "\"1970-01-01 00:00:00.029+00:00\",\"1970-02-01\"," +
        "\"1970-01-01 00:00:37\",null]")
  }

  test("variant objects render with keys sorted, like the reference's ordered builder") {
    // the reference's expected object string lists col_* keys in sorted
    // order; parse_json-built objects must sort regardless of input order
    val obj = """parse_json('{"col_string":"11","col_bool":true,"col_null":null,""" +
      """"col_int":5,"col_double":13.5,"col_bigint":7}')"""
    assert(js(obj) ===
      "{\"col_bigint\":7,\"col_bool\":true,\"col_double\":13.5," +
        "\"col_int\":5,\"col_null\":null,\"col_string\":\"11\"}")
    // and nested object-in-array keeps both renderings composed
    assert(js("""parse_json('[{"b":1,"a":2},[3,"x"]]')""") ===
      "[{\"a\":2,\"b\":1},[3,\"x\"]]")
  }

  test("struct/map casts to variant are unsupported (the documented constructor gap)") {
    for (bad <- Seq(
      "cast(named_struct('a', 1) as variant)",
      "cast(map('a', cast(1 as variant)) as variant)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"select to_json($bad)").collect()
      }
      assert(e.getMessage.contains("DATATYPE_MISMATCH"), s"for $bad")
    }
  }
}
