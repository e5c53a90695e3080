package graft.transform

import graft.cdc.Changelog
import graft.model.TableId
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Harness mirroring the reference's transform golden-spec runner
  * (flink-cdc-composer/.../specs/TransformSpecsITCase.java): the same
  * 35-column `foo.bar.baz` input table, the same 6-event script
  * (+I r1, U r1→r2, -D r2, +I r3[all-null], -D r3), projection/filter per
  * case through [[TransformEngine.transformChangelog]], and the output
  * rendered in the reference's event-string format
  * (`DataChangeEvent{tableId=…, before=[…], after=[…], op=…, meta=()}`)
  * so the reference's spec YAML files port nearly verbatim.
  *
  * Representation shifts from the reference's engine (documented here
  * once; per-case divergences are flagged inline in the ported YAML):
  *  - Spark timestamps are MICROsecond precision: the reference's
  *    nanosecond renderings truncate their last 3 digits.
  *  - TIME(p) rides as millis-of-day INT (CdcTemporal): rendered back as
  *    `HH:mm:ss` for source columns; a COMPUTED time value renders as its
  *    Spark type.
  *  - TIMESTAMP_TZ rides as the (instant, tz) struct (CdcTemporal) and
  *    renders as `local±offset`.
  */
object RefSpecHarness {

  val tid: TableId = TableId.parse("foo.bar.baz")

  /** One source column: reference schema descriptor (rendered verbatim in
    * CreateTableEvent for passthrough columns), Spark DDL type, r1/r2 SQL
    * literals, and a rendering kind for types Spark has no native form of.
    */
  final case class Col(
      name: String, descriptor: String, ddl: String,
      r1: String, r2: String, kind: String = "plain")

  // millis-of-day for the reference's TimeData values
  private def ms(h: Int, m: Int, s: Int): Int = ((h * 3600 + m * 60 + s) * 1000)

  val cols: Seq[Col] = Seq(
    Col("id_", "`id_` BIGINT NOT NULL 'Identifier'", "BIGINT",
      "CAST(1 AS BIGINT)", "CAST(-1 AS BIGINT)"),
    Col("bool_", "`bool_` BOOLEAN 'George' 'false'", "BOOLEAN", "true", "false"),
    Col("tinyint_", "`tinyint_` TINYINT", "TINYINT",
      "CAST(2 AS TINYINT)", "CAST(-2 AS TINYINT)"),
    Col("smallint_", "`smallint_` SMALLINT", "SMALLINT",
      "CAST(3 AS SMALLINT)", "CAST(-3 AS SMALLINT)"),
    Col("int_", "`int_` INT", "INT", "4", "-4"),
    Col("bigint_", "`bigint_` BIGINT", "BIGINT",
      "CAST(5 AS BIGINT)", "CAST(-5 AS BIGINT)"),
    Col("float_", "`float_` FLOAT", "FLOAT",
      "CAST(7.7 AS FLOAT)", "CAST(-7.7 AS FLOAT)"),
    Col("double_", "`double_` DOUBLE", "DOUBLE",
      "CAST(88.88 AS DOUBLE)", "CAST(-88.88 AS DOUBLE)"),
    Col("decimal_10_0_", "`decimal_10_0_` DECIMAL(10, 0)", "DECIMAL(10,0)",
      "CAST(1234567890 AS DECIMAL(10,0))", "CAST(-9876543210 AS DECIMAL(10,0))"),
    Col("decimal_20_2_", "`decimal_20_2_` DECIMAL(20, 2)", "DECIMAL(20,2)",
      "CAST('123456789012345678.90' AS DECIMAL(20,2))",
      "CAST('-987654321098765432.10' AS DECIMAL(20,2))"),
    Col("char_", "`char_` CHAR(140) 'Let''s Tweet' '...'", "STRING",
      "'Alice'", "'爱丽丝'"),
    Col("varchar_", "`varchar_` VARCHAR(140)", "STRING", "'Zorro'", "'疯帽子'"),
    Col("string_", "`string_` STRING", "STRING",
      "'From A to Z is Lie'", "'天地玄黄宇宙洪荒'"),
    Col("binary_", "`binary_` BINARY(640)", "BINARY",
      "CAST('Lorem ipsum' AS BINARY)", "CAST('一二三四五' AS BINARY)"),
    Col("varbinary_", "`varbinary_` VARBINARY(640)", "BINARY",
      "CAST('dolor sit amet' AS BINARY)", "CAST('六七八九十' AS BINARY)"),
    Col("bytes_", "`bytes_` BYTES", "BINARY",
      "CAST('amet consectetuer' AS BINARY)", "CAST('吾輩は猫である' AS BINARY)"),
    Col("timestamp_0_", "`timestamp_0_` TIMESTAMP(0)", "TIMESTAMP_NTZ",
      "TIMESTAMP_NTZ'1970-01-02 10:17:36.789123'",
      "TIMESTAMP_NTZ'1970-01-09 08:57:36.789723'"),
    Col("timestamp_6_", "`timestamp_6_` TIMESTAMP(6)", "TIMESTAMP_NTZ",
      "TIMESTAMP_NTZ'1970-01-03 17:09:27.891234'",
      "TIMESTAMP_NTZ'1970-01-10 15:49:27.891834'"),
    Col("timestamp_9_", "`timestamp_9_` TIMESTAMP(9)", "TIMESTAMP_NTZ",
      "TIMESTAMP_NTZ'1970-01-05 00:01:18.912345'",
      "TIMESTAMP_NTZ'1970-01-11 22:41:18.912945'"),
    Col("timestamp_tz_0_", "`timestamp_tz_0_` TIMESTAMP(0) WITH TIME ZONE",
      "STRUCT<instant: TIMESTAMP, tz: STRING>",
      "named_struct('instant', CAST('1970-01-02 02:17:36.789123+00:00' AS TIMESTAMP), 'tz', '+08:00')",
      "named_struct('instant', CAST('1970-01-09 00:57:36.789723+00:00' AS TIMESTAMP), 'tz', '+08:00')",
      kind = "tz"),
    Col("timestamp_tz_6_", "`timestamp_tz_6_` TIMESTAMP(6) WITH TIME ZONE",
      "STRUCT<instant: TIMESTAMP, tz: STRING>",
      "named_struct('instant', CAST('1970-01-03 16:09:27.891234+00:00' AS TIMESTAMP), 'tz', '+01:00')",
      "named_struct('instant', CAST('1970-01-10 14:49:27.891834+00:00' AS TIMESTAMP), 'tz', '+01:00')",
      kind = "tz"),
    Col("timestamp_tz_9_", "`timestamp_tz_9_` TIMESTAMP(9) WITH TIME ZONE",
      "STRUCT<instant: TIMESTAMP, tz: STRING>",
      "named_struct('instant', CAST('1970-01-05 04:01:18.912345+00:00' AS TIMESTAMP), 'tz', '-04:00')",
      "named_struct('instant', CAST('1970-01-12 02:41:18.912945+00:00' AS TIMESTAMP), 'tz', '-04:00')",
      kind = "tz"),
    Col("timestamp_ltz_0_", "`timestamp_ltz_0_` TIMESTAMP_LTZ(0)", "TIMESTAMP",
      "CAST('1970-01-02 10:17:36.789123+00:00' AS TIMESTAMP)",
      "CAST('1970-01-09 08:57:36.789723+00:00' AS TIMESTAMP)"),
    Col("timestamp_ltz_6_", "`timestamp_ltz_6_` TIMESTAMP_LTZ(6)", "TIMESTAMP",
      "CAST('1970-01-03 17:09:27.891234+00:00' AS TIMESTAMP)",
      "CAST('1970-01-10 15:49:27.891834+00:00' AS TIMESTAMP)"),
    Col("timestamp_ltz_9_", "`timestamp_ltz_9_` TIMESTAMP_LTZ(9)", "TIMESTAMP",
      "CAST('1970-01-05 00:01:18.912345+00:00' AS TIMESTAMP)",
      "CAST('1970-01-11 22:41:18.912945+00:00' AS TIMESTAMP)"),
    Col("date_", "`date_` DATE", "DATE", "DATE'2000-12-31'", "DATE'2001-01-01'"),
    Col("time_0_", "`time_0_` TIME(0)", "INT",
      ms(19, 43, 17).toString, ms(12, 34, 45).toString, kind = "time"),
    Col("time_6_", "`time_6_` TIME(6)", "INT",
      ms(21, 45, 3).toString, ms(23, 45, 7).toString, kind = "time"),
    Col("time_9_", "`time_9_` TIME(9)", "INT",
      ms(3, 59, 59).toString, ms(2, 30, 5).toString, kind = "time"),
    Col("array_int_", "`array_int_` ARRAY<INT>", "ARRAY<INT>",
      "array(1, 1, 2, 3, 5, 8, 13)", "array(2, 3, 5, 7, 11, 13, 17, 19)"),
    Col("array_string_", "`array_string_` ARRAY<STRING>", "ARRAY<STRING>",
      "array('one', 'one', 'two', 'three', 'five')",
      "array('二', 'san', '五', 'qi', '十一')"),
    Col("map_int_string_", "`map_int_string_` MAP<INT, STRING>", "MAP<INT, STRING>",
      "map(1, 'one', 2, 'two', 3, 'three')", "map(1, 'yi', 2, 'er', 3, 'san')"),
    // key order mirrors the reference's rendered (hash) order so map
    // renderings compare verbatim
    Col("map_string_array_string_",
      "`map_string_array_string_` MAP<STRING, ARRAY<STRING>>",
      "MAP<STRING, ARRAY<STRING>>",
      "map('two', array('T', 'W', 'O'), 'one', array('O', 'N', 'E'), 'three', array('T', 'H', 'R', 'E', 'E'))",
      "map('二', array('E', 'R'), '三', array('S', 'A', 'N'), '一', array('Y', 'I'))"),
    Col("complex_row_", "`complex_row_` ROW<`name` STRING, `length` INT>",
      "STRUCT<name: STRING, length: INT>",
      "named_struct('name', 'Alice', 'length', 5)",
      "named_struct('name', 'Derrida', 'length', 7)"),
    Col("variant_", "`variant_` VARIANT", "VARIANT",
      """parse_json('{"k":1,"object":{"k":"hello"},"array":[1,2,{"kk":1.123}]}')""",
      """parse_json('[{"k":1},"hello",{"k":2}]')"""))

  private val colByName: Map[String, Col] = cols.map(c => c.name -> c).toMap

  /** One run's inputs — mirrors TransformSpecsITCase.TestSpec. */
  final case class Spec(
      projection: Option[String], filter: Option[String],
      primaryKey: Option[String], partitionKey: Option[String],
      tableOptions: Option[String], converters: Option[String],
      nonNull: Boolean, timeZone: String)

  private def record(spark: SparkSession, sel: Col => String): DataFrame =
    spark.sql("SELECT " + cols.map(c => s"${sel(c)} AS ${c.name}").mkString(", "))

  /** The declared payload schema: reference nullability (only id_ is NOT
    * NULL) and TIME columns tagged with CdcTemporal metadata so the
    * dialect can recognize the millis-of-day encoding.
    */
  val payloadSchema: StructType = StructType(cols.map { c =>
    StructField(c.name, DataType.fromDDL(c.ddl), nullable = c.name != "id_",
      metadata =
        if (c.kind == "time") graft.sources.CdcTemporal.timeMetadata
        else Metadata.empty)
  })

  private def nullRecord(spark: SparkSession): DataFrame =
    spark.sql("SELECT " + cols.map { c =>
      val v = if (c.name == "id_") "CAST(0 AS BIGINT)" else s"CAST(NULL AS ${c.ddl})"
      s"$v AS ${c.name}"
    }.mkString(", "))

  /** The scripted paired changelog: +I r1, U r1→r2, -D r2, +I r3, -D r3. */
  private def script(spark: SparkSession, nonNull: Boolean): DataFrame = {
    val r1 = record(spark, _.r1)
    val r2 = record(spark, _.r2)
    val r3 = nullRecord(spark)
    // cast each image struct to the metadata-tagged payload type so the
    // dialect can recognize TIME columns (a cast's result type carries
    // the target's field metadata verbatim)
    val st: DataType = payloadSchema
    def img(df: DataFrame) =
      df.selectExpr("struct(*) AS s").select(col("s").cast(st).as("s"))
    def nul = lit(null).cast(st)
    val ev = Seq(
      img(r1).select(lit("I").as(Changelog.OpCol), nul.as(Changelog.BeforeCol),
        col("s").as(Changelog.AfterCol), lit(1L).as(Changelog.SeqCol)),
      img(r1).withColumnRenamed("s", "b").crossJoin(img(r2))
        .select(lit("U").as(Changelog.OpCol), col("b").as(Changelog.BeforeCol),
          col("s").as(Changelog.AfterCol), lit(2L).as(Changelog.SeqCol)),
      img(r2).select(lit("D").as(Changelog.OpCol), col("s").as(Changelog.BeforeCol),
        nul.as(Changelog.AfterCol), lit(3L).as(Changelog.SeqCol))) ++
      (if (nonNull) Nil else Seq(
        img(r3).select(lit("I").as(Changelog.OpCol), nul.as(Changelog.BeforeCol),
          col("s").as(Changelog.AfterCol), lit(4L).as(Changelog.SeqCol)),
        img(r3).select(lit("D").as(Changelog.OpCol), col("s").as(Changelog.BeforeCol),
          nul.as(Changelog.AfterCol), lit(5L).as(Changelog.SeqCol))))
    ev.reduce(_ unionByName _)
  }

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Run one spec; Right(rendered event lines) or Left(error rendering). */
  def run(spark: SparkSession, spec: Spec): Either[String, Seq[String]] = {
    val priorTz = spark.conf.get("spark.sql.session.timeZone")
    if (registered.compareAndSet(false, true))
      graft.functions.CdcFunctions.registerAll(spark)
    try {
      spark.conf.set("spark.sql.session.timeZone", spec.timeZone)
      val rule = TransformRule(tid.identifier,
        projection = spec.projection, filter = spec.filter,
        primaryKeys = spec.primaryKey.map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Nil),
        partitionKeys = spec.partitionKey.map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Nil),
        tableOptions = spec.tableOptions.map(_.split(",").map(_.trim).toSeq
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
          .getOrElse(Map.empty),
        converter = spec.converters)
      val engine = new TransformEngine(spark, Seq(rule))
      val out = engine.transformChangelog(tid, script(spark, spec.nonNull))
      val outSchema = out.schema(Changelog.AfterCol).dataType.asInstanceOf[StructType]
      val rows = out.orderBy(Changelog.SeqCol).collect().toSeq
      val zone = java.time.ZoneId.of(spec.timeZone)
      Right(renderCreate(createSchema(spark, spec), rule) +:
        rows.map(renderEvent(_, outSchema, zone)))
    } catch {
      case e: Throwable =>
        val sw = new java.io.StringWriter
        e.printStackTrace(new java.io.PrintWriter(sw))
        Left(sw.toString)
    } finally spark.conf.set("spark.sql.session.timeZone", priorTz)
  }

  /** CreateTableEvent schema: Spark-deduced TYPES (projection evaluated
    * over the record frame, so extraction-through-nullable-image noise
    * never shows) with the reference's NULLABILITY derivation — only
    * attribute references and pure arithmetic propagate operand
    * nullability; every function/cast/comparison result is declared
    * nullable (the reference's operator table declares nullable returns
    * even where the runtime can never yield null).
    */
  private def createSchema(spark: SparkSession, spec: Spec): StructType =
    spec.projection match {
      case None => payloadSchema
      case Some(p) =>
        import org.apache.spark.sql.graft.SparkInternals
        val withMeta = record(spark, _.r1)
          .withColumn("__namespace_name__", lit("foo"))
          .withColumn("__schema_name__", lit("bar"))
          .withColumn("__table_name__", lit("baz"))
          .withColumn("__data_event_type__", lit("+I"))
        val fields = TransformEngine.splitTopLevel(p).flatMap {
          case "*" => payloadSchema.fields.toSeq
          case item =>
            val e = ReferenceDialect.rewriteExpr(
              SparkInternals.parseExpression(spark, ReferenceDialect.rewriteSql(item)),
              payloadSchema)
            val f = withMeta.select(SparkInternals.column(e)).schema.fields.head
            Seq(StructField(f.name, f.dataType, nullable = refNullable(e)))
        }
        StructType(fields)
    }

  private def refNullable(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case Alias(c, _) => refNullable(c)
      case UnresolvedAttribute(parts) =>
        val n = parts.last
        if (MetadataColumns.all(n)) false
        else payloadSchema.fields.find(_.name.equalsIgnoreCase(n)).forall(_.nullable)
      case Literal(v, _) => v == null
      case _: Add | _: Subtract | _: Multiply | _: Divide | _: Remainder |
           _: UnaryMinus => e.children.exists(refNullable)
      case _ => true
    }
  }

  // ---- rendering ----

  /** CDC type name of a Spark type (for computed columns and ROW fields). */
  def cdcName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "STRING"
    case _: CharType | _: VarcharType => "STRING"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case DateType => "DATE"
    case TimestampNTZType => "TIMESTAMP(6)"
    case TimestampType => "TIMESTAMP_LTZ(6)"
    case BinaryType => "BYTES"
    case ArrayType(e, _) => s"ARRAY<${cdcName(e)}>"
    case MapType(k, v, _) => s"MAP<${cdcName(k)}, ${cdcName(v)}>"
    case s: StructType =>
      "ROW<" + s.fields.map(f => s"`${f.name}` ${cdcName(f.dataType)}").mkString(", ") + ">"
    case v if v.typeName == "variant" => "VARIANT"
    case other => other.sql
  }

  private def isTzStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.map(_.name).toSeq == Seq("instant", "tz") &&
        s.fields.head.dataType == TimestampType
    case _ => false
  }

  /** Column descriptor for the CreateTableEvent line: passthrough source
    * columns render their reference descriptor verbatim (type + comment +
    * default survive projection, as in the reference's PreTransform);
    * computed columns derive from the Spark-deduced type.
    */
  private def describe(f: StructField): String =
    colByName.get(f.name) match {
      case Some(src) if sameType(f, src) => src.descriptor
      case _ =>
        s"`${f.name}` ${cdcName(f.dataType)}" + (if (f.nullable) "" else " NOT NULL")
    }

  private def sameType(f: StructField, src: Col): Boolean =
    f.dataType.sql.replace(" NOT NULL", "") ==
      org.apache.spark.sql.types.DataType.fromDDL(src.ddl).sql.replace(" NOT NULL", "")

  private def renderCreate(schema: StructType, rule: TransformRule): String = {
    val columns = schema.fields.map(describe).mkString(",")
    val pks = rule.primaryKeys.mkString(";")
    val parts =
      if (rule.partitionKeys.isEmpty) ""
      else s", partitionKeys=${rule.partitionKeys.mkString(";")}"
    val opts =
      if (rule.tableOptions.isEmpty) "options=()"
      else "options=({" + rule.tableOptions.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(", ") + "})"
    s"CreateTableEvent{tableId=$tid, schema=columns={$columns}, " +
      s"primaryKeys=$pks$parts, $opts}"
  }

  private def renderEvent(row: Row, schema: StructType, zone: java.time.ZoneId): String = {
    val op = row.getString(row.fieldIndex(Changelog.OpCol)) match {
      case "I" => "INSERT"
      case "U" => "UPDATE"
      case "D" => "DELETE"
      case "R" => "REPLACE"
    }
    def image(name: String): String = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) "[]"
      else renderStructBody(row.getStruct(i), schema, zone)
    }
    s"DataChangeEvent{tableId=$tid, before=${image(Changelog.BeforeCol)}, " +
      s"after=${image(Changelog.AfterCol)}, op=$op, meta=()}"
  }

  private def renderStructBody(r: Row, schema: StructType, zone: java.time.ZoneId): String =
    "[" + schema.fields.zipWithIndex.map { case (f, i) =>
      renderValue(r.get(i), f.dataType, f.name, zone)
    }.mkString(", ") + "]"

  /** Reference-format value rendering, keyed by Spark type + the source
    * column's kind (TIME ints and TZ structs have no native Spark type).
    */
  def renderValue(v: Any, dt: DataType, name: String, zone: java.time.ZoneId): String = v match {
    case null => "null"
    case _ if colByName.get(name).exists(_.kind == "time") && dt == IntegerType =>
      java.time.LocalTime.ofSecondOfDay(0).plusNanos(
        v.asInstanceOf[Int].toLong * 1000000L).toString
    case r: Row if isTzStruct(dt) =>
      if (r.isNullAt(0)) "null"
      else {
        val inst = r.getAs[java.sql.Timestamp](0).toInstant
        val off = java.time.ZoneOffset.of(r.getString(1))
        java.time.LocalDateTime.ofInstant(inst, off).toString + r.getString(1)
      }
    case ts: java.sql.Timestamp =>
      java.time.LocalDateTime.ofInstant(ts.toInstant, zone).toString
    case i: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(i, zone).toString
    case ldt: java.time.LocalDateTime => ldt.toString
    case d: java.sql.Date => d.toLocalDate.toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: scala.math.BigDecimal => bd.underlying.toPlainString
    case seq: scala.collection.Seq[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      "[" + seq.map(renderValue(_, et, "", zone)).mkString(", ") + "]"
    case m: scala.collection.Map[_, _] =>
      val mt = dt.asInstanceOf[MapType]
      "{" + m.map { case (k, vv) =>
        s"${renderValue(k, mt.keyType, "", zone)} -> ${renderValue(vv, mt.valueType, "", zone)}"
      }.mkString(", ") + "}"
    case r: Row =>
      val st = dt.asInstanceOf[StructType]
      "{" + st.fields.zipWithIndex.map { case (f, i) =>
        s"${f.name}: ${cdcName(f.dataType)} -> ${renderValue(r.get(i), f.dataType, "", zone)}"
      }.mkString(", ") + "}"
    case vv: org.apache.spark.unsafe.types.VariantVal => vv.toString
    case other => other.toString
  }
}
