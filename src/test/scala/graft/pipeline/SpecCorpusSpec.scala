package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.sinks.ValuesDatabase
import graft.sources.ValuesSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Golden-spec corpus runner — the analogue of the reference's
  * TransformSpecsITCase over its spec YAML suite: each YAML case scripts
  * a changelog through projection+filter and string-compares the
  * materialized sink state.
  */
class SpecCorpusSpec extends SparkSpec {

  private val root = {
    val in = getClass.getResourceAsStream("/specs/transform-specs.yaml")
    new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](in).asScala
  }

  private val tid = TableId.parse(root("table").toString)
  private val schema = StructType.fromDDL(root("schema").toString)
  private val pk = root("primary-key").toString
  private val tinfo = TableInfo(schema, primaryKeys = Seq(pk))

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (x: java.lang.Number, LongType) => java.lang.Long.valueOf(x.longValue())
    case (x: java.lang.Number, IntegerType) => java.lang.Integer.valueOf(x.intValue())
    case (x: java.lang.Number, DoubleType) => java.lang.Double.valueOf(x.doubleValue())
    case (x: java.lang.Boolean, BooleanType) => x
    case (x: String, _: DecimalType) => new java.math.BigDecimal(x)
    case (x: String, DateType) => java.sql.Date.valueOf(x)
    case (x: String, TimestampNTZType) =>
      java.time.LocalDateTime.parse(x.replace(' ', 'T'))
    case (x, StringType) => x.toString
    case (x, _) => x
  }

  private def rowOf(values: Seq[Any]): Row =
    Row.fromSeq(values.zip(schema.fields).map { case (v, f) => coerce(v, f.dataType) })

  private def metaOf(e: Map[String, Any]): Map[String, String] =
    e.get("meta").map(_.asInstanceOf[java.util.Map[String, Object]].asScala
      .map { case (k, v) => k -> v.toString }.toMap).getOrElse(Map.empty)

  private def scriptEvents(extra: Seq[Map[String, Any]]): Seq[Event] = {
    var curSchema = schema
    val seeds = root("seed-rows").asInstanceOf[java.util.List[java.util.List[Object]]]
      .asScala.toSeq.map(l => rowOf(l.asScala.toSeq))
    val state = scala.collection.mutable.LinkedHashMap[Any, Row](
      seeds.map(r => r.get(schema.fieldIndex(pk)) -> r): _*)
    val events = scala.collection.mutable.ArrayBuffer[Event](
      CreateTableEvent(tid, tinfo) +: seeds.map(r => DataChangeEvent.insert(tid, r)): _*)
    extra.foreach { e =>
      e("op").toString match {
        case "add-column" =>
          val f = StructField(e("name").toString, DataType.fromDDL(e("type").toString))
          curSchema = StructType(curSchema.fields :+ f)
          // null-pad tracked state like the sink does
          state.mapValuesInPlace((_, r) => Row.fromSeq(r.toSeq :+ null))
          events += AddColumnEvent(tid, Seq((f, ColumnPosition.Last)))
        case "update" =>
          val id = coerce(e("id"), schema(pk).dataType)
          val before = state(id)
          val sets = e("set").asInstanceOf[java.util.Map[String, Object]].asScala
          val after = Row.fromSeq(curSchema.fields.zipWithIndex.map { case (f, i) =>
            sets.get(f.name).map(v => coerce(v, f.dataType)).getOrElse(before.get(i))
          }.toSeq)
          state(id) = after
          events += DataChangeEvent.update(tid, before, after, metaOf(e))
        case "delete" =>
          val id = coerce(e("id"), schema(pk).dataType)
          val before = state(id)
          state.remove(id)
          events += DataChangeEvent.delete(tid, before, metaOf(e))
        case other => fail(s"unknown extra-event op $other")
      }
    }
    events.toSeq
  }

  private val cases = root("cases").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
    .asScala.toSeq.map(_.asScala)

  cases.foreach { c =>
    test(s"spec: ${c("name")}") {
      val rule = TransformRuleOf(
        Option(c.getOrElse("projection", null)).map(_.toString),
        Option(c.getOrElse("filter", null)).map(_.toString),
        Option(c.getOrElse("converter-after-transform", null)).map(_.toString),
        Option(c.getOrElse("primary-keys", null)).map(_.toString))
      val extra = c.get("extra-events")
        .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
          .asScala.toSeq.map(_.asScala.toMap.asInstanceOf[Map[String, Any]]))
        .getOrElse(Nil)
      val sourceOpts = c.get("metadata-list")
        .map(v => Map("metadata.list" -> v.toString)).getOrElse(Map.empty[String, String])
      val pd = PipelineDef(
        SourceDef("values", sourceOpts), SinkDef("values", Map.empty),
        transforms = rule.toSeq)
      val sink = new ValuesDatabase
      new PipelineRunner(spark, pd, new ValuesSource(scriptEvents(extra)), sink).run()
      val got = sink.results(tid).map(_.stripPrefix(s"${tid.identifier}:")).sorted
      val want = c("expect").asInstanceOf[java.util.List[Object]]
        .asScala.toSeq.map(_.toString).sorted
      assert(got === want, s"case ${c("name")}")
    }
  }

  private def TransformRuleOf(projection: Option[String], filter: Option[String],
      converter: Option[String] = None, primaryKeys: Option[String] = None) =
    if (projection.isEmpty && filter.isEmpty && converter.isEmpty) None
    else Some(graft.transform.TransformRule(tid.identifier,
      projection = projection, filter = filter,
      primaryKeys = primaryKeys.map(_.split(",").map(_.trim).toSeq).getOrElse(Seq(pk)),
      converter = converter))
}
