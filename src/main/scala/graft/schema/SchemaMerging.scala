package graft.schema

import graft.model.TableInfo
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, struct}
import org.apache.spark.sql.types._

/** Type-widening lattice used when merging sharded tables into one sink
  * table. Re-expresses the semantics of the reference's `SchemaMergingUtils`
  * (flink-cdc-common/.../utils/SchemaMergingUtils.java:96-940) over Spark
  * SQL types:
  *
  *  - identical types merge to themselves;
  *  - exact numerics widen along TINYINT < SMALLINT < INT < BIGINT and can
  *    spill into DECIMAL / DOUBLE;
  *  - DECIMAL merges keep max integer-digits and max scale (capped at 38);
  *  - timestamps merge to the higher "zone level" (NTZ < LTZ) at max
  *    precision (Spark has a single micros precision, so precision merge is
  *    a no-op here);
  *  - everything else falls back to STRING, the universal type.
  */
object SchemaMerging {

  private val MaxPrecision = DecimalType.MAX_PRECISION // 38
  private val DefaultDecimal = DecimalType(MaxPrecision, 0)

  /** Progressively wider types reachable from `t` (the reference's
    * TYPE_MERGING_TREE, SchemaMergingUtils.java:853-940). First common
    * element of two chains is the least common type.
    */
  private def wideningChain(t: DataType): Seq[DataType] = t match {
    case StringType | _: CharType | _: VarcharType => Seq(StringType)
    case BooleanType => Seq(BooleanType, StringType)
    case BinaryType => Seq(BinaryType, StringType)
    case DoubleType => Seq(DoubleType, StringType)
    case FloatType => Seq(FloatType, DoubleType, StringType)
    case _: DecimalType => Seq(t, StringType) // handled by mergeDecimal first
    case LongType => Seq(LongType, DefaultDecimal, DoubleType, StringType)
    case IntegerType => Seq(IntegerType, LongType, DefaultDecimal, DoubleType, StringType)
    case ShortType =>
      Seq(ShortType, IntegerType, LongType, DefaultDecimal, FloatType, DoubleType, StringType)
    case ByteType =>
      Seq(ByteType, ShortType, IntegerType, LongType, DefaultDecimal, FloatType, DoubleType,
        StringType)
    case TimestampType => Seq(TimestampType, StringType)
    case TimestampNTZType => Seq(TimestampNTZType, TimestampType, StringType)
    case DateType => Seq(DateType, TimestampNTZType, TimestampType, StringType)
    case other => Seq(other, StringType)
  }

  /** Digits needed to represent the widest value of an exact-numeric type
    * (SchemaMergingUtils.getNumericPrecision).
    */
  def numericPrecision(t: DataType): Int = t match {
    case ByteType => 3
    case ShortType => 5
    case IntegerType => 10
    case LongType => 19
    case d: DecimalType => d.precision
    case other => throw new IllegalArgumentException(s"not exact-numeric: $other")
  }

  private def boundedDecimal(precision: Int, scale: Int): DecimalType = {
    // past MAX_PRECISION the reference sheds SCALE digits, preserving the
    // integer digits (SchemaMergingUtils.createDecimalBounded:931-938):
    // DECIMAL(25,16)+DECIMAL(32,32) -> DECIMAL(38,29),
    // DECIMAL(38,38)+DECIMAL(38,0) -> DECIMAL(38,0) — a clamp that kept
    // the scale instead would overflow every wide-integer value to null
    if (precision <= MaxPrecision) DecimalType(precision, scale)
    else DecimalType(MaxPrecision, math.max(0, scale - (precision - MaxPrecision)))
  }

  private def isExactNumeric(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | _: DecimalType => true
    case _ => false
  }

  private def mergeDecimal(a: DataType, b: DataType): DataType = (a, b) match {
    case (x: DecimalType, y: DecimalType) =>
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      val scale = math.max(x.scale, y.scale)
      boundedDecimal(intDigits + scale, scale)
    case (x: DecimalType, y) if isExactNumeric(y) =>
      boundedDecimal(math.max(x.precision, x.scale + numericPrecision(y)), x.scale)
    case (x, y: DecimalType) if isExactNumeric(x) => mergeDecimal(y, x)
    case _ => StringType
  }

  private def isTimestampish(t: DataType): Boolean = t match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The CdcTemporal zoned-timestamp encoding (instant, tz): graft's
    * TIMESTAMP_TZ. Sits at the top of the reference's timestamp chain
    * TIMESTAMP -> TIMESTAMP_LTZ -> TIMESTAMP_TZ
    * (SchemaMergingUtils.mergeTimestampType:384-430).
    */
  val ZonedTsType: StructType = StructType(Seq(
    StructField("instant", TimestampType), StructField("tz", StringType)))

  private def isZonedTs(t: DataType): Boolean = t match {
    case s: StructType =>
      s.fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq(("instant", TimestampType), ("tz", StringType))
    case _ => false
  }

  /** Least common type of two Spark types (nullable if either side is). */
  def leastCommonType(a: DataType, b: DataType): DataType = {
    if (a == b) a
    else if (isTimestampish(a) && isTimestampish(b)) TimestampType // NTZ+LTZ -> LTZ
    else if ((isZonedTs(a) && (isTimestampish(b) || isZonedTs(b))) ||
             (isZonedTs(b) && isTimestampish(a))) ZonedTsType // TZ dominates
    else if (a.isInstanceOf[DecimalType] || b.isInstanceOf[DecimalType]) mergeDecimal(a, b)
    else wideningChain(a).find(t => wideningChain(b).contains(t)).getOrElse(StringType)
  }

  /** Can a value of `upcoming` be stored in a column of `current` without
    * widening? (SchemaMergingUtils.isDataTypeCompatible:334; extended so a
    * wider DECIMAL absorbs narrower exact numerics, which Spark casts
    * losslessly.)
    */
  def isCompatible(current: Option[DataType], upcoming: DataType): Boolean =
    current.exists {
      case c if c == upcoming => true
      case d: DecimalType if isExactNumeric(upcoming) =>
        val (ui, us) = upcoming match {
          case u: DecimalType => (u.precision - u.scale, u.scale)
          case u => (numericPrecision(u), 0)
        }
        d.precision - d.scale >= ui && d.scale >= us
      case c => wideningChain(upcoming).contains(c)
    }

  /** Merge two struct schemas: keep `current` column order, widen common
    * columns, append `upcoming`-only columns at the end as nullable
    * (SchemaMergingUtils.getLeastCommonSchema:130).
    */
  def leastCommonSchema(current: StructType, upcoming: StructType): StructType = {
    val upByName = upcoming.fields.map(f => f.name -> f).toMap
    val merged = current.fields.map { f =>
      upByName.get(f.name) match {
        case Some(u) =>
          StructField(f.name, leastCommonType(f.dataType, u.dataType),
            f.nullable || u.nullable, f.metadata)
        case None => f.copy(nullable = true) // missing upstream -> nullable
      }
    }
    val curNames = current.fieldNames.toSet
    val appended = upcoming.fields.filterNot(f => curNames(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ appended)
  }

  def leastCommonSchema(schemas: Seq[StructType]): StructType =
    schemas.reduceLeft(leastCommonSchema)

  /** Merge full TableInfos: schemas widen; primary keys survive only if
    * shared by all shards; options union (last wins).
    */
  def leastCommonTableInfo(infos: Seq[TableInfo]): TableInfo = {
    require(infos.nonEmpty, "no schemas to merge")
    TableInfo(
      schema = leastCommonSchema(infos.map(_.schema)),
      primaryKeys = infos.map(_.primaryKeys).reduceLeft((a, b) => a.filter(b.contains)),
      partitionKeys = infos.head.partitionKeys,
      options = infos.map(_.options).reduceLeft(_ ++ _))
  }

  /** Columns that project a frame with schema `from` onto `target`: common
    * columns cast, missing columns filled with typed nulls — the DataFrame
    * analogue of the reference's per-row `coerceRow`
    * (SchemaMergingUtils.java:267-330). A pure projection: stays inside
    * whole-stage codegen, no shuffle.
    */
  def coercionColumns(from: StructType, target: StructType): Seq[Column] = {
    val have = from.fieldNames.toSet
    target.fields.toSeq.map { f =>
      if (have(f.name)) {
        val src = from(f.name).dataType
        if (src == f.dataType) col(f.name)
        else if (isZonedTs(f.dataType) && isTimestampish(src))
          // TIMESTAMP -> TIMESTAMP_TZ widening: sessions run UTC, so the
          // promoted value pins the Z offset (the reference attaches the
          // pipeline local zone the same way when widening to zoned)
          struct(col(f.name).cast(TimestampType).as("instant"),
            lit("Z").as("tz")).as(f.name)
        else if (f.dataType.isInstanceOf[DecimalType] && isExactNumeric(src))
          // DECIMAL destinations accept EVERY exact numeric by value
          // (SchemaMergingUtils.coerceToDecimal:682-704 rescales even
          // precision-losing decimals — the OOB merge rounds 0.123... at
          // scale 38 into 0 at scale 0)
          col(f.name).cast(f.dataType).as(f.name)
        else if (isCompatible(Some(f.dataType), src))
          col(f.name).cast(f.dataType).as(f.name)
        else
          // TYPE-level narrowing (arises when the sink schema trails the
          // upstream one — TRY_EVOLVE after a rejected DDL, IGNORE): the
          // reference nulls the whole column rather than value-casting
          // (SchemaMergingUtils.coerceRow:309-322 tolerance mode — a
          // FLOAT age nulls into a SMALLINT column even when the value
          // would fit)
          lit(null).cast(f.dataType).as(f.name)
      } else lit(null).cast(f.dataType).as(f.name)
    }
  }

  /** Project `df` onto `target`, widening/casting and null-filling. */
  def coerce(df: DataFrame, target: StructType): DataFrame =
    df.select(coercionColumns(df.schema, target): _*)
}
