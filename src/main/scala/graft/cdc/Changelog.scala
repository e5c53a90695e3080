package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** DataFrame encodings of a CDC changelog.
  *
  * The reference multiplexes `DataChangeEvent{before, after, op}` objects
  * through one stream (flink-cdc-common/.../event/DataChangeEvent.java:51-63).
  * We use two DataFrame encodings:
  *
  *  - '''paired''': one row per change — columns
  *    `__op` (I/U/D/R), `before` struct, `after` struct, `__seq` long.
  *    This is the transform-operator input: filter/projection op-conversion
  *    is a pure projection over it (no shuffle, whole-stage codegen).
  *  - '''exploded''': one row per row-image — payload columns at top level
  *    plus `__op` in {+I,-U,+U,-D,+R} and `__seq`. This is the sink/SQL
  *    side encoding (Flink changelog-stream style).
  *
  * `__seq` orders changes per key (source-assigned, e.g. binlog position);
  * a -U/+U pair shares one `__seq`.
  */
object Changelog {

  val OpCol = "__op"
  val SeqCol = "__seq"
  val BeforeCol = "before"
  val AfterCol = "after"

  /** Optional source metadata map (map<string,string>) riding the paired
    * encoding — the DataFrame form of `DataChangeEvent.meta` (binlog
    * file/pos, op_ts, ...). Sources populate it; the transform surfaces
    * declared keys (`metadata.list`) as expression-visible columns; explode
    * drops it (meta reaches sinks only if projected into the payload).
    */
  val MetaCol = "__meta"

  /** Ops whose `after` image is present / whose `before` image is present. */
  private val afterOps = Seq("I", "U", "R")
  private val beforeOps = Seq("U", "D")

  /** Lift an insert-only DataFrame (e.g. a snapshot scan) into the paired
    * changelog encoding. Pure projection.
    */
  def fromInsertOnly(df: DataFrame, seq: Column = monotonically_increasing_id()): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val payloadType = StructType(df.schema.fields.map(_.copy(metadata =
      org.apache.spark.sql.types.Metadata.empty)))
    df.select(
      lit("I").as(OpCol),
      lit(null).cast(payloadType).as(BeforeCol),
      payload.as(AfterCol),
      seq.cast("long").as(SeqCol))
  }

  /** Paired -> exploded: emits -U/+U as two rows. Uses a single generator
    * (posexplode of the up-to-2 images) — stays a narrow transform.
    */
  def explode(paired: DataFrame): DataFrame = {
    val payloadType = paired.schema(AfterCol).dataType.asInstanceOf[StructType]
    val images = array(
      // an image row is only emitted when that image exists (e.g. an UPDATE
      // from a source without before-images has no -U retraction)
      when(col(OpCol).isin(beforeOps: _*) && col(BeforeCol).isNotNull,
        struct(concat(lit("-"), col(OpCol)).as("op"), col(BeforeCol).as("img"))),
      when(col(OpCol).isin(afterOps: _*) && col(AfterCol).isNotNull,
        struct(concat(lit("+"), when(col(OpCol) === "R", "R").otherwise(col(OpCol))).as("op"),
          col(AfterCol).as("img"))))
    val exploded = paired
      .withColumn("__img", explode_outer(filter(images, _.isNotNull)))
      .where(col("__img").isNotNull)
    val payloadCols = payloadType.fieldNames.toIndexedSeq.map(f => col(s"__img.img.$f").as(f))
    exploded.select(
      payloadCols ++ Seq(
        col("__img.op").cast(StringType).as(OpCol),
        col(SeqCol)): _*)
  }

  /** Exploded -> paired. U pairs are re-joined by `__seq` (one hash
    * aggregation keyed by `__seq` — shuffles only the update subset in
    * spirit; insert-only feeds take the cheap group-of-one path).
    */
  def pair(exploded: DataFrame, payload: Seq[String]): DataFrame = {
    val img = struct(payload.map(col): _*)
    exploded
      .withColumn("__img", img)
      .groupBy(col(SeqCol))
      .agg(
        max(when(col(OpCol).isin("+I", "+U", "+R"), col(OpCol))).as("__aop"),
        max(when(col(OpCol) === "-D", col(OpCol))).as("__dop"),
        max(when(col(OpCol).isin("+I", "+U", "+R"), col("__img"))).as(AfterCol),
        max(when(col(OpCol).isin("-U", "-D"), col("__img"))).as(BeforeCol))
      .select(
        when(col("__aop") === "+I", "I")
          .when(col("__aop") === "+U", "U")
          .when(col("__aop") === "+R", "R")
          .when(col("__dop") === "-D", "D").as(OpCol),
        col(BeforeCol), col(AfterCol), col(SeqCol))
  }

  /** Final table state from an exploded changelog: per primary key, the
    * latest image wins; a final -U/-D leaves no row. Single shuffle on the
    * primary key — the same hash-partitioning the reference applies before
    * its sinks (RegularPrePartitionOperator.java:86-130). At 100 TB this is
    * the unavoidable keyed exchange; AQE handles skewed keys.
    */
  def materialize(exploded: DataFrame, primaryKeys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(primaryKeys.map(col): _*)
      // later __seq wins; +X beats -X at equal __seq (an update's new image
      // outranks its old image)
      .orderBy(col(SeqCol).desc, col(OpCol).substr(1, 1).asc)
    val payload = exploded.columns.filterNot(c => c == OpCol || c == SeqCol)
    exploded
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(OpCol).isin("+I", "+U", "+R"))
      .select(payload.toIndexedSeq.map(col): _*)
  }
}
