package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators over
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the Spark primitive
  * reserved in SURVEY §2.9 for state beyond windowed aggregation.
  */
object Stateful {

  /** Cross-batch streaming dedup: emits only the first row ever seen per
    * key; subsequent occurrences (any batch) are dropped. State per key is
    * one boolean — with a TTL in production (`GroupStateTimeout`), state
    * size is bounded by the distinct-key churn window, not the stream
    * length.
    */
  def streamingDedupe(df: DataFrame, keyCol: String): DataFrame = {
    val schema = df.schema
    implicit val rowEnc = Encoders.row(schema)
    implicit val stringEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    df.groupByKey((r: Row) => String.valueOf(r.getAs[Any](keyCol)))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }

  /** Stream-stream interval join with watermarks: left events match right
    * events with the same key whose event time falls in
    * [left.ts - before, left.ts + after]. Watermarks bound the join state
    * on both sides (late data beyond the watermark is dropped), which is
    * what makes this runnable indefinitely at scale.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      before: String, after: String,
      watermark: String = "1 minute"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $after"))
  }
}
