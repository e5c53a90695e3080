package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins at scale. AQE's skew-join handles most
  * cases at runtime; explicit salting is for the pathological ones —
  * a handful of keys holding a large share of the fact side.
  */
object Skew {

  /** Salted equi-join: the (large, skewed) left side gets a random salt
    * in [0, saltFactor); the (smaller) right side is replicated
    * saltFactor times so every (key, salt) bucket finds its match. Splits
    * each hot key across saltFactor reducers at the cost of replicating
    * the right side — use when one key exceeds a single executor's
    * partition budget.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = left.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency profile — pick salting candidates: keys whose row
    * share exceeds `threshold` of the total.
    */
  def hotKeys(df: DataFrame, key: String, threshold: Double = 0.01): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .where(col("n") / total >= threshold)
      .orderBy(col("n").desc)
  }
}
