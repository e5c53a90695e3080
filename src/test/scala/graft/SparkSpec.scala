package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs — one per suite, tuned like production. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.tuned(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
