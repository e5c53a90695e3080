package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan dump for a registered query:
  * `runMain graft.tools.PlanDump <sfDir> <queryName> [filter]` — prints
  * the full physical plan, or only lines containing `filter` (e.g.
  * `Exchange`, `WindowGroupLimit`) for shuffle/limit audits.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    val p = df.queryExecution.executedPlan.toString
    if (args.length > 2)
      p.linesIterator.filter(_.contains(args(2))).foreach(println)
    else println(p)
    spark.stop()
  }
}
