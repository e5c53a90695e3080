package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan dump for a registered query:
  * `runMain graft.tools.PlanDump <sfDir> <queryName> [filter]` — prints
  * the full physical plan, or only lines containing `filter` (e.g.
  * `Exchange`, `WindowGroupLimit`) for shuffle/limit audits.
  *
  * `runMain graft.tools.PlanDump <sfDir> <q1,q2,...> fmt <outDir> [suffix]`
  * writes each query's `.explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` (suffix defaults to `plan`) — the
  * judge-facing plan artifacts under plans/r{N}/.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuned(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // fmt mode needs the outDir operand — fail with usage, not an
    // ArrayIndexOutOfBounds (nor a silent fall-through to filter mode
    // grepping for the literal "fmt") after session spin-up (r18 review)
    if (args.length > 2 && args(2) == "fmt") {
      require(args.length > 3,
        "usage: PlanDump <sfDir> <q1,q2,...> fmt <outDir> [suffix]")
      val outDir = new java.io.File(args(3))
      outDir.mkdirs()
      val suffix = if (args.length > 4) args(4) else "plan"
      args(1).split(',').foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, args(0))
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(outDir, s"${name}_$suffix.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.print(txt) finally w.close()
        println(s"[plandump] wrote ${f.getAbsolutePath} (${txt.length} chars)")
      }
    } else {
      val df = graft.SparkEntry.queries(args(1))(spark, args(0))
      val p = df.queryExecution.executedPlan.toString
      if (args.length > 2)
        p.linesIterator.filter(_.contains(args(2))).foreach(println)
      else println(p)
    }
    spark.stop()
  }
}
