package graft.transform

import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** Runs the ported reference golden-spec corpus (the yaml files under
  * src/test/resources/refspecs — the reference's flink-cdc-composer
  * specs, ported per RefSpecHarness's representation notes) against the
  * Spark-native transform engine, comparing rendered event streams line
  * by line like TransformSpecsITCase does.
  */
class RefSpecCorpusSpec extends SparkSpec {

  private val files = Seq(
    "arithmetic.yaml", "basic.yaml", "casting.yaml", "comparison.yaml",
    "condition.yaml", "decimal.yaml", "functions_ext.yaml", "logical.yaml",
    "meta.yaml", "nested.yaml", "regression.yaml", "string.yaml",
    "temporal.yaml")

  private def str(m: collection.Map[String, Object], k: String): Option[String] =
    m.get(k).map(_.toString)

  for (file <- files) {
    val in = getClass.getResourceAsStream(s"/refspecs/$file")
    val docs = new org.yaml.snakeyaml.Yaml()
      .load[java.util.List[java.util.Map[String, Object]]](in)
      .asScala.toSeq.map(_.asScala)
    for (c <- docs) {
      val name = c("do").toString
      val ignored = str(c, "ignore")
      test(s"refspec $file :: $name") {
        assume(ignored.isEmpty, s"ignored upstream: ${ignored.getOrElse("")}")
        val spec = RefSpecHarness.Spec(
          projection = str(c, "projection")
            .map(p => p.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(", ")),
          filter = str(c, "filter"),
          primaryKey = str(c, "primary-key"),
          partitionKey = str(c, "partition-key"),
          tableOptions = str(c, "table-options"),
          converters = str(c, "converters"),
          nonNull = str(c, "non-null").exists(_.toBoolean),
          timeZone = str(c, "time-zone").getOrElse("UTC"))
        // actual output lands next to the build for porting triage
        def dump(content: String): Unit = {
          val dir = new java.io.File("target/refspec-actual")
          dir.mkdirs()
          val safe = s"${file.stripSuffix(".yaml")}__${name.replaceAll("[^A-Za-z0-9]+", "_")}"
          java.nio.file.Files.write(new java.io.File(dir, safe + ".txt").toPath,
            content.getBytes("UTF-8"))
        }
        (str(c, "expect"), str(c, "expect-error")) match {
          case (Some(expect), _) =>
            RefSpecHarness.run(spark, spec) match {
              case Right(got) =>
                dump(got.mkString("\n"))
                val want = expect.linesIterator.toSeq
                assert(got.mkString("\n") === want.mkString("\n"), s"case $name")
              case Left(err) =>
                dump("ERROR\n" + err)
                fail(s"case $name failed:\n$err")
            }
          case (None, Some(expectError)) =>
            RefSpecHarness.run(spark, spec) match {
              case Right(got) =>
                dump(got.mkString("\n"))
                fail(
                  s"case $name expected an error containing '$expectError' but produced:\n" +
                    got.mkString("\n"))
              case Left(err) =>
                dump("ERROR\n" + err)
                assert(err.contains(expectError),
                  s"case $name error did not contain '$expectError':\n$err")
            }
          case (None, None) => fail(s"case $name has neither expect nor expect-error")
        }
      }
    }
  }
}
